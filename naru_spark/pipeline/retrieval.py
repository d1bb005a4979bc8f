"""BM25 full-text retrieval over the documents table — the classic
inverted-index ranking function, re-expressed as three aggregate passes on
a (doc, term) frequency table. The training-data-pipeline use case is
query-driven corpus curation (pull the top-k most relevant docs per probe
query for inspection / eval-set mining / targeted decontamination).

Okapi BM25 (Robertson et al.; the +1 idf variant Lucene uses, which keeps
idf >= 0 even when a term appears in more than half the corpus):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(q, d) = sum_{t in q} idf(t) * tf * (k1+1)
                  / (tf + k1 * (1 - b + b * dl / avgdl))

Scale shape (100 TB): ONE term-keyed shuffle builds tf(doc, term); df(term)
is an aggregate OF that aggregate (map-side combined, reduce side bounded
by the vocabulary); doc length is row-local and DENORMALIZED onto every
posting row (the Lucene norms pattern — dl rides with (doc, term, tf)
through the one shuffle for free, since it is functionally dependent on
the doc key); N / sum(dl) are one scalar pass. Query scoring joins
postings against a BROADCAST term list — only rows whose term appears in
some query survive, so the scoring join touches the posting lists of the
query terms and NOTHING corpus-sized (no per-probe join against a
corpus-scale doc-length table). Top-k per query is a bounded per-group
window.

Determinism: tf/df/dl/N are exact integers; avgdl is ONE double division
of exact integers; each per-term contribution is rounded to 6 decimals
and cast to DECIMAL(18,6) BEFORE summing, so the per-doc score is an
ORDER-FREE decimal sum both engines reproduce bit-for-bit (the repo's
standard big-float-sum discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# whitespace tokenization, identical to the oracle's
# regexp_split_to_array(trim(text), '\s+') (entry_pipeline._SQL_TOKS)
_TOKENS = F.split(F.trim(F.col("text")), r"\s+")
# empties dropped (split of a trailing/leading boundary yields "")
_NONEMPTY_TOKENS = F.filter(_TOKENS, lambda t: F.length(t) > 0)


def _doc_term_dl(docs: DataFrame, id_col: str) -> DataFrame:
    """(doc_id, dl, term) exploded rows with the regex tokenize evaluated
    ONCE per document: the filtered token array is materialized as a real
    column BEFORE the explode, so ``dl`` (its size) and the generator both
    read the same attribute. Computing ``F.size(...)`` and ``F.explode(...)``
    from the raw split expression in one projection looks equivalent but
    makes codegen evaluate the split per-expression — measured 8x slower
    on a 10x corpus (16.6s -> 2.0s at sf1)."""
    return docs.withColumn("__toks", _NONEMPTY_TOKENS).select(
        F.col(id_col).alias("doc_id"),
        F.size("__toks").alias("dl"),
        F.explode("__toks").alias("term"),
    )


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k docs per query by BM25. ``queries`` is a small driver-side
    list of (query_id, query_string) — probe queries are human-authored
    and few; the CORPUS side is the scale dimension.

    Returns (query_id, doc_id, score, rank), rank 1..k by
    (score desc, doc_id asc) — the unique-id tiebreak makes the cutoff
    engine-independent."""
    spark = docs.sparkSession

    q_term_list = sorted({t for _, qs in queries for t in qs.split() if t})
    # the term filter pushes BELOW the tf aggregation: df(term) and
    # tf(doc, term) restricted to query terms are identical to their
    # full-corpus values for those terms, so the one shuffle carries only
    # the query terms' postings — the inverted-index probe applied at
    # BUILD time, not just at join time. dl is row-local and functionally
    # dependent on doc_id, so grouping by it denormalizes it onto every
    # posting row for free (Lucene norms pattern — no dl join at scoring)
    terms = _doc_term_dl(docs, id_col).filter(F.col("term").isin(q_term_list))
    tf = terms.groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf"))
    # N and sum(dl): exact integers, one scalar pass; avgdl is ONE double
    # division, reproduced identically by the oracle from the same integers
    row = (
        docs.select(F.size(_NONEMPTY_TOKENS).alias("dl"))
        .agg(F.count("*").alias("n"), F.sum("dl").alias("sdl"))
        .collect()[0]
    )
    n_docs, avgdl = int(row["n"]), float(row["sdl"]) / int(row["n"])

    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    q_df = _query_terms_df(spark, queries)
    # df_t is already term-filtered here, but passing the list keeps the
    # probe-term restriction a no-op filter instead of a broadcast join
    return _score_topk(tf, q_df, df_t, n_docs, avgdl, k, k1, b,
                       probe_terms=q_term_list)


def _score_topk(
    tf: DataFrame,
    q_df: DataFrame,
    df_t: DataFrame,
    n_docs: int,
    avgdl: float,
    k: int,
    k1: float,
    b: float,
    probe_terms: list[str] | None = None,
) -> DataFrame:
    """Shared BM25 scoring tail (in-memory and from-index paths run the
    SAME expression, which is what lets the index entry share the plain
    entry's oracle): join postings — which carry their doc length
    denormalized, so nothing corpus-sized joins here — to the broadcast
    query-term list and per-term df, round each contribution to 6
    decimals, decimal-sum per (query, doc), top-k per query."""
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
    )
    contrib = F.round(idf * F.col("tf") * F.lit(k1 + 1.0) / denom, 6).cast(
        "decimal(18,6)"
    )
    # restrict df(term) to the probe's terms. With the driver-side term
    # list this is a PUSHED-DOWN scan filter (PushedFilters: In(term, ...))
    # instead of a join against the broadcast query terms — one less join
    # in the probe plan and a smaller broadcast build; rows are identical
    # (df_t has unique terms; the join keyed on distinct probe terms was
    # exactly this filter). Callers without the list keep the join form.
    if probe_terms is not None:
        df_probe = df_t.filter(F.col("term").isin(probe_terms))
    else:
        df_probe = df_t.join(F.broadcast(q_df.select("term").distinct()), "term")
    scored = (
        tf.join(F.broadcast(q_df), "term")  # inverted-index probe
        .join(F.broadcast(df_probe), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(contrib).alias("score_d"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_d").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            F.col("score_d").cast("double").alias("score"),
            "rank",
        )
    )


def _read_sidecar_rows(spark, path: str):
    """Read a TINY sidecar parquet dir (the one-row stats table) without
    launching a Spark job when the dir is driver-local: manifest-style
    metadata belongs to the driver (the Delta/Iceberg discipline — a
    distributed job to fetch one row is pure scheduling overhead, and the
    maintain/serve loops pay it per batch). Falls back to a Spark read for
    non-local paths (object stores) — same rows either way."""
    import os

    if os.path.isdir(path):
        try:
            import pyarrow.parquet as pq

            # ParquetDataset's default ignore_prefixes skips _SUCCESS/.crc
            return pq.read_table(path).to_pylist()
        except Exception:  # noqa: BLE001 — any local-read surprise: use Spark
            pass
    return [r.asDict() for r in spark.read.parquet(path).collect()]


def _query_terms_df(spark, queries: list[tuple[int, str]]) -> DataFrame:
    return spark.createDataFrame(
        [
            (int(qid), t)
            for qid, qs in queries
            for t in dict.fromkeys(qs.split())
            if t
        ],
        "query_id int, term string",
    )


def bm25_write_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_buckets: int = 32,
) -> dict:
    """Persist the BM25 inverted index — build once, serve many (the same
    serving discipline as the IVF/IVF-PQ indexes): posting rows
    (doc_id, term, tf, dl) written hive-partitioned by ``crc32(term) %
    n_buckets``, so a query's probe reads ONLY its terms' partitions
    (PartitionFilters — plan-asserted in tests). Doc length is
    DENORMALIZED onto every posting row at build time (the Lucene norms
    pattern), so the probe never joins a corpus-sized doc-length table;
    per-term df (vocabulary-bounded) and the one-row corpus stats land
    beside the postings. df here is the FULL-corpus document frequency
    computed at build time — the index answers any future query without
    touching the corpus.

    The corpus-wide tokenize+explode+shuffle runs ONCE: df is derived
    from the just-written postings parquet (a read over compact
    (doc_id, term, tf) rows, output bounded by the vocabulary), not by
    re-running the explode over the raw corpus — at 100 TB that halves
    the build's heavy passes. The stats sidecar is a map-only aggregate
    over the corpus (no shuffle), kept on ``docs`` because zero-token
    documents count toward N but never reach a posting row."""
    import os

    spark = docs.sparkSession
    # an in-place REBUILD overwrites postings/df/stats below; the OLD meta
    # must not survive a crash mid-rebuild (a stale, possibly
    # wrong-modulus meta would then be trusted unconditionally — worse
    # than the no-meta legacy case, which at least raises)
    meta_p = os.path.join(path, "_meta.json")
    if os.path.exists(meta_p):
        os.remove(meta_p)
    tf = (
        _doc_term_dl(docs, id_col)
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    (
        tf.withColumn("bucket", F.crc32(F.col("term")) % n_buckets)
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(path, "postings"))
    )
    # schema stamps for _meta.json: exactly what footer inference would
    # return — the postings files carry tf's columns, plus the ``bucket``
    # partition column which directory-name inference types as int
    from pyspark.sql.types import IntegerType, StructField, StructType

    from naru_spark.sources.sinks import _normalized_schema_json

    postings_schema = _normalized_schema_json(
        StructType(list(tf.schema.fields)
                   + [StructField("bucket", IntegerType())])
    )
    df_frame = (
        spark.read.schema(StructType.fromJson(postings_schema))
        .parquet(os.path.join(path, "postings"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    df_frame.write.mode("overwrite").parquet(os.path.join(path, "df"))
    df_schema = _normalized_schema_json(df_frame.schema)
    (
        docs.select(F.size(_NONEMPTY_TOKENS).alias("dl"))
        .agg(F.count("*").alias("n"), F.sum("dl").alias("sdl"))
        .write.mode("overwrite")
        .parquet(os.path.join(path, "stats"))
    )
    # persist the bucketing modulus beside the data (the IVF-PQ index
    # persists its encoding decimals for exactly the same reason): an
    # append/upsert run with a DIFFERENT n_buckets would land postings
    # under the wrong crc32 modulus and pruned probes would silently
    # miss them. Written LAST (and removed FIRST, above) so a crashed
    # build or rebuild has no meta rather than a stale or torn one.
    _write_bm25_meta(path, n_buckets, schemas={
        "postings_schema": postings_schema, "df_schema": df_schema,
    })
    return {"path": path, "n_buckets": n_buckets}


def _write_bm25_meta(path: str, n_buckets: int, schemas: dict | None = None) -> None:
    """Atomic ``_meta.json`` publish — tmp file + ``os.replace``, the same
    swap discipline as the index trees: a crash mid-write must leave
    either no meta or a complete one, never truncated JSON that every
    later ``_bm25_n_buckets`` call would choke on.

    ``schemas`` (build path only): ``postings_schema`` / ``df_schema``
    stamps — the Spark schemas of the index trees, recorded once at
    build time so every later read (probe, delete, append, merge) passes
    an explicit schema instead of paying a footer-inference Spark job.
    Maintenance rewrites preserve the tree schemas by construction, so
    the stamps stay valid for the index's lifetime; a legacy meta
    without them simply keeps the inference path."""
    import json
    import os
    import uuid

    meta = {"n_buckets": int(n_buckets)}
    if schemas:
        meta.update(schemas)
    tmp = os.path.join(path, f"._meta.{uuid.uuid4().hex[:8]}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, "_meta.json"))


def _bm25_read(spark, path: str, which: str):
    """Read an index tree (``postings`` / ``df``) with the schema stamped
    in ``_meta.json`` when present (no footer-inference job); falls back
    to plain inference for legacy indexes."""
    import json
    import os

    schema = None
    meta_p = os.path.join(path, "_meta.json")
    if os.path.exists(meta_p):
        try:
            with open(meta_p) as fh:
                js = json.load(fh).get(f"{which}_schema")
        except (json.JSONDecodeError, OSError):
            js = None
        if js:
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(js)
    reader = spark.read.schema(schema) if schema is not None else spark.read
    return reader.parquet(os.path.join(path, which))


def _bm25_n_buckets(path: str, n_buckets: int | None) -> int:
    """Resolve the index's bucketing modulus: the ``_meta.json`` stamped
    at build time is authoritative; a caller-passed value that disagrees
    is the silent-drift bug this sidecar exists to catch, so it raises.

    Legacy indexes (built before the sidecar) must pass the original
    build value explicitly ONCE — the on-disk ``bucket=`` dirs only
    bound the modulus from below (a sparse layout need not populate the
    top bucket), and guessing low would land future postings (and prune
    probes) under the wrong crc32 modulus, the exact silent-miss bug
    class this function exists to catch. The passed value is
    sanity-checked against the layout and then FROZEN into _meta.json,
    so every later call self-serves without a value. The freeze is
    BEST-EFFORT: resolution may run on a read-only index mount or
    replica (probe paths route through here), where the meta write
    fails — the resolved value is still returned and the freeze simply
    happens on the first writable call instead."""
    import json
    import os

    meta_p = os.path.join(path, "_meta.json")
    if os.path.exists(meta_p):
        try:
            with open(meta_p) as fh:
                stored = int(json.load(fh)["n_buckets"])
        except (json.JSONDecodeError, KeyError, TypeError, ValueError) as e:
            raise ValueError(
                f"corrupt _meta.json at {path} ({e!r}) — likely a writer "
                "that crashed before the round-10 atomic publish; rebuild "
                "the index (bm25_write_index) to restore it"
            ) from e
        if n_buckets is not None and int(n_buckets) != stored:
            raise ValueError(
                f"index at {path} was built with n_buckets={stored}; "
                f"got n_buckets={n_buckets} — appending under a different "
                "crc32 modulus would make pruned probes miss the new rows"
            )
        return stored
    if n_buckets is None:
        raise ValueError(
            f"index at {path} has no _meta.json (built before the modulus "
            "sidecar) and no n_buckets was passed — pass the original "
            "build value once; it will be stamped into _meta.json"
        )
    resolved = int(n_buckets)
    post_dir = os.path.join(path, "postings")
    if os.path.isdir(post_dir):
        seen = [
            int(d.split("=", 1)[1])
            for d in os.listdir(post_dir)
            if d.startswith("bucket=")
        ]
        if seen and max(seen) >= resolved:
            raise ValueError(
                f"index at {path} has bucket={max(seen)} partitions but "
                f"n_buckets={resolved} — the modulus does not match the layout"
            )
        try:
            _write_bm25_meta(path, resolved)  # freeze the legacy choice
        except OSError:
            pass  # read-only mount/replica: probes must keep working
    return resolved


def bm25_append_index(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_buckets: int | None = None,
    validate: bool = False,
    _deleted: dict | None = None,
) -> None:
    """Incremental index maintenance (Lucene segment-add analog): tokenize
    ONLY the new documents, append their posting rows into the existing
    crc32 bucket partitions, fold their per-term document frequencies into
    the df sidecar (one vocabulary-bounded merge — never a corpus rescan)
    and add their counts to the one-row stats. O(|new batch|) however
    large the index. Because every statistic is an exact integer count
    over disjoint doc sets, append-then-probe returns EXACTLY what a full
    rebuild over the union would — the append entry shares the rebuild's
    oracle. New doc_ids must not already be indexed (an upsert needs a
    delete pass first, as in Lucene); ``validate=True`` enforces it with
    one broadcast semi-join of the batch ids against the postings —
    an index-sized scan, so off by default exactly like Lucene/FAISS,
    which also trust the caller here.

    The df/stats sidecars are replaced via ``_swap_in`` (reading and
    overwriting the same parquet dir in one job is illegal); on an
    object store the swap is a prefix rename. The batch is tokenized
    ONCE: the (doc, term, tf) rows are persisted across the postings
    write and the df-delta aggregate (the build path's single-heavy-pass
    discipline, applied to the delta). An EMPTY batch is a legal no-op —
    Structured Streaming delivers them routinely.

    ``_deleted`` (internal, the upsert path): the deferred deltas of the
    delete half — its negated df delta joins this append's df delta in
    ONE sidecar merge, and its n/sdl decrements fold into the SAME stats
    swap, so an upsert pays one df swap and one stats swap instead of
    two of each. Exact integer folds; identical sidecar content."""
    import os

    spark = new_docs.sparkSession
    n_buckets = _bm25_n_buckets(path, n_buckets)
    del_n = int(_deleted["n_del"]) if _deleted else 0
    del_sdl = int(_deleted["sdl_del"]) if _deleted else 0
    # the empty-batch stats row sums to NULL — coalesce, and skip the
    # sidecar swaps entirely for a no-op batch
    add = (
        new_docs.select(F.size(_NONEMPTY_TOKENS).alias("dl"))
        .agg(F.count("*").alias("n"), F.sum("dl").alias("sdl"))
        .collect()[0]
    )
    if int(add["n"]) == 0:
        # an empty batch cannot have replaced anything (victims are the
        # batch's own ids)
        assert del_n == 0, del_n
        return
    if validate:
        clash = (
            _bm25_read(spark, path, "postings")
            .join(
                F.broadcast(new_docs.select(F.col(id_col).alias("doc_id")).distinct()),
                "doc_id",
            )
            .select("doc_id").limit(1).collect()
        )
        if clash:
            raise ValueError(
                f"doc_id {clash[0]['doc_id']} is already indexed — append "
                "requires new ids; delete first for an upsert"
            )
    tf = (
        _doc_term_dl(new_docs, id_col)
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
        .persist()  # one tokenize feeds BOTH the postings write and the df delta
    )
    try:
        (
            tf.withColumn("bucket", F.crc32(F.col("term")) % n_buckets)
            # one batch-sized shuffle keyed like the layout: the persisted
            # tf keeps its 32 post-aggregation partitions, and writing that
            # through partitionBy fans out to #partitions x #buckets files
            # (measured 662 files from one sf0.1 batch); repartitioned, an
            # append lands ~one file per touched bucket — the Lucene
            # segment-per-batch shape the maintain loop expects
            .repartition("bucket")
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(os.path.join(path, "postings"))
        )

        df_dir = os.path.join(path, "df")
        delta_df = tf.groupBy("term").agg(F.count("*").alias("df"))
        merged = _bm25_read(spark, path, "df").unionByName(delta_df)
        if del_n:
            # fold the delete's decrement into the same merge: posting
            # rows partition exactly into victim + survivor rows, so
            # old - victim + batch equals the sequential subtract-then-
            # add for every term (a term netting 0 rows drops, exactly
            # as the sequential delete would have dropped it)
            merged = merged.unionByName(
                _deleted["df_delta"].select(
                    "term", (-F.col("ddf")).cast("long").alias("df")
                )
            )
        merged = merged.groupBy("term").agg(
            F.sum("df").cast("long").alias("df")
        )
        if del_n:
            merged = merged.filter(F.col("df") > 0)
        _swap_in(merged, df_dir)
    finally:
        tf.unpersist()  # a failed write must not pin the cache for the session

    stats_dir = os.path.join(path, "stats")
    old_row = _read_sidecar_rows(spark, stats_dir)[0]  # one-row sidecar
    _swap_in(
        spark.createDataFrame(
            [(int(old_row["n"] or 0) - del_n + int(add["n"]),
              int(old_row["sdl"] or 0) - del_sdl + int(add["sdl"] or 0))],
            "n long, sdl long",
        ),
        stats_dir,
    )


def bm25_delete_from_index(
    spark,
    path: str,
    doc_ids: list[int] | None = None,
    victims: DataFrame | None = None,
    id_col: str = "doc_id",
    _defer_sidecars: bool = False,
) -> int | dict:
    """Delete documents from the persisted index (Lucene's
    delete-then-expunge, done eagerly). Victims are given EITHER as an
    id list (``doc_ids``, the FAISS/Lucene-shaped API, broadcast-joined)
    OR as a DataFrame (``victims`` — any frame whose ``id_col`` column
    holds the victim ids, e.g. the result of a predicate over the
    corpus). The DataFrame form never routes ids through the driver, so
    a delete-by-predicate that matches 1% of a 100 TB corpus stays fully
    distributed (join strategy left to AQE — a corpus-fraction side must
    not be forced broadcast).

    One index-sized pass over COMPACT posting rows (no re-tokenization,
    never a corpus read) rewrites the survivors; the victims' OWN
    posting rows — a victim-sized frame isolated and cached before the
    rewrite — supply both the stats decrement (exact n / sum dl) and the
    per-term df decrement, which is folded into the df sidecar as a
    vocabulary-bounded merge. Because posting rows partition exactly
    into victim rows and survivor rows, ``df_old - victim_rows(term) ==
    survivor_rows(term)`` unconditionally, so the sidecar equals what a
    fresh rebuild over the remaining documents computes — probes return
    exactly the rebuild's ranking, which is what lets the delete entry
    share the filtered oracle (asserted identical to a rebuild in
    tests). Zero-token documents leave no posting rows and therefore
    cannot be located for deletion (their N contribution stays;
    documented limit of an id-index-free layout).

    Batch deletes, then call once: the pass costs the same however many
    ids it removes. Deleting EVERY remaining document is refused before
    any mutation (an empty partitioned write leaves a schema-less dir
    that breaks all subsequent reads — drop the index dir instead).
    Returns the number of documents actually deleted.

    The bucket layout is carried unchanged from the existing rows, so no
    bucket-count parameter exists to get wrong.

    ``_defer_sidecars`` (internal, the upsert path): skip the df/stats
    sidecar swaps and return ``{"n_del", "sdl_del", "df_delta"}`` so the
    caller folds them together with its append's deltas — one sidecar
    merge per upsert instead of two, exact integers either way."""
    import os

    post_dir = os.path.join(path, "postings")
    if (doc_ids is None) == (victims is None):
        raise ValueError("pass exactly one of doc_ids= or victims=")
    if victims is not None:
        # pin ONE evaluation of the caller's plan: the victim set feeds the
        # stats/df decrements AND the survivor anti-join as separate jobs,
        # and a non-deterministic victims frame (sample/limit/mutating
        # source) evaluated twice would desynchronize sidecars from
        # postings. Eager localCheckpoint severs the lineage, so a lost
        # block fails the job loudly instead of silently recomputing a
        # different draw.
        # lazy checkpoint: the FIRST action over the victim rows (the
        # stats_del collect below) is what materializes the pin, so the
        # pin and the first measurement share one Spark job — same
        # single-evaluation guarantee, one fewer action per delete
        ids_df = victims.select(
            F.col(id_col).cast("long").alias("doc_id")
        ).distinct().localCheckpoint(eager=False)
        join_side = ids_df  # corpus-fraction side: AQE picks the strategy
    else:
        ids_df = spark.createDataFrame(
            [(int(i),) for i in set(doc_ids)], "doc_id long"
        )
        join_side = F.broadcast(ids_df)
    postings = _bm25_read(spark, path, "postings")
    # the victims' own posting rows: victim-sized, cached because they feed
    # BOTH the stats decrement and the df delta, and must be materialized
    # BEFORE the survivor swap deletes their source files
    victim_rows = postings.join(join_side, "doc_id").select(
        "doc_id", "dl", "term"
    ).persist()
    try:
        stats_del = (
            victim_rows.groupBy("doc_id", "dl").agg(F.count("*").alias("_r"))
            # countDistinct on doc_id, not pair count: a precondition-
            # violating double-append with changed text leaves two
            # (doc_id, dl) pairs for one document, and the contract
            # counts DOCUMENTS. _r carries the victim POSTING-ROW count
            # in the same aggregate — with the footer-derived total below
            # it decides the empty-index refusal without the extra
            # remaining.limit(1).count() scan this path used to pay.
            .agg(F.countDistinct("doc_id").alias("n"),
                 F.sum("dl").alias("sdl"),
                 F.sum("_r").alias("vrows"))
            .collect()[0]
        )
        n_del = int(stats_del["n"] or 0)
        if n_del == 0:
            return {"n_del": 0, "sdl_del": 0, "df_delta": None} \
                if _defer_sidecars else 0
        # per-term victim ROW counts (count(*), not countDistinct: the df
        # sidecar is defined as posting-row counts, and rows partition into
        # victim + survivor, so subtraction is exact even for pathological
        # duplicate rows)
        df_delta = victim_rows.groupBy("term").agg(
            F.count("*").alias("ddf")
        )
        df_dir = os.path.join(path, "df")
        remaining = postings.join(
            join_side, "doc_id", "left_anti"
        ).select("doc_id", "dl", "term", "tf", "bucket")  # original schema order
        # posting rows partition exactly into victim + survivor rows, and
        # the tree's total row count is parquet-footer METADATA (driver
        # walk, zero data read, zero jobs) — so the empty-index refusal
        # needs no extra scan of the survivors. Object-store paths the
        # driver cannot walk fall back to the short-circuit probe.
        total_rows = _parquet_rows_under(post_dir)
        survivors_empty = (
            total_rows - int(stats_del["vrows"] or 0) == 0
            if total_rows is not None
            else remaining.limit(1).count() == 0
        )
        if survivors_empty:
            raise ValueError(
                "delete would remove every indexed document — an empty "
                "partitioned index is unreadable; drop the index dir instead"
            )
        if _defer_sidecars:
            # the caller (upsert) folds this delta together with its
            # append's delta into ONE df merge and ONE stats swap — pin
            # the delta NOW (eager, vocabulary-bounded) so it can never
            # recompute against the post-swap survivor tree
            df_delta = df_delta.localCheckpoint(eager=True)
        else:
            # df first: its merge reads only the old sidecar + the victim
            # rows — never the rewritten postings (that second index-sized
            # pass is the whole cost this path avoids) — and doing it
            # before the postings swap means an evicted victim_rows
            # partition recomputes against the UNTOUCHED postings, never
            # the survivor tree.
            # CRASH WINDOW: a crash between the two swaps leaves df
            # decremented while victim postings survive (probes
            # under-score until repaired), and RE-RUNNING the delete does
            # NOT repair it — the df would be decremented twice. Recovery
            # after a torn delete is a rebuild (or bm25_upsert_index full
            # refresh), the Lucene fsck answer. The three sidecar swaps
            # are not atomic as a group by design: making them so would
            # need a manifest commit layer (the snapshot plane has one)
            # that the plain-directory index format deliberately avoids.
            new_df = (
                _bm25_read(spark, path, "df")
                .join(df_delta, "term", "left")
                .select(
                    "term",
                    (F.col("df") - F.coalesce(F.col("ddf"), F.lit(0)))
                    .cast("long").alias("df"),
                )
                .filter(F.col("df") > 0)  # a term wholly deleted has no row
            )
            _swap_in(new_df, df_dir)
        # one shuffle keyed exactly like the layout (the merge path's own
        # discipline): without it the survivor rewrite fans out to
        # #scan-partitions x #buckets files — measured 682 files from a
        # 20-file index at sf0.1 — and every later read/maintain pays the
        # open/footer overhead. Content-identical: same rows, same
        # partition values, fewer files.
        _swap_in(
            remaining.repartition("bucket"), post_dir,
            writer=lambda df, tmp: df.write.partitionBy("bucket").parquet(tmp),
        )
    finally:
        victim_rows.unpersist()
        if victims is not None:
            # best-effort: a foreachBatch loop calling delete/upsert per
            # micro-batch must not accumulate checkpointed id blocks
            ids_df.unpersist()
    if _defer_sidecars:
        return {"n_del": n_del, "sdl_del": int(stats_del["sdl"] or 0),
                "df_delta": df_delta}
    stats_dir = os.path.join(path, "stats")
    old = _read_sidecar_rows(spark, stats_dir)[0]  # one-row sidecar
    _swap_in(
        spark.createDataFrame(
            [(int(old["n"]) - n_del, int(old["sdl"]) - int(stats_del["sdl"]))],
            "n long, sdl long",
        ),
        stats_dir,
    )
    return n_del


def bm25_upsert_index(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_buckets: int | None = None,
) -> int:
    """Upsert = delete-then-append, Lucene's ``updateDocument`` made one
    call: batch ids already indexed are expunged first (one pass over
    compact posting rows; the victim ids never touch the driver — the
    batch itself is the anti-join side), then the whole batch is
    tokenized once and appended O(|batch|). Every statistic is an exact
    integer fold over disjoint doc sets, so the index equals a fresh
    build over (corpus - replaced + batch) and probes return exactly the
    rebuild's ranking — the append and delete shared-oracle arguments,
    composed. Returns how many existing documents were replaced.

    Zero-token documents leave no posting rows, so a replacement of one
    cannot find it to delete and its stats contribution double-counts —
    the id-index-free layout's documented limit, inherited from delete.

    A batch covering EVERY indexed id (the full-refresh maintenance op)
    is legal here even though the bare delete refuses it: the transient
    empty tree never needs to exist, because the upsert rebuilds the
    index from the batch directly."""
    import os

    spark = new_docs.sparkSession
    n_buckets = _bm25_n_buckets(path, n_buckets)
    try:
        dinfo = bm25_delete_from_index(
            spark, path, victims=new_docs.select(id_col), id_col=id_col,
            _defer_sidecars=True,
        )
    except ValueError as e:
        if "every indexed document" not in str(e):
            raise
        import shutil
        import uuid

        n_replaced = int(
            _bm25_read(spark, path, "postings")
            .agg(F.countDistinct("doc_id").alias("n")).collect()[0]["n"]
        )
        # crash-safe full refresh: build into a side tree and swap the
        # WHOLE index dir — rebuilding in place would overwrite postings
        # first and leave a probe (or a crash) a torn postings/df/stats mix
        tmp = path + f".new-{uuid.uuid4().hex[:8]}"
        bm25_write_index(new_docs, tmp, id_col=id_col, n_buckets=n_buckets)
        old = path + f".old-{uuid.uuid4().hex[:8]}"
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
        return n_replaced
    # the delete deferred its df/stats swaps; the append folds them in —
    # one sidecar merge per upsert instead of two (exact integer folds)
    bm25_append_index(new_docs, path, id_col=id_col, n_buckets=n_buckets,
                      _deleted=dinfo)
    return int(dinfo["n_del"])


def _parquet_rows_under(path: str) -> int | None:
    """Total rows under a parquet tree from file FOOTERS only — a driver
    metadata walk (num_rows per footer, no data pages), the same
    discipline as the one-row sidecar reads. Exact integers; used where a
    distributed count would be pure scheduling overhead. Returns None for
    a path the driver cannot walk (object stores) — callers fall back to
    a Spark-side probe."""
    import os

    if not os.path.isdir(path):
        return None
    try:
        import pyarrow.parquet as pq

        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    total += pq.ParquetFile(
                        os.path.join(root, f)
                    ).metadata.num_rows
        return total
    except Exception:  # noqa: BLE001 — any local-read surprise: use Spark
        return None


def bm25_postings_file_count(path: str) -> int:
    """Segment-fragmentation signal (Lucene's segment count): parquet
    files under the postings tree. Every append lands new files into the
    bucket partitions, so the count grows with ingest batches, not data
    volume — a metadata-only walk, no data read."""
    import os

    post_dir = os.path.join(path, "postings")
    return sum(
        1 for _root, _dirs, files in os.walk(post_dir)
        for f in files if f.endswith(".parquet")
    )


def bm25_maintain_index(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_buckets: int | None = None,
    merge_factor: int = 4,
) -> dict:
    """The BM25 index-maintenance decision loop (Lucene's
    updateDocument + TieredMergePolicy, composed): UPSERT the batch
    (delete-then-append), then measure segment fragmentation — every
    append stacks new parquet files into the bucket partitions, and
    probe cost grows with file count (open/footer overhead), not data
    size. When the postings tree holds more than ``merge_factor`` files
    per bucket, MERGE: rewrite the postings coalesced to one file per
    bucket via the same crash-safe ``_swap_in`` tree swap. The merge is
    content-identical by construction (df/stats untouched — it moves
    rows, never changes them), so probes before and after are equal and
    the maintain entry shares the upsert's rebuild oracle.

    Returns ``{"action": "merge"|"upsert", "n_replaced": r,
    "files_before": b, "files_after": a}``."""
    import os

    n_buckets = _bm25_n_buckets(path, n_buckets)
    n_replaced = bm25_upsert_index(new_docs, path, id_col=id_col, n_buckets=n_buckets)
    spark = new_docs.sparkSession
    before = bm25_postings_file_count(path)
    action = "upsert"
    if before > merge_factor * n_buckets:
        post_dir = os.path.join(path, "postings")
        merged = (
            _bm25_read(spark, path, "postings")
            .repartition("bucket")  # one shuffle keyed exactly like the layout
            .select("doc_id", "dl", "term", "tf", "bucket")
        )
        _swap_in(
            merged, post_dir,
            writer=lambda df, tmp: df.write.partitionBy("bucket").parquet(tmp),
        )
        action = "merge"
    return {
        "action": action,
        "n_replaced": n_replaced,
        "files_before": before,
        "files_after": bm25_postings_file_count(path),
    }


def _swap_in(df: DataFrame, final_dir: str, writer=None) -> None:
    """Replace a parquet dir with a freshly-written one (read-and-
    overwrite of the same dir in one job is illegal); on an object store
    the renames are prefix copies or a metadata pointer flip."""
    import os
    import shutil
    import uuid

    tmp = final_dir + f".new-{uuid.uuid4().hex[:8]}"
    (writer or (lambda d, t: d.write.parquet(t)))(df, tmp)
    old = final_dir + f".old-{uuid.uuid4().hex[:8]}"
    os.rename(final_dir, old)
    os.rename(tmp, final_dir)
    shutil.rmtree(old)


def bm25_topk_from_index(
    spark,
    path: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    n_buckets: int | None = None,
    doc_filter: DataFrame | None = None,
) -> DataFrame:
    """Serve BM25 top-k from a persisted index: the probe computes its
    terms' crc32 buckets DRIVER-side (zlib.crc32 == F.crc32 on UTF-8
    bytes) and the postings scan prunes to those partitions — at 100 TB
    the query touches #query-term buckets of postings, never the corpus
    (doc length rides on the posting rows, so no corpus-sized side ever
    enters the probe plan). Identical results to ``bm25_topk`` given the
    same corpus, so the entry shares its oracle.

    ``doc_filter`` (a DataFrame with a ``doc_id`` column): FILTERED
    retrieval, the Lucene filter-query case — candidates are semi-joined
    against the allowed set BEFORE the per-query top-k, while idf/avgdl
    stay CORPUS-level (the filter restricts who can be returned, not the
    statistics — Lucene semantics). Per-doc BM25 scores are independent,
    so pre-filtering candidates returns exactly the best k allowed
    documents."""
    import os
    import zlib

    n_buckets = _bm25_n_buckets(path, n_buckets)
    # one-row sidecar: driver-local read, no Spark job (the serve loop
    # pays this per probe)
    row = _read_sidecar_rows(spark, os.path.join(path, "stats"))[0]
    n_docs, avgdl = int(row["n"]), float(row["sdl"]) / int(row["n"])

    q_df = _query_terms_df(spark, queries)
    probe_terms = sorted({t for _, qs in queries for t in qs.split() if t})
    buckets = sorted({zlib.crc32(t.encode("utf-8")) % n_buckets for t in probe_terms})
    postings = (
        _bm25_read(spark, path, "postings")
        .filter(F.col("bucket").isin(buckets))  # partition-pruned read
        .filter(F.col("term").isin(probe_terms))
        .select("doc_id", "term", "tf", "dl")
    )
    if doc_filter is not None:
        # pre-filter candidates (stats untouched); the semi-join runs on
        # the already-pruned posting rows, never the corpus
        postings = postings.join(
            doc_filter.select("doc_id").distinct(), "doc_id", "semi"
        )
    df_t = _bm25_read(spark, path, "df")
    return _score_topk(postings, q_df, df_t, n_docs, avgdl, k, k1, b,
                       probe_terms=probe_terms)
