"""Corpus-curation operators for LLM training-data pipelines: benchmark
decontamination, sequence packing, and an end-to-end curation chain.

Beyond-reference extensions (the reference, naru-project/naru, has no text
pipeline — see SURVEY.md §2 north-star set). All three are pure DataFrame
compositions — no UDFs, fully inside whole-stage codegen.

Scale notes:
- Decontamination joins the (small) eval-set shingles against the (huge)
  training-side shingles; the eval side is explicitly broadcast so the train
  side never shuffles — the standard shape when the benchmark suite is MBs
  and the corpus is TBs.
- Sequence packing needs a running token total, i.e. an ordered window. A
  single global window would serialize on one partition at 100 TB, so packing
  is done PER SOURCE SHARD (window partitioned by `source`) — exactly how
  production packers shard the problem; each shard's packs are independent.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from naru_spark.pipeline.dedup import shingle_df
from naru_spark.pipeline.text import tokens_col


def decontaminate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_mod: int = 50,
    n: int = 3,
) -> DataFrame:
    """Flag training documents that share any token n-gram with the eval
    set (docs where ``id % eval_mod == 0`` — a deterministic stand-in for a
    held-out benchmark suite).

    Returns one row per CONTAMINATED training doc:
    (doc_id, n_shared_shingles, n_eval_docs) — distinct overlapping
    shingles and distinct eval docs hit. Train docs with no overlap are
    absent (the clean set is the anti-join, trivially derivable).
    """
    sh = shingle_df(df, id_col, text_col, n)  # (id, shingle), distinct
    eval_sh = (
        sh.filter(F.col("id") % eval_mod == 0)
        .select(F.col("id").alias("eval_id"), "shingle")
    )
    train_sh = sh.filter(F.col("id") % eval_mod != 0)
    return (
        train_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy("id")
        .agg(
            F.countDistinct("shingle").alias("n_shared_shingles"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
        .select(F.col("id").alias(id_col), "n_shared_shingles", "n_eval_docs")
    )


def decontaminate_fuzzy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_mod: int = 50,
    n: int = 3,
    threshold: float = 0.2,
    decimals: int = 6,
) -> DataFrame:
    """FUZZY benchmark decontamination (the n-gram-Jaccard policy real
    dataset pipelines pair with the exact-overlap gate): for every
    train/eval doc pair sharing at least one token n-gram, the EXACT
    Jaccard similarity of their distinct-shingle sets, with the
    contamination verdict at ``threshold``. Exact decontamination flags
    any single shared shingle; the fuzzy gate asks how MUCH of the
    training doc is the eval doc — robust to near-verbatim leaks with
    small edits.

    Plan shape: candidate pairs come from the shared-shingle equi-join
    with the eval side broadcast (small by definition — a benchmark
    suite); |A∩B| is one grouped count over the join, |A| and |B| are
    per-doc distinct-shingle counts joined back in. The train corpus
    never shuffles on anything wider than its own shingle rows. At
    lakehouse scale with a LARGE eval side, generate candidates with the
    banded MinHash-LSH (dedup.minhash_lsh_pairs) and keep this as the
    exact verify — same composition the near-dup plane uses.

    Returns (doc_id, eval_id, jaccard, contaminated) for every sharing
    pair; jaccard rounded to ``decimals`` BEFORE the threshold compare,
    so the verdict is engine-deterministic."""
    sh = shingle_df(df, id_col, text_col, n)  # DISTINCT (id, shingle)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    eval_sh = (
        sh.filter(F.col("id") % eval_mod == 0)
        .select(F.col("id").alias("eval_id"), "shingle")
    )
    inter = (
        sh.filter(F.col("id") % eval_mod != 0)
        .join(F.broadcast(eval_sh), "shingle")
        .groupBy("id", "eval_id")
        .agg(F.count("*").alias("i"))
    )
    jac = F.round(
        F.col("i").cast("double")
        / (F.col("sz_t") + F.col("sz_e") - F.col("i")),
        decimals,
    )
    return (
        inter.join(sizes.select(F.col("id"), F.col("sz").alias("sz_t")), "id")
        .join(
            sizes.select(F.col("id").alias("eval_id"), F.col("sz").alias("sz_e")),
            "eval_id",
        )
        .select(
            F.col("id").alias(id_col),
            "eval_id",
            jac.alias("jaccard"),
            (jac >= F.lit(threshold)).alias("contaminated"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
    seq_len: int = 512,
) -> DataFrame:
    """GPT-style sequence packing: concatenate documents in ``id_col`` order
    within each shard, split the token stream into fixed ``seq_len`` chunks,
    and assign each document to the pack where it STARTS
    (``pack_id = floor(tokens_before_doc / seq_len)``; docs may spill over
    pack boundaries, as in real concat-and-chunk packing).

    Returns per (shard, pack): docs starting there, their token sum, and the
    doc-id span — the manifest a training loader reads.
    """
    toks = df.select(
        F.col(shard_col).alias("shard"),
        F.col(id_col).alias("id"),
        F.size(tokens_col(text_col)).alias("n_toks"),
    )
    return pack_token_counts(toks, seq_len, shard_col)


def pack_token_counts(
    toks: DataFrame, seq_len: int, shard_col: str = "source"
) -> DataFrame:
    """Concat-and-chunk pack manifest from a precomputed per-doc token
    count table ``(shard, id, n_toks)`` — the shared core of
    ``pack_sequences`` (whitespace counts) and the BPE tokenize->pack
    chain (``pipeline.bpe.bpe_pack_manifest``), which differ only in how
    n_toks is produced."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("shard")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "pack_id", F.floor((F.sum("n_toks").over(w) - F.col("n_toks")) / seq_len)
    )
    return (
        packed.groupBy("shard", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.min("id").alias("first_doc"),
            F.max("id").alias("last_doc"),
        )
        .select(
            F.col("shard").alias(shard_col),
            "pack_id",
            "n_docs",
            "n_tokens",
            "first_doc",
            "last_doc",
        )
    )


def source_cap(
    df: DataFrame,
    id_col: str = "doc_id",
    shard_col: str = "source",
    cap: int = 100,
) -> DataFrame:
    """Cap each source's contribution at ``cap`` documents (deterministic:
    keep the lowest ``id_col`` per source) — the mixture-control knob that
    stops one crawl dump from dominating the corpus. One shuffle on the
    shard key; the window never materializes more than ``cap`` winners per
    group after the rank filter."""
    from pyspark.sql import Window

    # collision-safe helper name: a user column literally named "rn" must
    # survive the round-trip
    w = Window.partitionBy(shard_col).orderBy(id_col)
    return (
        df.withColumn("__source_cap_rn", F.row_number().over(w))
        .filter(F.col("__source_cap_rn") <= cap)
        .drop("__source_cap_rn")
    )


def temperature_targets(
    counts: dict[str, int], alpha: float, total_docs: int
) -> list[tuple[str, int]]:
    """Largest-remainder per-source slot allocation for the temperature
    mixture, as a PURE deterministic function: the denominator is summed
    in sorted-source order, so the same counts always produce bit-identical
    targets. plain floor() can fall well short of total_docs and zero out
    the smallest sources — the opposite of what alpha < 1 is for. Floor
    everyone, then hand the leftover slots to the largest fractional
    remainders (ties broken by source name).

    Kept driver-side and float-exact on purpose: computing x = total *
    c^alpha / denom inside a SQL engine puts the allocation one ulp away
    from flipping floor() whenever the share is integral — DuckDB's
    parallel SUM order made exactly that happen (a 300-doc mix of 20
    equal sources sat at x == 15.0 and nondeterministically produced 320)
    — so targets are computed ONCE here and treated as exact integers by
    every consumer, including the oracle SQL."""
    denom = sum(c**alpha for _, c in sorted(counts.items()))
    raw = {s: total_docs * (c**alpha) / denom for s, c in counts.items()}
    floors = {s: int(np.floor(x)) for s, x in raw.items()}
    leftover = total_docs - sum(floors.values())
    by_frac = sorted(raw, key=lambda s: (-(raw[s] - floors[s]), s))
    return [(s, floors[s] + (1 if i < leftover else 0)) for i, s in enumerate(by_frac)]


def source_temperature_mix(
    df: DataFrame,
    alpha: float = 0.7,
    total_docs: int = 1000,
    id_col: str = "doc_id",
    shard_col: str = "source",
) -> DataFrame:
    """Temperature-weighted source mixture (the alpha-sampling every
    multi-source training corpus uses, e.g. multilingual LM recipes):
    source s with c_s documents gets target floor(total * c_s^alpha /
    sum_t c_t^alpha) slots — alpha < 1 upweights small sources, alpha = 1
    is proportional, alpha = 0 is uniform. Selection within a source is a
    deterministic pseudo-random order (md5 of source||id), so the same
    corpus always yields the same mix — reproducible data recipes.

    Scale shape: one groupBy(source) for the counts (domain-bounded), the
    tiny per-source target map broadcast-joined back, one shuffle on the
    source key for the per-source window rank. The md5 order means no
    source's selection depends on any other partition's data."""
    from pyspark.sql import Window

    counts = {r[shard_col]: r["c"] for r in df.groupBy(shard_col).agg(F.count("*").alias("c")).collect()}
    targets = temperature_targets(counts, alpha, total_docs)
    spark = df.sparkSession
    tgt = spark.createDataFrame(targets, f"{shard_col} string, __target long")
    w = Window.partitionBy(shard_col).orderBy(
        F.md5(F.concat_ws("|", F.col(shard_col), F.col(id_col).cast("string")))
    )
    return (
        df.join(F.broadcast(tgt), shard_col)
        .withColumn("__mix_rn", F.row_number().over(w))
        .filter(F.col("__mix_rn") <= F.col("__target"))
        .drop("__mix_rn", "__target")
    )


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.7,
    lang: str = "en",
) -> DataFrame:
    """End-to-end curation chain: quality filter -> language filter ->
    exact dedup (keep lowest id per identical text) -> per-source manifest
    (surviving docs + BPE-ish token sum).

    One pipeline, three of the standard curation stages composed — filters
    are plain predicates (pushed down to the scan), dedup is one shuffle on
    the text hash, the manifest one shuffle on source.
    """
    from naru_spark.pipeline.text import with_lang_id, with_quality_score, BPE_TOKEN_RE

    scored = with_quality_score(df, text_col)
    scored = with_lang_id(scored, text_col)
    kept = scored.filter(
        (F.col("quality_score") >= min_quality) & (F.col("lang_pred") == lang)
    )
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    deduped = kept.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        deduped.withColumn(
            "n_bpe", F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0))
        )
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_bpe").alias("n_tokens"))
    )


# PII patterns chosen to parse identically under Java regex (Spark) and
# RE2 (DuckDB): no backrefs, no lookaround.
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IPV4_RE = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
PII_PHONE_RE = "\\+?[0-9][0-9\\- ]{7,}[0-9]"


def pii_redact(df, text_col: str = "text"):
    """Regex PII scrubbing (emails -> <EMAIL>, IPv4 -> <IP>, phone-like
    digit runs -> <PHONE>) with per-document redaction counts. Order
    matters: emails first (their local parts contain digits), then IPs
    (dotted digits would otherwise half-match the phone pattern), then
    phones. Pure row-local JVM regex — zero shuffle, codegen-friendly —
    exactly the shape PII scrubbing must have at 100 TB (any per-doc
    Python hop would dominate the pipeline).
    """
    from pyspark.sql import functions as F

    text = F.col(text_col)
    n_email = F.regexp_count(text, F.lit(PII_EMAIL_RE))
    t1 = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    n_ip = F.regexp_count(t1, F.lit(PII_IPV4_RE))
    t2 = F.regexp_replace(t1, PII_IPV4_RE, "<IP>")
    n_phone = F.regexp_count(t2, F.lit(PII_PHONE_RE))
    t3 = F.regexp_replace(t2, PII_PHONE_RE, "<PHONE>")
    return (
        df.withColumn("text_redacted", t3)
        .withColumn("n_emails", n_email)
        .withColumn("n_ips", n_ip)
        .withColumn("n_phones", n_phone)
        .withColumn("n_redactions", n_email + n_ip + n_phone)
    )


def data_split(
    df,
    text_col: str = "text",
    train_prefixes: str = "0123456789abc",
    val_prefixes: str = "de",
) -> "DataFrame":
    """Deterministic content-hash train/val/test split: the first hex digit
    of md5(text) routes each document (13/16 train, 2/16 val, 1/16 test
    by default). Content-hash routing is the standard trick that keeps a
    document on the same side of the split across corpus versions and
    re-runs — row order, partitioning, and ingestion date never move a doc
    between train and test (which would silently contaminate evals).

    Pure row-local JVM expressions; zero shuffle."""
    from pyspark.sql import functions as F

    first = F.substring(F.md5(F.col(text_col)), 1, 1)
    split = (
        F.when(first.isin(*list(train_prefixes)), F.lit("train"))
        .when(first.isin(*list(val_prefixes)), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


# Gopher rule set (Rae et al. 2021, "Scaling Language Models: ... Gopher",
# Table A1): the canonical doc-level quality gate every production corpus
# pipeline applies before training.
GOPHER_REQUIRED_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with", "a", "in"]


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_distinct_stopwords: int = 2,
) -> DataFrame:
    """Gopher-style composite quality filter: one boolean per rule plus the
    conjunction (``keep``), so downstream can both FILTER and AUDIT (which
    rule rejected how much — the number every curation report prints).

    Rules (defaults = the paper's; callers tune per corpus):
      word count in [min_words, max_words]; mean word length in
      [min, max]; symbol-to-word ratio (# and ellipsis) <= max;
      fraction of words containing an alphabetic char >= min; at least
      ``min_distinct_stopwords`` DISTINCT required stopwords present.

    All pure JVM array/regex expressions — single pass, zero shuffle,
    whole-stage codegen; ratios rounded to 6 so the DuckDB oracle
    reproduces them bit-for-bit."""
    text = F.col(text_col)
    toks = tokens_col(text_col)
    n_words = F.size(toks)
    sum_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    mean_wl = F.when(n_words > 0, F.round(sum_len / n_words, 6)).otherwise(F.lit(0.0))
    n_hash = F.length(text) - F.length(F.regexp_replace(text, "#", ""))
    n_ellipsis = (F.length(text) - F.length(F.regexp_replace(text, "\\.\\.\\.", ""))) / 3
    symbol_ratio = F.when(n_words > 0, F.round((n_hash + n_ellipsis) / n_words, 6)).otherwise(F.lit(0.0))
    n_alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    alpha_frac = F.when(n_words > 0, F.round(n_alpha_words / n_words, 6)).otherwise(F.lit(0.0))
    req = F.array(*[F.lit(w) for w in GOPHER_REQUIRED_STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, req))  # DISTINCT by construction

    r_words = (n_words >= min_words) & (n_words <= max_words)
    r_mean = (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
    r_symbol = symbol_ratio <= max_symbol_ratio
    r_alpha = alpha_frac >= min_alpha_word_frac
    r_stop = n_stop >= min_distinct_stopwords
    return (
        df.withColumn("n_words", n_words)
        .withColumn("mean_word_len", mean_wl)
        .withColumn("symbol_ratio", symbol_ratio)
        .withColumn("alpha_word_frac", alpha_frac)
        .withColumn("n_req_stopwords", n_stop)
        .withColumn("pass_word_count", r_words)
        .withColumn("pass_mean_word_len", r_mean)
        .withColumn("pass_symbol_ratio", r_symbol)
        .withColumn("pass_alpha_words", r_alpha)
        .withColumn("pass_stopwords", r_stop)
        .withColumn("keep", r_words & r_mean & r_symbol & r_alpha & r_stop)
    )


def stratified_sample_hash(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    text_col: str = "text",
    salt: str = "seed0",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic hash-stratified downsampling: keep a document iff the
    first 8 hex digits of md5(salt || text) fall below its source's rate
    threshold (floor(rate * 16^8) rendered as 8-digit hex, compared
    LEXICOGRAPHICALLY — both engines agree on lowercase-hex ordering, so
    the decision is bit-reproducible).

    This is the production-correct downsampler: per-row keep decisions are
    a pure function of content + salt, so re-runs, repartitions, corpus
    reorderings, and different engines select the SAME documents — unlike
    rand()-based sampleBy, whose selection changes with partitioning.
    Changing ``salt`` redraws the sample. Zero shuffle."""
    h = F.substring(F.md5(F.concat(F.lit(salt), F.col(text_col))), 1, 8)

    def thr(rate: float) -> str:
        return format(min(int(rate * 16**8), 16**8 - 1) if rate < 1.0 else 16**8 - 1, "08x")

    expr = None
    for src, rate in sorted(rates.items()):
        cond = F.col(source_col) == src
        keep_src = h < F.lit(thr(rate)) if rate < 1.0 else F.lit(True)
        expr = F.when(cond, keep_src) if expr is None else expr.when(cond, keep_src)
    default_keep = F.lit(True) if default_rate >= 1.0 else (h < F.lit(thr(default_rate)))
    keep = default_keep if expr is None else expr.otherwise(default_keep)
    return df.withColumn("__h8", h).withColumn("keep", keep)


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 200,
    overlap: int = 50,
) -> DataFrame:
    """Split documents into fixed-size character windows with overlap —
    the context-length prep step between curation and tokenization (long
    docs must be windowed; the overlap preserves cross-boundary context).

    Chunk starts are ``1, 1+step, ...`` up to ``max(1, len - overlap)``
    with ``step = chunk_chars - overlap``; a shorter-than-overlap document
    yields exactly one whole-document chunk. posexplode(sequence(...)) —
    row-local generation, zero shuffle, chunk_id deterministic."""
    assert overlap < chunk_chars
    step = chunk_chars - overlap
    text = F.col(text_col)
    starts = F.sequence(
        F.lit(1), F.greatest(F.lit(1), F.length(text) - F.lit(overlap)), F.lit(step)
    )
    exploded = df.select(
        id_col, text_col, F.posexplode(starts).alias("chunk_id", "chunk_start")
    )
    chunk = F.substring(F.col(text_col), F.col("chunk_start"), chunk_chars)
    return exploded.select(
        id_col,
        "chunk_id",
        "chunk_start",
        chunk.alias("chunk"),
        F.length(chunk).alias("chunk_len"),
    )


def expect(
    df,
    rules: "list[tuple[str, object]]",
    unique_keys: "list[str] | None" = None,
):
    """Data-quality expectations (Great-Expectations / dbt-test shape) in
    ONE aggregation pass: each rule is (name, boolean Column) counted as
    SUM(NOT rule) violations over a single scan — at 100 TB that is one
    map-side-combined job regardless of how many rules ride it.
    ``unique_keys`` adds a uniqueness expectation per key column
    (COUNT(*) - COUNT(DISTINCT k) duplicate rows), which needs its own
    distinct aggregate but still shares the same scan.

    Returns (rule, violations, total, pass) — the report a pipeline gates
    ingest on."""
    from pyspark.sql import functions as F

    aggs = [F.count("*").alias("__total")]
    for name, cond in rules:
        # NULL never passes a rule: NOT(NULL) is NULL, so count via
        # "not true" semantics — violation iff the condition is not TRUE
        aggs.append(
            F.sum((~cond.eqNullSafe(F.lit(True))).cast("long")).alias(f"v_{name}")
        )
    for k in unique_keys or []:
        aggs.append(
            (F.count(k) - F.count_distinct(F.col(k))).alias(f"v_unique_{k}")
        )
    row = df.agg(*aggs).collect()[0]
    total = int(row["__total"])
    out = []
    for name, _ in rules:
        v = int(row[f"v_{name}"])
        out.append((name, v, total, v == 0))
    for k in unique_keys or []:
        v = int(row[f"v_unique_{k}"])
        out.append((f"unique_{k}", v, total, v == 0))
    spark = df.sparkSession
    return spark.createDataFrame(
        out, "rule string, violations bigint, total bigint, pass boolean"
    )
