"""Text analysis operators: tokenization, quality scoring, language ID,
document fingerprinting.

All JVM-side (built-in pyspark.sql.functions — no Python UDFs), so they
stay inside whole-stage codegen and scale linearly with executors. Counts
are exact integers; ratios are a single division of two exact integers
rounded to 6 decimals — bit-reproducible against any engine that computes
the same integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column, functions as F

# Tokenization: whitespace split of trimmed text (empty -> zero tokens).
TOKEN_SPLIT_RE = "\\s+"

# Minimal stopword lists for the n-gram/stopword language-ID heuristic.
LANG_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en", "por", "que"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # tie-break order (first wins)


def tokens_col(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, TOKEN_SPLIT_RE)
    )


def _stopword_hits(toks: Column, words: list[str]) -> Column:
    """#tokens that are in `words` (duplicates counted — array_intersect
    would dedup and change the statistic)."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token count, char count, punctuation/digit/space counts, stopword
    hits, and a quality score in [0,1] (length/punct/stopword heuristics —
    same family as Gopher/C4-style quality rules)."""
    toks = tokens_col(text_col)
    text = F.col(text_col)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(text, "\\p{Punct}", ""))
    n_digit = n_chars - F.length(F.regexp_replace(text, "[0-9]", ""))
    n_space = n_chars - F.length(F.regexp_replace(text, " ", ""))
    sw_hits = _stopword_hits(toks, LANG_STOPWORDS["en"])
    mean_tok_len = F.when(n_tokens > 0, F.round((n_chars - n_space) / n_tokens, 6)).otherwise(F.lit(0.0))
    # quality: penalize extreme length, high punct ratio, zero stopwords
    punct_ratio = F.when(n_chars > 0, F.round(n_punct / n_chars, 6)).otherwise(F.lit(0.0))
    sw_ratio = F.when(n_tokens > 0, F.round(sw_hits / n_tokens, 6)).otherwise(F.lit(0.0))
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("n_chars_calc", n_chars)
        .withColumn("n_punct", n_punct)
        .withColumn("n_digit", n_digit)
        .withColumn("mean_token_len", mean_tok_len)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stopword_ratio", sw_ratio)
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scalar quality score from exact-integer components, fixed op order."""
    d = with_text_stats(df, text_col)
    score = (
        F.when((F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(F.col("punct_ratio") <= 0.2, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(F.col("mean_token_len").between(2.0, 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return d.withColumn("quality_score", F.round(score, 2))


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID: score per language = #tokens in that
    language's stopword list; argmax with fixed tie order (LANG_ORDER,
    'und' when all zero). Pure JVM expressions."""
    toks = tokens_col(text_col)
    scores = {lang: _stopword_hits(toks, LANG_STOPWORDS[lang]) for lang in LANG_ORDER}
    best = F.lit("und")
    best_score = F.lit(0)
    # forward order + strict '>' means the FIRST language in LANG_ORDER wins
    # ties (a later language only replaces with a strictly higher score)
    for lang in LANG_ORDER:
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    out = df.withColumn("lang_pred", best)
    for lang in LANG_ORDER:
        out = out.withColumn(f"score_{lang}", scores[lang])
    return out


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprints: md5 (cross-engine) and a 64-bit
    xxhash64 (Spark-native, for shuffle-friendly joins)."""
    return df.withColumn("fp_md5", F.md5(F.col(text_col))).withColumn(
        "fp_xxh64", F.xxhash64(F.col(text_col))
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """MOSS-style winnowing fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): hash every character k-gram with a rolling window over the
    hash sequence, keep each window's minimum, and emit the DISTINCT
    selected hashes as the document's fingerprint set. Guarantees every
    shared substring of length >= k + window - 1 contributes at least one
    shared fingerprint, at ~1/window the density of the full k-gram set.

    Entirely JVM expression-level (transform/sequence/slice/array_min over
    the row) — ZERO shuffle, no UDF, linear per-partition work; the
    selection runs inside whole-stage codegen however long the documents
    are. ``base_hash='md5'`` uses the first 15 hex chars of md5 as a 60-bit
    integer, reproducible in any engine with an md5 function (DuckDB:
    CAST('0x'||substr(md5(g),1,15) AS UBIGINT)); 'xxhash64' is the
    Spark-native fast path, same plan shape.

    Documents shorter than ``k`` characters have no k-gram and emit no
    fingerprint; documents with fewer than ``window`` grams emit their
    single minimum gram hash (the standard short-document degeneration).

    Returns (id_col, fp) rows, distinct per input ROW (row-local work
    cannot see a duplicated id across rows — callers joining on fp over
    possibly-duplicated ids must .distinct() first, as
    ``dedup.winnow_overlap_pairs`` does).
    """
    if base_hash == "md5":
        gram_hash = (
            f"CAST(conv(substring(md5(substring({text_col}, CAST(i AS INT), {k})),"
            " 1, 15), 16, 10) AS BIGINT)"
        )
    elif base_hash == "xxhash64":
        gram_hash = f"xxhash64(substring({text_col}, CAST(i AS INT), {k}))"
    else:  # pragma: no cover - guarded misuse
        raise ValueError(f"base_hash must be 'md5' or 'xxhash64', got {base_hash!r}")
    grams = (
        f"transform(sequence(1, length({text_col}) - {k} + 1), i -> {gram_hash})"
    )
    # sequence(1, n-w+1) needs n >= w; shorter gram lists degrade to the
    # single global minimum (CASE first — sequence(1, 0) would count DOWN)
    fps = (
        f"CASE WHEN size(__grams) >= {window} THEN "
        f"array_distinct(transform(sequence(1, size(__grams) - {window} + 1), "
        f"j -> array_min(slice(__grams, CAST(j AS INT), {window})))) "
        "ELSE array(array_min(__grams)) END"
    )
    return (
        df.filter(F.length(F.col(text_col)) >= k)
        .withColumn("__grams", F.expr(grams))
        .select(F.col(id_col), F.explode(F.expr(fps)).alias("fp"))
    )


def token_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Global token frequency (explode -> groupBy): the canonical
    shuffle-bounded text aggregation; reduce side is |vocab|."""
    return (
        df.select(F.explode(tokens_col(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )


# BPE-ish pre-tokenizer: letter runs, digit runs, and single non-space
# symbols — the split a byte-pair tokenizer sees before merges. Counting
# these approximates LLM token counts far better than whitespace words
# (punctuation and numbers become their own tokens).
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token counts under both tokenizers: whitespace words
    and the BPE-ish regex. Pure JVM (regexp_extract_all), no UDFs."""
    return df.withColumn("n_ws_tokens", F.size(tokens_col(text_col))).withColumn(
        "n_bpe_tokens",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0)),
    )


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style per-document repetition statistics, computed entirely
    inside the row (sort the token array, fold it once) — ZERO shuffle and
    no explode blow-up, vs. the naive explode->groupBy->window shape that
    shuffles every token.

    Adds: n_tokens, n_distinct_tokens, top_token_cnt (count of the most
    frequent token; fold over the sorted array tracks the longest equal-run),
    top_token_ratio / distinct_ratio (6-decimal ratios of exact ints)."""
    toks = F.array_sort(tokens_col(text_col))
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(run, acc["best"]).alias("best")
        )

    out = (
        df.withColumn("n_tokens", F.size(toks))
        .withColumn("n_distinct_tokens", F.size(F.array_distinct(toks)))
        .withColumn("top_token_cnt", F.aggregate(toks, acc0, step, lambda a: a["best"]))
    )
    return out.withColumn(
        "top_token_ratio",
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("top_token_cnt") / F.col("n_tokens"), 6),
        ).otherwise(F.lit(0.0)),
    ).withColumn(
        "distinct_ratio",
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("n_distinct_tokens") / F.col("n_tokens"), 6),
        ).otherwise(F.lit(0.0)),
    )


def doc_lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 0.5,
) -> DataFrame:
    """Unigram-LM document scoring (the CCNet-style quality signal): build
    corpus token frequencies, then score each document by its mean
    negative log2 token probability (bits/token, additive smoothing). Low
    = typical-vocabulary text, high = rare-token soup — the standard cheap
    filter between hand rules and a real LM.

    Scale shape: ONE groupBy(token) bounded by vocabulary size for the LM,
    two scalar aggregates for the normalizer, then a token->count join
    (AQE broadcasts the vocab while it fits; beyond broadcast it is a
    plain shuffled equi-join on the token — never row x vocab) and one
    groupBy(doc) for the mean. Docs with no tokens drop out (no score).
    """
    toks = df.select(F.col(id_col).alias("__id"), F.explode(tokens_col(text_col)).alias("token"))
    vocab = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("n"), F.count("*").alias("v")).collect()[0]
    n, v = int(tot["n"]), int(tot["v"])
    denom = float(n) + smoothing * v
    scored = toks.join(vocab, "token").withColumn(
        "__nlp", -F.log2((F.col("cnt") + F.lit(smoothing)) / F.lit(denom))
    )
    return (
        scored.groupBy("__id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("__nlp"), 4).alias("bits_per_token"),
        )
        .select(F.col("__id").alias(id_col), "n_tokens", "bits_per_token")
    )


def ngrams_col(toks: Column, n: int) -> Column:
    """Array of space-joined token ``n``-grams, built as a chain of n-1
    ``zip_with`` ops over shifted slices. The obvious
    ``transform(sequence(...), i -> concat_ws(slice(toks, i+1, n)))``
    shape runs ~20x slower (measured 17s vs 0.8s on the sf0.1 corpus):
    a dynamic-start ``slice`` inside a lambda is re-evaluated per element
    on the interpreted path, while zip_with over pre-shifted slices stays
    vectorized. Fewer than n tokens -> empty array."""
    m = F.size(toks) - (n - 1)  # number of n-grams
    acc = F.slice(toks, 1, m)
    for j in range(1, n):
        acc = F.zip_with(acc, F.slice(toks, j + 1, m), lambda a, b: F.concat_ws(" ", a, b))
    return F.when(F.size(toks) >= n, acc).otherwise(F.array().cast("array<string>"))


def normalize_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4-style text normalization: lowercase, collapse whitespace runs to
    a single space, trim. Adds ``text_norm`` and ``n_chars_norm``. Pure
    row-local JVM expressions (whole-stage codegen, zero shuffle) — the
    canonical first step before exact dedup so that case/whitespace
    variants of the same content hash identically."""
    text = F.col(text_col)
    norm = F.lower(F.regexp_replace(F.trim(text), "\\s+", " "))
    return df.withColumn("text_norm", norm).withColumn("n_chars_norm", F.length(norm))


def ngram_histogram(
    df: DataFrame, text_col: str = "text", n: int = 2, k: int = 100
) -> DataFrame:
    """Corpus top-k token n-grams (the vocabulary-building / collocation
    statistic). Per-row n-gram arrays (no global state) -> ONE groupBy
    shuffle bounded by #distinct n-grams -> global top-k, which Spark plans
    as TakeOrderedAndProject (per-partition heap + driver merge, never a
    full sort). Ties broken by ngram text ascending for determinism."""
    return (
        df.select(F.explode(ngrams_col(tokens_col(text_col), n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("ngram").asc())
        .limit(k)
    )


def doc_lm_bigram_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.8,
    smoothing: float = 0.5,
) -> DataFrame:
    """Interpolated bigram-LM document scoring — the KenLM-shaped upgrade
    of :func:`doc_lm_score`: per token position i >= 1,

        P(w_i | w_{i-1}) = lam * c(w_{i-1} w_i)/c(w_{i-1})
                           + (1-lam) * (c(w_i)+s)/(N + s*V)

    and the document score is the mean -log2 P in bits/token (positions
    1..L-1; docs with < 2 tokens drop out). Low = fluent under corpus
    statistics, high = rare-transition soup.

    Scale shape: bigram + unigram count tables are bounded by #distinct
    n-grams (vocabulary-scale, not corpus-scale); scoring is two equi-joins
    of the exploded positions against those tables (AQE broadcasts them
    while small) and one groupBy(doc). Nothing is ever row x vocab.
    """
    # materialize the token array ONCE before the filter/explode — the
    # slice/size references below would otherwise each re-evaluate the
    # regex split (subexpression elimination does not cross the
    # Filter/Generate operator boundary; same measured fix as BM25's
    # retrieval._doc_term_dl, ~5 evaluations -> 1)
    tdf = df.withColumn("__toks", tokens_col(text_col))
    toks = F.col("__toks")
    pairs = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda p, c: F.struct(p.alias("prev"), c.alias("cur")),
    )
    pos = (
        tdf.filter(F.size(toks) >= 2)
        .select(F.col(id_col).alias("__id"), F.explode(pairs).alias("pc"))
        .select("__id", F.col("pc.prev").alias("prev"), F.col("pc.cur").alias("cur"))
    )
    uni = tdf.select(F.explode(toks).alias("token")).groupBy("token").agg(
        F.count("*").alias("ucnt")
    )
    tot = uni.agg(F.sum("ucnt").alias("n"), F.count("*").alias("v")).collect()[0]
    denom = float(int(tot["n"])) + smoothing * int(tot["v"])
    bi = pos.groupBy("prev", "cur").agg(F.count("*").alias("bcnt"))
    scored = (
        pos.join(bi, ["prev", "cur"])
        .join(uni.select(F.col("token").alias("prev"), F.col("ucnt").alias("pcnt")), "prev")
        .join(uni.select(F.col("token").alias("cur"), F.col("ucnt").alias("ccnt")), "cur")
        .withColumn(
            "__nlp",
            -F.log2(
                F.lit(lam) * F.col("bcnt") / F.col("pcnt")
                + F.lit(1.0 - lam) * (F.col("ccnt") + F.lit(smoothing)) / F.lit(denom)
            ),
        )
    )
    return (
        scored.groupBy("__id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("__nlp"), 4).alias("bits_per_token"),
        )
        .select(F.col("__id").alias(id_col), "n_bigrams", "bits_per_token")
    )


def token_idf(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document frequency + smoothed IDF per token (the IDF half of TF-IDF;
    the TF half is token_histogram). One shuffle on token after a per-row
    array_distinct — shuffle volume is distinct tokens per doc, not tokens."""
    n_docs = df.count()
    return (
        df.select(F.explode(F.array_distinct(tokens_col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("df"))
        .withColumn("idf", F.round(F.log(F.lit(float(n_docs)) / F.col("df")), 6))
    )


def length_buckets(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token-length power-of-two bucket histogram (the packing/batching
    planner's input: how much of the corpus lands in each sequence-length
    bucket). The bucket is computed with exact integer math — the length
    of the binary representation of n_tokens minus one, i.e.
    floor(log2(n)) without float log edge cases at exact powers of two.
    One groupBy over ~30 buckets; map-side combine makes the shuffle
    negligible."""
    n = F.size(tokens_col(text_col))
    bucket = F.when(n > 0, F.length(F.conv(n.cast("string"), 10, 2)) - 1).otherwise(
        F.lit(-1)
    )
    return (
        df.withColumn("len_bucket", bucket)
        .groupBy("len_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(tokens_col(text_col))).alias("n_tokens"),
        )
    )


def vocab_coverage(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", top_k: int = 10
) -> DataFrame:
    """Per-document vocabulary coverage against the corpus' own top-k
    tokens (cnt desc, token asc tie-break): n_in_vocab, n_oov, oov_rate.
    The tokenizer-fit feedback signal — how much text a fixed vocabulary
    explains.

    Scale shape: the vocab is ONE bounded groupBy + top-k (driver-collected
    at k rows — k is vocabulary-sized, never corpus-sized) broadcast into a
    row-local array_contains filter; the per-doc pass is zero-shuffle."""
    vocab_rows = (
        df.select(F.explode(tokens_col(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(top_k)
        .collect()
    )
    vocab = [r.token for r in vocab_rows]
    toks = tokens_col(text_col)
    arr = F.array(*[F.lit(w) for w in vocab])
    n_in = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    n_tok = F.size(toks)
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_in.alias("n_in_vocab"),
        (n_tok - n_in).alias("n_oov"),
        F.when(n_tok > 0, F.round((n_tok - n_in) / n_tok, 6)).otherwise(F.lit(0.0)).alias("oov_rate"),
    )


def perplexity_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style perplexity bucketing: per LANGUAGE, split documents
    into head / middle / tail thirds by their unigram-LM bits/token
    (doc_lm_score) — the selection CCNet feeds to training (head =
    most-typical text; tail = rare-token soup, usually dropped or
    down-weighted).

    Scale shape: the naive NTILE window would globally sort every
    language partition; instead the tercile BOUNDARIES come from ONE
    exact-percentile aggregate per language (SQL PERCENTILE_CONT
    semantics — the engine-parity-pinned p*(n-1) interpolation) and
    assignment is a broadcast-join CASE — no per-language global sort
    anywhere. Boundaries compare against the ROUNDED score both engines
    share, so bucket assignment is engine-exact."""
    scored = doc_lm_score(df, id_col=id_col, text_col=text_col)
    docs = df.select(id_col, F.col(lang_col).alias("lang"))
    s = scored.join(docs, id_col)
    bounds = s.groupBy("lang").agg(
        F.expr(f"percentile(bits_per_token, {1/3!r})").alias("__b1"),
        F.expr(f"percentile(bits_per_token, {2/3!r})").alias("__b2"),
    )
    return (
        s.join(F.broadcast(bounds), "lang")
        .select(
            id_col,
            "lang",
            "bits_per_token",
            F.when(F.col("bits_per_token") <= F.col("__b1"), F.lit("head"))
            .when(F.col("bits_per_token") <= F.col("__b2"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )
