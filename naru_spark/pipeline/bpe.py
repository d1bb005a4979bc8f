"""Byte-pair-encoding vocabulary learning over a Spark corpus.

The canonical BPE trainer (Sennrich et al. 2016) iterates: count adjacent
symbol pairs across the corpus, merge the most frequent pair, repeat. The
100 TB-shape observation is that the corpus only matters for the WORD
FREQUENCY table — after one distributed word count (vocabulary-bounded
aggregate, exactly the shape of ``token_histogram``), the merge loop runs
on that bounded table, never touching the corpus again. So:

- ``word_frequencies``: ONE distributed scan -> (word, freq), the only
  corpus-sized job in the trainer.
- ``bpe_pair_counts``: the statistic of the first merge round — adjacent
  CHARACTER-pair frequencies weighted by word frequency. Deterministic and
  SQL-expressible (exact DuckDB oracle in the gate).
- ``bpe_learn``: the full merge loop, driver-side over the collected
  word-frequency table (bounded by |vocab|, not rows). Deterministic
  tiebreak (count desc, pair asc) so two runs — or two engines — produce
  the identical merge sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from naru_spark.pipeline.text import tokens_col


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the whitespace-token stream — the single
    corpus-sized aggregation the BPE trainer needs (map-side combined
    groupBy, output bounded by vocabulary size)."""
    return (
        df.select(F.explode(tokens_col(text_col)).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def bpe_pair_counts(df: DataFrame, text_col: str = "text", k: int = 50) -> DataFrame:
    """Top-k adjacent character-pair frequencies, weighted by word
    frequency — round 1 of BPE training, as one declarative plan: word
    count -> per-distinct-word pair explode (work is |vocab| x word_len,
    NOT corpus-sized) -> weighted sum -> deterministic top-k
    (count desc, pair asc; plans as TakeOrderedAndProject)."""
    wf = word_frequencies(df, text_col)
    chars = F.split(F.col("word"), "")
    n = F.size(chars) - 1
    pairs = F.zip_with(
        F.slice(chars, 1, n), F.slice(chars, 2, n), lambda a, b: F.concat(a, b)
    )
    return (
        wf.filter(F.length("word") >= 2)
        .select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
        .limit(k)
    )


def bpe_learn(
    df: DataFrame, num_merges: int = 20, text_col: str = "text"
) -> list[tuple[int, str, str, int]]:
    """Learn ``num_merges`` BPE merges: one distributed word count, then
    the standard merge loop on the driver over the bounded (word, freq)
    table. Returns [(rank, left_symbol, right_symbol, pair_count)].

    Driver-side is the honest scale answer here, not a shortcut: each
    round's pair recount touches |vocab| entries (say 10^6) regardless of
    corpus size, and the merge mutates symbol sequences in place — a
    Spark job per merge would pay a full shuffle per round for work that
    is microseconds on the collected table. (The reference trainer used
    by every production tokenizer does exactly this.)"""
    rows = word_frequencies(df, text_col).collect()
    vocab = {tuple(r["word"]): int(r["freq"]) for r in rows}
    return _merge_loop(vocab, num_merges)


def bpe_learn_pandas(
    sf_dir: str, num_merges: int = 20, text_col: str = "text"
) -> list[tuple[int, str, str, int]]:
    """Engine-independent twin of ``bpe_learn``: word frequencies via
    pyarrow/pandas, the SAME deterministic merge loop. Used where merges
    must be available WITHOUT a SparkSession (oracle-SQL generation) —
    parity with the Spark trainer is pinned in tests."""
    import os

    import pyarrow.parquet as pq

    pdf = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=[text_col]
    ).to_pandas()
    vocab: dict[tuple[str, ...], int] = {}
    for text in pdf[text_col]:
        for w in str(text).split():
            if w:
                key = tuple(w)
                vocab[key] = vocab.get(key, 0) + 1
    return _merge_loop(vocab, num_merges)


def _merge_loop(
    vocab: dict[tuple, int], num_merges: int
) -> list[tuple[int, str, str, int]]:
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        # deterministic: max count, ties -> lexicographically first pair
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        merged = left + right
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, freq in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + freq
        vocab = new_vocab
        merges.append((rank, left, right, cnt))
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
    emit_tokens: bool = False,
    vocab: dict[str, int] | None = None,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Apply learned merges to the corpus — the job that actually runs at
    100 TB, and it is embarrassingly map-only: the merge table (KBs)
    broadcasts inside the closure, every executor encodes its rows
    independently (Arrow-batched mapInPandas), zero shuffle. A per-word
    memo exploits the corpus' repeated vocabulary: each DISTINCT word is
    encoded once per partition, not once per occurrence.

    Encoding is the standard greedy scheme: repeatedly apply the
    lowest-rank applicable merge until none applies. Deterministic given
    the merges, so two engines (or the pure-python reference in tests)
    agree token-for-token. Output: per-doc BPE token count + distinct
    token count (the corpus-level stats a tokenizer report needs);
    ``emit_tokens`` adds the token-string sequence, ``vocab`` (a
    broadcastable symbol->id dict, see ``bpe_vocab``) adds the id
    sequence the packing/training loader consumes (unknown symbols map
    to -1), ``passthrough`` forwards extra columns (e.g. the shard key)
    so downstream stages need no re-join."""
    import pandas as pd

    ranks = {(l, r): i for i, l, r, _ in merges}
    extra_schema = "".join(
        f", {f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in passthrough
    )
    out_schema = f"{id_col} long, n_bpe_tokens int, n_distinct_tokens int" + extra_schema
    if emit_tokens:
        out_schema += ", tokens array<string>"
    if vocab is not None:
        out_schema += ", token_ids array<int>"

    def encode_word(word: str, memo: dict) -> tuple:
        got = memo.get(word)
        if got is not None:
            return got
        syms = list(word)
        while len(syms) > 1:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                rk = ranks.get((syms[i], syms[i + 1]))
                if rk is not None and (best_rank is None or rk < best_rank):
                    best_rank, best_i = rk, i
            if best_i is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        got = tuple(syms)
        memo[word] = got
        return got

    extra_cols = [c for c in passthrough]
    col_names = (
        [id_col, "n_bpe_tokens", "n_distinct_tokens"]
        + extra_cols
        + (["tokens"] if emit_tokens else [])
        + (["token_ids"] if vocab is not None else [])
    )

    def run(batches) -> "pd.DataFrame":
        memo: dict = {}
        for pdf in batches:
            rows = []
            # zip over column arrays, never pdf.iterrows(): a per-row
            # pandas Series allocation would dominate the map-only encode
            # cost at corpus scale
            for rid, text, *extras in zip(
                pdf[id_col], pdf[text_col], *(pdf[c] for c in extra_cols)
            ):
                toks: list = []
                for w in str(text).split():
                    toks.extend(encode_word(w, memo))
                out = [int(rid), len(toks), len(set(toks))]
                out += extras
                if emit_tokens:
                    out.append(list(toks))
                if vocab is not None:
                    out.append([vocab.get(t, -1) for t in toks])
                rows.append(tuple(out))
            yield pd.DataFrame(rows, columns=col_names)

    return df.select(id_col, text_col, *extra_cols).mapInPandas(run, schema=out_schema)


def bpe_vocab(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """Deterministic (token, token_id) table for a learned merge set: the
    distinct final tokens of the encoded corpus, ids assigned in sorted
    token order. Vocabulary-bounded (so the single-partition id window is
    fine); broadcastable into ``bpe_encode(vocab=...)`` for id emission —
    the tokenizer-artifact table a training pipeline persists beside the
    merges."""
    from pyspark.sql import Window

    toks = (
        bpe_encode(df, merges, text_col=text_col, emit_tokens=True)
        .select(F.explode("tokens").alias("token"))
        .distinct()
    )
    w = Window.orderBy("token")
    return toks.withColumn("token_id", F.row_number().over(w) - 1)


def bpe_pack_manifest(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    seq_len: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
) -> DataFrame:
    """Tokenize -> pack as ONE oracle-backed path: per-doc BPE token
    counts from the learned merges (map-only ``bpe_encode`` with the shard
    key passed through — no re-join), chained into the concat-and-chunk
    pack manifest (``curation.pack_token_counts``). The manifest's
    shard/token accounting is exact and deterministic given the merges, so
    a SQL engine replaying the merge chain reproduces it bit-for-bit."""
    from naru_spark.pipeline.curation import pack_token_counts

    counts = bpe_encode(
        df, merges, id_col=id_col, text_col=text_col, passthrough=(shard_col,)
    ).select(
        F.col(shard_col).alias("shard"),
        F.col(id_col).alias("id"),
        F.col("n_bpe_tokens").alias("n_toks"),
    )
    return pack_token_counts(counts, seq_len, shard_col)
