"""LIKE-predicate (substring) cardinality estimation from character n-gram
statistics.

The reference's query surface is conjunctive =/range only
(estimators.py:20-26); production query logs are full of
``WHERE col LIKE '%s%'``, and neural approaches exist (LPLM, SIGMOD 2024).
This module implements the classic n-gram chain estimator (the
Krishnan/Vitter/Iyer-style baseline those papers compare against),
re-expressed Spark-first:

- statistics: ONE pass over the column building character n-gram and
  (n-1)-gram DOCUMENT frequencies (fraction of rows containing the gram).
  Both tables are bounded by the corpus' gram vocabulary, never by rows —
  the 100 TB-safe shape (explode per-row distinct grams -> groupBy(gram)).
- estimate: for pattern ``%s%`` with n-grams g_1..g_m (chain over
  (n-1)-char overlaps),

      sel(s) = P(g_1) * prod_{i>1} P(g_i) / P(prefix_{n-1}(g_i))

  i.e. each next char is conditioned on the preceding (n-1)-gram — the
  Markov assumption that makes the estimate computable from bounded
  statistics. Multiplication is in FIXED left-to-right order with the same
  float math on both the estimator and any SQL oracle, so estimates are
  engine-reproducible (same protocol as the workload count ratios).

Patterns shorter than n fall back to the (n-1)-gram (or exact scan-free
1.0 selectivity cap). Estimates are capped into [0, 1] selectivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def char_ngrams_expr(col, n: int):
    """Array of character n-grams of a string column (JVM-side): zip_with
    chain over shifted single-char splits — same vectorized shape as
    naru_spark.pipeline.text.ngrams_col, with '' as the join."""
    chars = F.split(col, "")
    m = F.size(chars) - (n - 1)
    acc = F.slice(chars, 1, m)
    for j in range(1, n):
        acc = F.zip_with(acc, F.slice(chars, j + 1, m), lambda a, b: F.concat(a, b))
    return F.when(F.size(chars) >= n, acc).otherwise(F.array().cast("array<string>"))


class LikeEstimator:
    """Substring-selectivity estimator for ``col LIKE '%s%'`` patterns.

    fit: two bounded aggregations (n-gram and (n-1)-gram document
    frequencies) collected to the driver — the gram vocabulary is
    corpus-bounded (e.g. |alphabet|^n worst case), not row-bounded.
    query: pure driver arithmetic, microseconds per pattern.
    """

    def __init__(
        self, df: DataFrame, column: str, n: int = 3, max_grams: int | None = None
    ):
        """``max_grams``: cap EACH driver-side frequency table to its
        ``max_grams`` most frequent grams (ties -> lexicographically first).
        The |alphabet|^n vocabulary bound is fine for ASCII but unbounded-ish
        for CJK corpora at 100 TB; the cap makes the collect O(max_grams)
        regardless of alphabet. Dropped (tail) grams estimate as frequency
        0 — a PESSIMISTIC bias: capped estimates only ever go DOWN, since
        every chain term is monotone in the gram counts kept, so the cap
        trades rare-pattern recall for bounded driver memory (the kept head
        covers the mass that matters; error bound exercised in tests)."""
        assert n >= 2
        self.n = n
        self.rows = df.count()
        self.column = column
        self.max_grams = max_grams
        self._df = df

        # ONE pass builds both tables: n-grams and (n-1)-grams can't collide
        # (different lengths), so they share the explode + groupBy and are
        # split driver-side by length — halves the scans over the corpus
        both = F.array_distinct(
            F.concat(
                char_ngrams_expr(F.col(column), n),
                char_ngrams_expr(F.col(column), n - 1),
            )
        )
        counted = (
            df.select(F.explode(both).alias("g"))
            .groupBy("g")
            .agg(F.count("*").alias("c"))
        )
        if max_grams is not None:
            # top-k per gram LENGTH (the two tables cap independently):
            # one window over the vocabulary-bounded aggregate, never rows
            from pyspark.sql import Window

            w = Window.partitionBy(F.length("g")).orderBy(
                F.col("c").desc(), F.col("g").asc()
            )
            counted = counted.withColumn("__rk", F.row_number().over(w)).filter(
                F.col("__rk") <= max_grams
            )
        grams = counted.collect()
        self.freq_n = {r["g"]: int(r["c"]) for r in grams if len(r["g"]) == n}
        self.freq_n1 = {r["g"]: int(r["c"]) for r in grams if len(r["g"]) == n - 1}

    def selectivity(self, s: str) -> float:
        """Chain estimate of P(row contains s); fixed multiplication order."""
        n, N = self.n, max(1, self.rows)
        if len(s) < n - 1:
            # too short for statistics: every 1..(n-2)-char pattern is
            # conservatively assumed present (selectivity 1)
            return 1.0
        if len(s) == n - 1:
            return min(1.0, self.freq_n1.get(s, 0) / N)
        grams = [s[i : i + n] for i in range(len(s) - n + 1)]
        sel = self.freq_n.get(grams[0], 0) / N
        for g in grams[1:]:
            denom = self.freq_n1.get(g[: n - 1], 0)
            sel = sel * (self.freq_n.get(g, 0) / denom) if denom else 0.0
        return max(0.0, min(1.0, sel))

    def query(self, s: str) -> float:
        """Estimated COUNT(*) of rows whose column contains ``s``."""
        return self.selectivity(s) * self.rows

    # ----------------------------------------------------- anchored LIKE
    # 's%' / '%s' need POSITION-anchored gram statistics: the fraction of
    # rows whose value STARTS (ends) with the gram, not merely contains
    # it. Two more bounded aggregations, fit lazily on first use.
    def _fit_anchored(self):
        if hasattr(self, "freq_prefix"):
            return
        col, n = self.column, self.n
        df = self._df

        def anchored(k: int, prefix: bool) -> dict:
            g = (
                F.substring(F.col(col), 1, k)
                if prefix
                else F.substring(F.col(col), -k, k)
            )
            t = (
                df.filter(F.length(col) >= k)
                .select(g.alias("g"))
                .groupBy("g")
                .agg(F.count("*").alias("c"))
            )
            if self.max_grams is not None:
                # same driver-memory cap as the substring tables: each
                # anchored table holds a single gram length, so the cap is
                # one TakeOrdered (top-k by frequency, ties lexicographic)
                # — without this the wide-alphabet case max_grams exists
                # for still collected unbounded prefix/suffix vocabularies
                t = t.orderBy(F.col("c").desc(), F.col("g").asc()).limit(
                    self.max_grams
                )
            return {r["g"]: int(r["c"]) for r in t.collect()}

        self.freq_prefix = anchored(n, True)
        self.freq_prefix1 = anchored(n - 1, True)
        self.freq_suffix = anchored(n, False)
        self.freq_suffix1 = anchored(n - 1, False)

    def selectivity_anchored(self, s: str, anchor: str) -> float:
        """``anchor='prefix'`` estimates LIKE 's%'; ``'suffix'`` LIKE '%s'.
        First (last) gram uses the anchored frequency; the chain
        continuation is the same Markov tail as the substring case."""
        assert anchor in ("prefix", "suffix")
        self._fit_anchored()
        n, N = self.n, max(1, self.rows)
        if len(s) < n - 1:
            return 1.0
        f_anch = self.freq_prefix if anchor == "prefix" else self.freq_suffix
        f_anch1 = self.freq_prefix1 if anchor == "prefix" else self.freq_suffix1
        if len(s) == n - 1:
            return min(1.0, f_anch1.get(s, 0) / N)
        grams = [s[i : i + n] for i in range(len(s) - n + 1)]
        if anchor == "prefix":
            sel = f_anch.get(grams[0], 0) / N
            tail = grams[1:]
        else:
            sel = f_anch.get(grams[-1], 0) / N
            tail = grams[:-1][::-1]
        for g in tail:
            if anchor == "prefix":
                denom = self.freq_n1.get(g[: n - 1], 0)
            else:
                denom = self.freq_n1.get(g[1:], 0)
            sel = sel * (self.freq_n.get(g, 0) / denom) if denom else 0.0
        return max(0.0, min(1.0, sel))

    def query_anchored(self, s: str, anchor: str) -> float:
        return self.selectivity_anchored(s, anchor) * self.rows
