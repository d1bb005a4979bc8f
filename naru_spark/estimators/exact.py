"""Exact and cheap estimators — pure Spark DataFrame jobs.

Reference (/root/reference/estimators.py):
- ``Oracle``        (505-536): exact conjunctive COUNT(*).
- ``Heuristic``     (480-502): independence assumption — product of
  per-column selectivities x cardinality.
- ``Sampling``      (584-616): uniform p% materialized sample; matching
  fraction x cardinality.
- ``QueryRegionSize`` (539-564): product of per-column #matching distinct
  values (bin-space hyper-rectangle volume).
- ``Const``         (567-581): constant baseline.

Scale design: the single-query path is a filter+count (Catalyst pushes every
conjunct into the parquet scan). The *batch* path answers N queries in ONE
scan via conditional aggregation::

    df.agg(sum(when(pred_0, 1)), sum(when(pred_1, 1)), ...)

so a 2000-query workload costs one pass over the table instead of 2000 jobs —
the difference between hours and minutes at 100 TB. Aggregates are chunked to
keep codegen happy.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from naru_spark.estimators.base import CardEst
from naru_spark.meta import TableMeta
from naru_spark.predicates import Query, spark_predicate

# Conditional aggregates per job; beyond this whole-stage codegen and the
# constant pool start to degrade (measured: 240 aggs in one job is ~5x
# slower than 4x60 run concurrently).
BATCH_CHUNK = 64


def _conditional_counts(df: DataFrame, queries: list[Query], chunk: int = BATCH_CHUNK) -> list[int]:
    """N exact counts in ceil(N/chunk) scans via sum(when(pred,1)).

    Chunks run from concurrent driver threads: expression analysis/codegen
    cost grows superlinearly with aggregate count, so several modest scans
    scheduled in parallel beat one giant one.
    """
    from concurrent.futures import ThreadPoolExecutor

    chunks = [queries[lo : lo + chunk] for lo in range(0, len(queries), chunk)]

    def run(batch: list[Query]) -> list[int]:
        # each aggregate rendered as ONE F.expr string (same Catalyst
        # expression as the old coalesce/sum/when Column build, ~5x fewer
        # py4j round-trips per aggregate — see spark_predicate)
        from naru_spark.predicates import spark_where

        aggs = [
            F.expr(
                f"coalesce(sum(case when ({spark_where(q)}) then 1 end), 0)"
            ).alias(f"q{i}")
            for i, q in enumerate(batch)
        ]
        row = df.agg(*aggs).collect()[0]
        return [int(row[f"q{i}"]) for i in range(len(batch))]

    if len(chunks) == 1:
        return run(chunks[0])
    out: list[int] = []
    with ThreadPoolExecutor(max_workers=min(4, len(chunks))) as ex:
        for res in ex.map(run, chunks):
            out.extend(res)
    return out


class Oracle(CardEst):
    """Exact count (estimators.py:505-536)."""

    name = "oracle"
    # query_batch is ONE amortized conditional-aggregation scan — its ms/q
    # is not a per-query latency (reports carry this flag)
    batch_scan = True

    def __init__(self, df: DataFrame, limit_first_n: int | None = None, order_col: str | None = None):
        super().__init__()
        # limit_first_n supports the reference's data-shift experiments
        # (estimators.py:514-521); needs a stable order to be meaningful.
        if limit_first_n is not None:
            if order_col is not None:
                df = df.orderBy(order_col).limit(limit_first_n)
            else:
                df = df.limit(limit_first_n)
        self.df = df

    def query(self, q: Query) -> int:
        return self.df.filter(spark_predicate(q)).count()

    def query_batch(self, queries: list[Query]) -> list[int]:
        return _conditional_counts(self.df, queries)


class Heuristic(CardEst):
    """Independence-assumption estimate (estimators.py:480-502).

    Per-column selectivity = exact matching count / cardinality, all columns
    of all queries measured in one conditional-aggregation scan; product on
    the driver. Multiplication order is the query's column order, so results
    are bit-deterministic.
    """

    name = "heuristic"
    batch_scan = True  # amortized single-scan query_batch (see Oracle)

    def __init__(self, df: DataFrame, meta: TableMeta):
        super().__init__()
        self.df = df
        self.cardinality = meta.cardinality

    def query(self, q: Query) -> float:
        return self.query_batch([q])[0]

    def query_batch(self, queries: list[Query]) -> list[float]:
        # DisjunctiveQuery support: inclusion-exclusion expansion
        # (predicates.ie_terms) — every term is conjunctive, so the
        # per-column singles of ALL terms of ALL queries still ride ONE
        # conditional-aggregation scan; a conjunctive query expands to
        # itself with coefficient 1. Same-column '='/'in' constraints
        # inside a merged term INTERSECT first (normalize_conjunct):
        # contradictory equalities from OR branches sharing a column
        # (c='A' AND c='N') make the term exactly 0 — an independence
        # product over the raw repeated predicates would subtract a
        # spurious nonzero intersection and bias disjunctive estimates
        # downward.
        from naru_spark.predicates import ie_terms, normalize_conjunct

        terms = [
            [(coef, normalize_conjunct(t)) for coef, t in ie_terms(q)]
            for q in queries
        ]
        # Dedupe identical single-column predicates before the scan: the
        # seeded workloads repeat (col, op, val) constraints heavily
        # (measured: 222 singles -> 152 unique on the 30-query report
        # workload, 1984 -> 1004 on the 250-query paper slice), and each
        # duplicate costs a conditional aggregate — expression analysis,
        # codegen constant-pool pressure, and extra chunked scans (guide
        # §1.2: don't compute things twice). Counts are exact per
        # predicate, so reading a shared count per occurrence is
        # bit-identical to the undeduped scan; the per-query
        # multiplication order below is unchanged.
        from naru_spark.predicates import spark_where

        uniq_idx: dict = {}
        uniq_singles: list[Query] = []
        occ_idx: list[int] = []
        for qterms in terms:
            for _, t in qterms:
                if t is None:
                    continue
                for c, op, v in zip(t.cols, t.ops, t.vals):
                    s = Query(t.table, [c], [op], [v])
                    # key on the RENDERED predicate — the exact string the
                    # aggregate is built from, so key-equal implies
                    # count-equal by construction
                    key = (t.table, spark_where(s))
                    k_u = uniq_idx.get(key)
                    if k_u is None:
                        k_u = uniq_idx[key] = len(uniq_singles)
                        uniq_singles.append(s)
                    occ_idx.append(k_u)
        uniq_counts = _conditional_counts(self.df, uniq_singles)
        counts = [uniq_counts[i] for i in occ_idx]
        out, k = [], 0
        for qterms in terms:
            total = 0.0
            for coef, t in qterms:
                if t is None:  # unsatisfiable merged term: exact 0
                    continue
                sel = 1.0
                for _ in t.cols:
                    sel *= counts[k] / self.cardinality
                    k += 1
                total += coef * sel
            out.append(math.ceil(min(max(total, 0.0), 1.0) * self.cardinality))
        return out


class Sampling(CardEst):
    """Uniform-sample estimator (estimators.py:584-616).

    The sample is materialized once (``.cache()``) — the reference's
    ``table.data.sample(n)`` analog; estimates divide by the *actual*
    sample size as the reference does (estimators.py:592-607).
    """

    name = "sampling"
    batch_scan = True  # amortized single-scan query_batch (see Oracle)

    def __init__(self, df: DataFrame, meta: TableMeta, p: float = 0.0013, seed: int = 42):
        super().__init__()
        self.cardinality = meta.cardinality
        self.sample_df = df.sample(fraction=min(1.0, p), seed=seed).cache()
        self.num_samples = self.sample_df.count()
        self.name = f"sampling_{self.num_samples}"

    def query(self, q: Query) -> float:
        matched = self.sample_df.filter(spark_predicate(q)).count()
        return self._scale(matched)

    def query_batch(self, queries: list[Query]) -> list[float]:
        return [self._scale(m) for m in _conditional_counts(self.sample_df, queries)]

    def _scale(self, matched: int) -> float:
        if self.num_samples == 0:
            return 0.0
        # no floor: zero matching sample rows estimates 0, as the reference
        # does (estimators.py:608-616) — q-error's zero-handling (est==0 ->
        # q = true_card) owns that tail, not the estimator
        return matched / self.num_samples * self.cardinality


class QueryRegionSize(CardEst):
    """Volume of the query hyper-rectangle in bin space
    (estimators.py:539-564): product over columns of #matching distinct
    values; wildcard columns contribute full domain (count_wild=True) or 1.

    Uses the broadcast dictionaries — no Spark job at query time.
    """

    name = "region_size"

    def __init__(self, meta: TableMeta, count_wildcards: bool = True):
        super().__init__()
        self.meta = meta
        self.count_wildcards = count_wildcards

    def query(self, q: Query) -> float:
        # disjunctions by inclusion-exclusion — EXACT for volumes (the
        # measure of a union of hyper-rectangles); conjunctive input is its
        # own single term. The union-measure argument requires
        # count_wildcards=True: every branch volume must be measured over
        # the SAME full bin space (unqueried columns contribute their
        # domain size). With count_wildcards=False, branches over different
        # column subsets are in incompatible units (unqueried columns
        # contribute 1), so the signed sum is not a union measure — fail
        # loudly rather than return a meaningless number.
        from naru_spark.predicates import ie_terms

        terms = ie_terms(q)
        if len(terms) > 1 and not self.count_wildcards:
            raise ValueError(
                "QueryRegionSize: disjunctive inclusion-exclusion requires "
                "count_wildcards=True (branch volumes over different column "
                "subsets are unit-incompatible when unqueried columns "
                "contribute 1)"
            )
        total = sum(coef * self._volume(t) for coef, t in terms)
        return max(total, 0.0)

    def _volume(self, q: Query) -> float:
        # repeated columns INTERSECT their bin masks (IE's merged AND terms
        # repeat columns; independent products would over-count)
        per_col: dict[str, object] = {}
        for c, op, v in zip(q.cols, q.ops, q.vals):
            m = self.meta.dictionaries[c].valid_bins_mask(op, v)
            per_col[c] = m if c not in per_col else (per_col[c] & m)
        total = 1.0
        for cm in self.meta.columns:
            if cm.name not in per_col:
                total *= cm.distribution_size if self.count_wildcards else 1
            else:
                total *= int(per_col[cm.name].sum())
        return total


class Const(CardEst):
    """Constant baseline (estimators.py:567-581)."""

    name = "const"

    def __init__(self, const: float = 1.0):
        super().__init__()
        self.const = const

    def query(self, q: Query) -> float:
        return self.const
