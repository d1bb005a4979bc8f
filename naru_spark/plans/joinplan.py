"""Cardinality-advised join planning: estimator output driving physical
join strategy and join order.

The reference surfaces its estimates to a DBMS only through the Postgres
baseline (estimators.py:619-677 reads the optimizer's row estimates back
OUT of EXPLAIN). Spark's CBO is likewise not pluggable from Python, so the
integration point here is one level up, where a query author (or query
rewriter) actually holds the controls Catalyst exposes:

- broadcast vs shuffle: an estimated post-filter row count below the
  threshold marks the dimension with ``F.broadcast`` — the decision the
  autoBroadcastJoinThreshold heuristic gets wrong whenever a filter is
  selective but the TABLE is big (static size-on-disk says shuffle, the
  estimate says broadcast).
- join order: dimensions join most-selective-first, shrinking every
  intermediate result in the chain (classic greedy left-deep ordering).

Any CardEst works as the estimate source (ProgressiveSampling for the
learned behavior, Oracle for exact); plug it through ``card_fn``.

At 100 TB this is exactly the lever that matters: a wrongly-shuffled
10 MB filtered dim costs a full fact-table shuffle (TBs over the wire);
a wrongly-broadcast 100 GB dim OOMs every executor.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

from pyspark.sql import DataFrame, functions as F


@dataclass
class JoinDecision:
    name: str
    est_rows: float
    strategy: str  # 'broadcast' | 'shuffle'
    position: int  # 0 = joined first (most selective)


def advised_join(
    fact: DataFrame,
    dims: Sequence[tuple[str, DataFrame, str | list[str]]],
    card_fn: Callable[[str, DataFrame], float],
    broadcast_rows: int = 1_000_000,
) -> tuple[DataFrame, list[JoinDecision]]:
    """Join ``fact`` against each (name, df, on) in ``dims``, with the
    estimator choosing broadcast-vs-shuffle per dimension and the greedy
    most-selective-first join order. Returns (joined_df, decisions).

    ``card_fn(name, df) -> float`` estimates the dimension's post-filter
    row count (CardinalityAdvisor.estimate, an Oracle count, or table
    stats)."""
    est = sorted(
        ((name, df, on, float(card_fn(name, df))) for name, df, on in dims),
        key=lambda t: t[3],
    )
    out = fact
    decisions = []
    for pos, (name, df, on, rows) in enumerate(est):
        if rows <= broadcast_rows:
            df, strategy = F.broadcast(df), "broadcast"
        else:
            # pin sort-merge: an over-threshold ESTIMATE must defeat the
            # size-on-disk autoBroadcast heuristic (broadcasting a dim that
            # only LOOKS small pre-filter OOMs executors at scale)
            df, strategy = df.hint("merge"), "shuffle"
        out = out.join(df, on, "inner")
        decisions.append(JoinDecision(name, rows, strategy, pos))
    return out, decisions


def advised_side(
    df: DataFrame,
    est_rows: float,
    name: str = "side",
    broadcast_rows: int = 1_000_000,
) -> tuple[DataFrame, JoinDecision]:
    """Single-dimension strategy pick — the same estimate-driven
    broadcast-vs-sort-merge decision ``advised_join`` makes per dimension,
    for call sites that build the join expression themselves (multi-key or
    non-equi conditions ``advised_join``'s chain can't express).
    Returns (hinted_df, decision)."""
    if float(est_rows) <= broadcast_rows:
        return F.broadcast(df), JoinDecision(name, float(est_rows), "broadcast", 0)
    return df.hint("merge"), JoinDecision(name, float(est_rows), "shuffle", 0)


def estimate_join_rows(
    left: "DataFrame",
    right: "DataFrame",
    left_key: str,
    right_key: str,
    exact_distinct: bool = True,
) -> dict:
    """System-R style equi-join cardinality estimate:

        |L JOIN R on k| ~= N_L * N_R / max(d_L, d_R)

    (containment-of-value-sets assumption — every value of the smaller
    key domain appears in the larger). This is the estimate Catalyst's CBO
    itself uses given column stats; exposed here as a side API so join
    *planning* (broadcast-vs-shuffle, ordering in ``advised_join``) can be
    driven without ANALYZE TABLE having run.

    ``exact_distinct=False`` swaps COUNT(DISTINCT) for HLL
    approx_count_distinct — at 100 TB the sketch pass is the only sane
    choice (one scan, bounded memory); exact is kept for oracle parity.
    Returns {n_left, n_right, d_left, d_right, est_rows}.
    """
    from pyspark.sql import functions as F

    dcount = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    ls = left.agg(F.count("*").alias("n"), dcount(left_key).alias("d")).collect()[0]
    rs = right.agg(F.count("*").alias("n"), dcount(right_key).alias("d")).collect()[0]
    n_l, d_l, n_r, d_r = int(ls["n"]), int(ls["d"]), int(rs["n"]), int(rs["d"])
    denom = max(d_l, d_r, 1)
    # integer-exact where possible: floor of the ratio product computed as
    # (n_l * n_r) // denom keeps the estimate engine-reproducible
    est = (n_l * n_r) // denom
    return {
        "n_left": n_l,
        "n_right": n_r,
        "d_left": d_l,
        "d_right": d_r,
        "est_rows": est,
    }
