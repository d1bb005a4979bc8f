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
