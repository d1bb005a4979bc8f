"""Join operators Spark lacks natively: as-of join and range (interval)
join, plus named semi/anti wrappers.

Scale notes (the whole point of each implementation):

- ``asof_join``: ONE hash shuffle of the unioned inputs on the key, then a
  per-key window sort — no range cross-product, no join explosion. This is
  the standard big-big as-of strategy (cf. pandas ``merge_asof``, kdb ``aj``);
  a naive ``left.ts >= right.ts`` join would be O(|L|·|R|) per key.
- ``range_join_broadcast``: small interval dim → broadcast nested-loop join,
  zero shuffle of the fact side.
- ``range_join_bucketed``: big-big interval join → discretize both sides to
  fixed-width buckets so Catalyst gets an EQUI key (normal shuffled hash
  join) and the non-equi predicate becomes a cheap residual filter. Interval
  duplication factor = interval length / bucket width, chosen by the caller.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    right_order: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward inclusive as-of LEFT join.

    For each left row, attach ``right_cols`` of the single right row with the
    largest ``right_ts`` <= ``left_ts`` within the same ``on`` key; left rows
    with no prior right row keep NULLs. ``right_order`` breaks ties between
    right rows sharing (key, ts) — the largest wins, deterministically.

    Implementation: tag and union both sides, sort within each key by
    (ts, side) — right rows sort before left rows at equal ts, which is what
    makes the join inclusive — and carry the right row's values forward with
    ``last(ignorenulls)`` over an unbounded-preceding window. The right values
    ride in ONE struct so they always come from the same right row even when
    some are NULL.
    """
    on = [on] if isinstance(on, str) else list(on)
    r_sel = [
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__rv"),
    ]
    helper = ["__ts", "__side", "__rv"]
    if right_order is not None:
        r_sel.append(F.col(right_order).alias("__tb"))
        helper.append("__tb")
    r = right.select(*r_sel)
    l = left.select("*", F.col(left_ts).alias("__ts"), F.lit(1).alias("__side"))
    u = l.unionByName(r, allowMissingColumns=True)

    order = [F.col("__ts").asc(), F.col("__side").asc()]
    if right_order is not None:
        order.append(F.col("__tb").asc_nulls_first())
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__last", F.last("__rv", ignorenulls=True).over(w))
    out = u.filter(F.col("__side") == 1)
    for c in right_cols:
        out = out.withColumn(prefix + c, F.col("__last").getField(c))
    return out.drop("__last", *helper)


def range_join_broadcast(
    facts: DataFrame,
    intervals: DataFrame,
    fact_col: str,
    start_col: str,
    end_col: str,
    how: str = "inner",
) -> DataFrame:
    """Join facts to a SMALL interval table on start <= fact < end.

    The interval side is broadcast, so the plan is a BroadcastNestedLoopJoin
    with zero shuffle of the fact side — the right physical strategy whenever
    the intervals fit in executor memory."""
    cond = (facts[fact_col] >= intervals[start_col]) & (
        facts[fact_col] < intervals[end_col]
    )
    return facts.join(F.broadcast(intervals), cond, how)


def range_join_bucketed(
    facts: DataFrame,
    intervals: DataFrame,
    fact_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Join facts to a BIG interval table on start <= fact < end.

    Both sides are discretized to ``bucket_seconds``-wide buckets: each fact
    maps to one bucket, each interval explodes to every bucket it covers.
    The join is then a plain shuffled EQUI join on the bucket id with the
    exact range predicate as a residual filter — no nested-loop
    cross-product, and AQE can still split skewed buckets."""

    def bucket(c: str):
        # cast("timestamp") first: TIMESTAMP_NTZ cannot cast to BIGINT
        # directly, but NTZ->TIMESTAMP->BIGINT is legal and (with the
        # session pinned UTC) value-preserving. A no-op for columns that
        # are already TIMESTAMP or numeric epoch seconds.
        col = F.col(c)
        return F.floor(col.cast("timestamp").cast("long") / F.lit(bucket_seconds))

    fb = facts.withColumn("__bucket", bucket(fact_col))
    ib = intervals.withColumn(
        "__bucket", F.explode(F.sequence(bucket(start_col), bucket(end_col)))
    )
    return (
        fb.join(ib, "__bucket")
        .filter(
            (F.col(fact_col) >= F.col(start_col)) & (F.col(fact_col) < F.col(end_col))
        )
        .drop("__bucket")
    )


def semi_join(left: DataFrame, right: DataFrame, cond) -> DataFrame:
    """EXISTS: left rows with at least one right match (no right columns,
    no duplication — Spark stops probing at the first hit)."""
    return left.join(right, cond, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, cond) -> DataFrame:
    """NOT EXISTS: left rows with no right match."""
    return left.join(right, cond, "left_anti")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salts: int = 8,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Explicit skew-salted equi-join: the MANUAL skew lever for the cases
    AQE's runtime split cannot reach — stream-stream / stream-static joins
    (no runtime re-plan), and engines/stages where map-output granularity
    blocks a split (see aqe_skew_join's single-mapper note).

    The big side gets a DETERMINISTIC salt in [0, salts) hashed from
    ``salt_cols`` (default: every non-key column — xxhash64, so the same
    row always lands in the same subpartition and results are
    repartition-invariant, unlike a rand() salt); the small side is
    replicated ``salts`` times via one row-local ``explode(sequence)``.
    Joining on (key, salt) spreads each hot key over ``salts`` shuffle
    partitions at the cost of a ``salts``-times-larger small side — the
    standard trade, sized by the caller. Inner equi-join semantics are
    IDENTICAL to ``big.join(small, key)``; only the partitioning changes.

    Columns named __salt are reserved."""
    other = salt_cols or [c for c in big.columns if c != key]
    if not other:
        raise ValueError("salted_join needs at least one non-key column to hash")
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in other]), F.lit(salts))
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    return salted_big.join(salted_small, [key, "__salt"]).drop("__salt")
