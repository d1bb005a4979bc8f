"""Grouping-sets operators (rollup / cube / pivot), hypertable-style
continuous aggregates, and distinct-count sketches.

All single-shuffle DataFrame aggregations. The continuous-aggregate pair is
the 100 TB lever: ``continuous_aggregate`` materializes fine-grained partials
once, ``rollup_aggregate`` re-aggregates the PARTIALS to any coarser grain —
sums add, counts add, avg = sum/n at read time — so coarse rollups never
touch raw rows again (the TimescaleDB continuous-aggregate / OLAP-cube
pattern)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def rollup_agg(
    df: DataFrame, group_cols: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """GROUP BY ROLLUP: hierarchical subtotals (detail → per-prefix →
    grand total), each grouping set tagged by ``grouping_id()`` in ``gid``."""
    return df.rollup(*group_cols).agg(
        F.grouping_id().cast("int").alias("gid"), *aggs
    )


def cube_agg(
    df: DataFrame, group_cols: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """GROUP BY CUBE: every subset of ``group_cols``, tagged by ``gid``."""
    return df.cube(*group_cols).agg(F.grouping_id().cast("int").alias("gid"), *aggs)


def pivot_counts(
    df: DataFrame, key_col: str, pivot_col: str, values: Sequence[str]
) -> DataFrame:
    """Per-key counts pivoted to one column per ``values`` entry.

    ``values`` is explicit (scale: skips the extra distinct-scan Spark runs
    when the pivot domain is not supplied); missing combinations become 0."""
    out = df.groupBy(key_col).pivot(pivot_col, list(values)).count()
    return out.fillna(0, subset=list(values))


def continuous_aggregate(
    events: DataFrame,
    ts_col: str = "ts",
    bucket: str = "hour",
    keys: Sequence[str] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Fine-grained additive partials: (time-bucket, keys) → count + sum."""
    return events.groupBy(
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket"), *keys
    ).agg(F.count("*").alias("n"), F.sum(value_col).alias("sum_value"))


def rollup_aggregate(
    partials: DataFrame,
    bucket: str = "day",
    keys: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Coarsen partials from :func:`continuous_aggregate` WITHOUT re-reading
    raw rows — input size is |buckets × keys|, not |events|."""
    return partials.groupBy(
        F.date_trunc(bucket, F.col("bucket")).alias("bucket"), *keys
    ).agg(F.sum("n").alias("n"), F.sum("sum_value").alias("sum_value"))


def distinct_counts(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Exact COUNT(DISTINCT c) per column, one pass (Catalyst expands to
    grouped partial aggregates under one job)."""
    return df.agg(*[F.countDistinct(c).alias(f"d_{c}") for c in cols])


def approx_distinct_counts(
    df: DataFrame, cols: Sequence[str], rsd: float = 0.02
) -> DataFrame:
    """HyperLogLog++ COUNT(DISTINCT) per column. Constant memory per column
    regardless of cardinality — THE distinct-count at 100 TB; the exact
    variant shuffles every distinct value. Relative error ``rsd`` (default
    2%); tolerance asserted in tests/test_operators.py."""
    return df.agg(*[F.approx_count_distinct(c, rsd).alias(f"d_{c}") for c in cols])
