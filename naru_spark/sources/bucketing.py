"""Bucketing & skew-salting utilities — the two shuffle levers the engine
relies on at 100 TB.

- ``write_bucketed`` / ``read_bucketed``: persist a table hash-bucketed (and
  sorted) by its join key. Two tables bucketed the same way join with NO
  exchange on either side — the shuffle is paid once at write time and
  amortized over every subsequent join (asserted in
  tests/test_plans.py::test_bucketed_join_no_shuffle).
- ``salted_group_counts``: groupBy over a skewed key. A hot key that would
  pin one reducer is split across ``salt`` sub-keys (map-side random salt),
  partially aggregated, then re-combined — two small shuffles instead of one
  skewed one. AQE's skew handling covers joins; this covers aggregations,
  where AQE does not split a single hot reduce key.

The reference has no multi-table surface (SURVEY §2 note), so these back the
beyond-reference relational/pipeline operators (joins, dedup self-joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a managed parquet table hash-bucketed by
    ``bucket_col``. Sorting within buckets additionally removes the sort
    step of a sort-merge join."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def salted_group_counts(
    df: DataFrame, key: str, salt: int = 16, count_col: str = "cnt"
) -> DataFrame:
    """groupBy(key).count() resilient to a skewed key distribution.

    Stage 1 shuffles on (key, random salt in [0, salt)) — a hot key spreads
    over ``salt`` reducers; stage 2 combines the ``salt`` partials per key.
    Stage 2's shuffle is at most |distinct keys| x salt rows, independent of
    row count. Deterministic output (counts are associative)."""
    salted = df.withColumn("__salt", (F.rand(seed=0) * salt).cast("int"))
    partial = salted.groupBy(key, "__salt").agg(F.count("*").alias(count_col))
    return partial.groupBy(key).agg(F.sum(count_col).alias(count_col))
