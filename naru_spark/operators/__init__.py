"""Relational operators beyond Spark's built-in surface: as-of join, range
(interval) join, semi/anti wrappers, rollup/cube/pivot, hypertable-style
continuous aggregates, and distinct-count sketches.

The reference implements no joins, set operations, or grouping sets at all
(SURVEY.md §2 "Relational-operator coverage note" — estimators.py:41-53 is
single-table conjunctions); these are north-star platform operators. All are
pure DataFrame compositions — no Python UDFs.
"""

from naru_spark.operators.joins import (
    anti_join,
    asof_join,
    range_join_broadcast,
    range_join_bucketed,
    semi_join,
)
from naru_spark.operators.rollup import (
    approx_distinct_counts,
    continuous_aggregate,
    cube_agg,
    distinct_counts,
    pivot_counts,
    rollup_agg,
    rollup_aggregate,
)

__all__ = [
    "anti_join",
    "approx_distinct_counts",
    "asof_join",
    "continuous_aggregate",
    "cube_agg",
    "distinct_counts",
    "pivot_counts",
    "range_join_broadcast",
    "range_join_bucketed",
    "rollup_agg",
    "rollup_aggregate",
    "semi_join",
]
