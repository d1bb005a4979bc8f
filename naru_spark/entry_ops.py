"""Driver-gate entries for the relational operator extensions (as-of join,
range join, semi/anti, set ops, rollup/cube/pivot, hypertable rollup,
distinct sketches, JSON extraction).

Same determinism rules as entry_queries.py: integer counts exact; double
sums rounded identically on both sides; the approx-distinct entry is
rows-only (HLL internals are engine-specific) and tolerance-gated in
tests/test_operators.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

# Fixed maintenance windows for the range-join entry; every testdata SF has
# events across all of 2024-01, so each window is non-empty at every SF.
RANGE_WINDOWS = [
    (0, "2024-01-02 00:00:00", "2024-01-02 06:00:00"),
    (1, "2024-01-05 12:00:00", "2024-01-06 00:00:00"),
    (2, "2024-01-10 00:00:00", "2024-01-11 00:00:00"),
    (3, "2024-01-15 18:00:00", "2024-01-15 21:30:00"),
    (4, "2024-01-20 00:00:00", "2024-01-27 00:00:00"),
]

DISTINCT_COLS = ["l_returnflag", "l_linestatus", "l_quantity", "l_shipdate", "l_orderkey"]


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from naru_spark.sources import load_table

    return load_table(spark, name, sf_dir)


# ------------------------------------------------------------- as-of join
def q_asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase event joined to the user's most recent prior-or-equal
    view event (single-shuffle union-window as-of join)."""
    from naru_spark.operators import asof_join

    ev = _load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view")
    out = asof_join(
        purchases,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts", "value"],
        right_order="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_ts").alias("view_ts"),
        F.col("asof_value").alias("view_value"),
    )


def sql_asof_purchase_view() -> str:
    # DuckDB native ASOF join; safe because (user_id, ts) is unique within
    # the view stream at every SF (no tie ambiguity).
    return """
SELECT l.event_id, l.user_id, l.ts, r.ts AS view_ts, r.value AS view_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


# ------------------------------------------------------------- range join
def q_range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events aggregated per maintenance window via the bucketed big-big
    range join (equi-join on hour buckets + residual range filter)."""
    from naru_spark.operators import range_join_bucketed

    ev = _load(spark, sf_dir, "events")
    intervals = spark.createDataFrame(
        RANGE_WINDOWS, "window_id int, start string, end string"
    ).select(
        "window_id",
        F.to_timestamp("start").alias("start"),
        F.to_timestamp("end").alias("end"),
    )
    joined = range_join_bucketed(ev, intervals, "ts", "start", "end")
    return joined.groupBy("window_id").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value")
    )


def sql_range_join_windows() -> str:
    rows = " UNION ALL ".join(
        f"SELECT {i} AS window_id, TIMESTAMP '{s}' AS st, TIMESTAMP '{e}' AS en"
        for i, s, e in RANGE_WINDOWS
    )
    return f"""
SELECT window_id, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
FROM events JOIN ({rows}) w ON ts >= w.st AND ts < w.en
GROUP BY window_id
"""


# -------------------------------------------------------------- semi/anti
def q_semi_join_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one URGENT order, counted per segment."""
    from naru_spark.operators import semi_join

    cust = _load(spark, sf_dir, "customer")
    urgent = _load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        semi_join(cust, urgent, cust.c_custkey == urgent.o_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


def sql_semi_join_urgent() -> str:
    return """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


def q_anti_join_no_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with NO urgent order, counted per segment."""
    from naru_spark.operators import anti_join

    cust = _load(spark, sf_dir, "customer")
    urgent = _load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        anti_join(cust, urgent, cust.c_custkey == urgent.o_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


def sql_anti_join_no_urgent() -> str:
    return """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------- set ops
def q_set_ops_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT of the URGENT-buyer and HIGH-buyer
    custkey sets, tagged by operation."""
    orders = _load(spark, sf_dir, "orders")

    def buyers(prio: str) -> DataFrame:
        return (
            orders.filter(F.col("o_orderpriority") == prio)
            .select("o_custkey")
            .distinct()
        )

    urgent, high = buyers("1-URGENT"), buyers("2-HIGH")
    return (
        urgent.union(high).distinct().select(F.lit("union").alias("op"), "o_custkey")
        .unionAll(
            urgent.intersect(high).select(F.lit("intersect").alias("op"), "o_custkey")
        )
        .unionAll(
            urgent.subtract(high).select(F.lit("except").alias("op"), "o_custkey")
        )
    )


def sql_set_ops_buyers() -> str:
    u = "SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'"
    h = "SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'"
    return f"""
SELECT 'union' AS op, o_custkey FROM ({u} UNION {h})
UNION ALL
SELECT 'intersect' AS op, o_custkey FROM ({u} INTERSECT {h})
UNION ALL
SELECT 'except' AS op, o_custkey FROM ({u} EXCEPT {h})
"""


# ----------------------------------------------------------- rollup / cube
def _pricing_aggs():
    return [
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    ]


def q_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from naru_spark.operators import rollup_agg

    df = _load(spark, sf_dir, "lineitem")
    return rollup_agg(df, ["l_returnflag", "l_linestatus"], _pricing_aggs())


def sql_rollup_pricing() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
       COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def q_cube_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from naru_spark.operators import cube_agg

    df = _load(spark, sf_dir, "lineitem")
    return cube_agg(df, ["l_returnflag", "l_linestatus"], _pricing_aggs())


def sql_cube_pricing() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
       COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
"""


# ------------------------------------------------------------------ pivot
def q_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from naru_spark.operators import pivot_counts

    ev = _load(spark, sf_dir, "events")
    return pivot_counts(ev, "user_id", "event_type", EVENT_TYPES)


def sql_pivot_event_counts() -> str:
    cases = ", ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}"
        for t in EVENT_TYPES
    )
    return f"SELECT user_id, {cases} FROM events GROUP BY user_id"


# ----------------------------------------------------- hypertable rollup
def q_hypertable_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily aggregate computed FROM hourly partials (never re-reads raw
    rows); must equal the direct daily aggregate."""
    from naru_spark.operators import continuous_aggregate, rollup_aggregate

    ev = _load(spark, sf_dir, "events")
    hourly = continuous_aggregate(ev, bucket="hour")
    daily = rollup_aggregate(hourly, bucket="day")
    # avg derives from the ROUNDED sum on both sides: the raw partial sums
    # differ from a single-pass sum in their last float bits, and dividing
    # them can land exactly on a rounding boundary (seen at sf0.01).
    return daily.select(
        F.col("bucket").alias("day"),
        "event_type",
        "n",
        F.round("sum_value", 4).alias("sum_value"),
        F.round(F.round("sum_value", 4) / F.col("n"), 6).alias("avg_value"),
    )


def sql_hypertable_daily() -> str:
    return """
SELECT day, event_type, n, sum_value, ROUND(sum_value / n, 6) AS avg_value
FROM (
  SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS n,
         ROUND(SUM(value), 4) AS sum_value
  FROM events GROUP BY date_trunc('day', ts), event_type
)
"""


# ------------------------------------------------------ distinct sketches
def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from naru_spark.operators import distinct_counts

    return distinct_counts(_load(spark, sf_dir, "lineitem"), DISTINCT_COLS)


def sql_distinct_counts() -> str:
    cols = ", ".join(f"COUNT(DISTINCT {c}) AS d_{c}" for c in DISTINCT_COLS)
    return f"SELECT {cols} FROM lineitem"


def q_approx_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only gate: HLL++ sketch values are engine-specific; the <= 3*rsd
    relative-error bound vs exact is asserted in tests/test_operators.py."""
    from naru_spark.operators import approx_distinct_counts

    return approx_distinct_counts(
        _load(spark, sf_dir, "lineitem"), DISTINCT_COLS, rsd=0.02
    )


# ------------------------------------------------------- JSON extraction
def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the JSON ``props`` column (semi-structured
    source coverage), aggregated per event type."""
    ev = _load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.count(k).alias("n_with_k"),
    )


def sql_events_json_props() -> str:
    return """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------- registry
def build_ops_registry():
    queries = {
        "asof_purchase_view": q_asof_purchase_view,
        "range_join_windows": q_range_join_windows,
        "semi_join_urgent": q_semi_join_urgent,
        "anti_join_no_urgent": q_anti_join_no_urgent,
        "set_ops_buyers": q_set_ops_buyers,
        "rollup_pricing": q_rollup_pricing,
        "cube_pricing": q_cube_pricing,
        "pivot_event_counts": q_pivot_event_counts,
        "hypertable_daily": q_hypertable_daily,
        "distinct_counts": q_distinct_counts,
        "approx_distinct_counts": q_approx_distinct_counts,
        "events_json_props": q_events_json_props,
    }
    oracles = {
        "asof_purchase_view": sql_asof_purchase_view(),
        "range_join_windows": sql_range_join_windows(),
        "semi_join_urgent": sql_semi_join_urgent(),
        "anti_join_no_urgent": sql_anti_join_no_urgent(),
        "set_ops_buyers": sql_set_ops_buyers(),
        "rollup_pricing": sql_rollup_pricing(),
        "cube_pricing": sql_cube_pricing(),
        "pivot_event_counts": sql_pivot_event_counts(),
        "hypertable_daily": sql_hypertable_daily(),
        "distinct_counts": sql_distinct_counts(),
        "events_json_props": sql_events_json_props(),
        # approx_distinct_counts: rows-only (HLL sketch internals)
    }
    return queries, oracles
