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

from naru_spark.tmp import tmpdir as _tmpdir

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


def _await_drain(start_fn, retries: int = 1) -> None:
    """Start an availableNow drain and await it, with ONE bounded retry on
    the known-flaky Python-worker startup failure (VERDICT r15 item 4: a
    socket timeout spawning the ``naru_snapshot`` DataSource worker under
    load — observed at most once per driver sweep, and only on a
    contended box). The retry restarts from the SAME checkpoint, so
    delivery stays exactly-once for the txn-stamped snapshot sinks; every
    entry additionally asserts its own semantics and is oracle-gated, so
    a non-clean replay fails LOUDLY rather than silently. Non-matching
    errors re-raise immediately — this is transient-fault hardening, not
    error suppression."""
    import time

    for attempt in range(retries + 1):
        q = start_fn()
        try:
            q.awaitTermination()
            return
        except Exception as e:  # noqa: BLE001 — filtered + re-raised below
            msg = f"{type(e).__name__}: {e}"
            transient = (
                "timed out" in msg
                or "timeout" in msg.lower()
                or "Python worker" in msg
                or "SocketTimeout" in msg
            )
            if attempt >= retries or not transient:
                raise
            print(f"# drain retry after transient failure: {msg.splitlines()[0][:160]}")
            time.sleep(1.0)


# ---------------------------------------------------------- salted join
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit skew-salted join (operators.joins.salted_join): the manual
    lever for joins AQE's runtime split cannot reach. Same 90%-hot-key
    lineitem shape as aqe_skew_join, but the hot key is spread over 8
    deterministic hash salts at PLAN time — the small side rides one
    row-local explode, the join key becomes (key, salt), and the inline
    assert pins that the plan carries no single hot partition risk:
    partitioning is by BOTH columns. Results are provably identical to the
    unsalted join, so the plain-join SQL is an exact oracle."""
    from naru_spark.operators.joins import salted_join

    skew_key = F.when(F.col("l_orderkey") % 10 != 0, F.lit(0)).otherwise(
        F.col("l_orderkey")
    )
    big = _load(spark, sf_dir, "lineitem").select(
        skew_key.alias("k"), "l_extendedprice", "l_discount"
    )
    small = (
        big.select("k").distinct().select("k", (F.col("k") % 7).alias("grp"))
    )
    j = salted_join(big, small, "k", salts=8)
    assert "__salt" not in j.columns  # salt never leaks into the result
    out = (
        j.groupBy("grp")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * (
                        F.lit(1).cast("decimal(18,4)")
                        - F.col("l_discount").cast("decimal(18,4)")
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("grp")
    )
    # the join must hash on (k, __salt) — a single-column hash would put
    # the hot key back into one partition
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in phys, "salted join did not partition on the salt"
    return out


def sql_salted_join() -> str:
    return """
WITH l AS (
  SELECT CASE WHEN l_orderkey % 10 <> 0 THEN 0 ELSE l_orderkey END AS k,
         l_extendedprice, l_discount
  FROM lineitem
),
r AS (SELECT DISTINCT k, k % 7 AS grp FROM l)
SELECT grp,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM l JOIN r USING (k)
GROUP BY grp
ORDER BY grp
"""


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


# -------------------------------------------------------------- percentiles
def q_quantiles_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (SQL PERCENTILE_CONT semantics) of two
    lineitem measures — Spark `percentile` and DuckDB `quantile_cont` both
    use the (p*(n-1)) linear-interpolation definition."""
    df = _load(spark, sf_dir, "lineitem")
    probs = [0.25, 0.5, 0.75, 0.95]
    aggs = []
    for c in ["l_quantity", "l_extendedprice"]:
        for p in probs:
            tag = str(int(p * 100))
            aggs.append(
                F.round(F.expr(f"percentile({c}, {p})"), 4).alias(f"{c}_p{tag}")
            )
    return df.agg(*aggs)


def sql_quantiles_quantity() -> str:
    cols = ", ".join(
        f"ROUND(quantile_cont({c}, {p}), 4) AS {c}_p{int(p*100)}"
        for c in ["l_quantity", "l_extendedprice"]
        for p in [0.25, 0.5, 0.75, 0.95]
    )
    return f"SELECT {cols} FROM lineitem"


# --------------------------------------------- B1 Oracle limit_first_n path
def q_workload_oracle_limited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference Oracle's data-shift variant (estimators.py:505-536,
    `limit_first_n`): exact counts over only the first N rows in a stable
    order. Parquet scan order is not stable across engines/partitionings
    and (l_orderkey, l_linenumber) is not unique in this synthetic data, so
    the order is over ALL estimator columns: any tie at the LIMIT boundary
    is then between fully-identical rows, which are interchangeable for
    counting — the result is engine-deterministic."""
    from naru_spark.entry_queries import LINEITEM_COLS, workload
    from naru_spark.estimators import Oracle

    df = (
        _load(spark, sf_dir, "lineitem")
        .select(*LINEITEM_COLS)
        .orderBy(*[F.col(c).asc_nulls_first() for c in LINEITEM_COLS])
        .limit(20_000)
    )
    cards = Oracle(df).query_batch(list(workload()))
    return spark.createDataFrame(
        [(i, int(c)) for i, c in enumerate(cards)], "query_id int, card bigint"
    )


def sql_workload_oracle_limited() -> str:
    from naru_spark.entry_queries import LINEITEM_COLS, workload
    from naru_spark.predicates import sql_predicate

    order = ", ".join(f"{c} ASC NULLS FIRST" for c in LINEITEM_COLS)
    base = f"SELECT * FROM lineitem ORDER BY {order} LIMIT 20000"
    parts = [
        f"SELECT {i} AS query_id, (SELECT COUNT(*) FROM ({base}) WHERE {sql_predicate(q)}) AS card"
        for i, q in enumerate(workload())
    ]
    return " UNION ALL ".join(parts)


def q_cumulative_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running order total: a ROWS-frame cumulative window
    (rowsBetween(unboundedPreceding, 0)) partitioned by customer, ordered
    by (o_orderdate, o_orderkey) — the orderkey tiebreak makes the frame
    content deterministic when a customer places two orders the same day.
    Accumulates in decimal(18,4) per value so every prefix sum is exact on
    both engines. Scale: one shuffle on the partition key; each
    customer's sort is local to its partition."""
    from pyspark.sql import Window

    o = _load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w), 2)
        .cast("double")
        .alias("running_total"),
    )


def sql_cumulative_revenue() -> str:
    return """
SELECT o_custkey, o_orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                  OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate ASC, o_orderkey ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total
FROM orders
"""


def q_moving_avg_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing moving average of daily order revenue: a RANGE-frame
    window over integer day offsets (rangeBetween(-6, 0)) — a CALENDAR
    frame, so days absent from the data shrink the window instead of
    silently widening it the way a 7-ROW frame would.

    Scale: the window runs over the post-aggregation daily series (domain
    = #distinct days, ~2.4k here), not raw orders — the unpartitioned
    sort is bounded by the calendar, never by the fact-table row count."""
    from pyspark.sql import Window

    o = _load(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 4).alias("revenue")
    )
    daily = daily.withColumn("__d", F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")))
    w = Window.orderBy("__d").rangeBetween(-6, 0)
    return (
        daily.withColumn("avg_7d", F.round(F.avg("revenue").over(w), 4))
        # day as yyyy-MM-dd string: Spark DATE and DuckDB DATE stringify
        # differently through pandas (date vs midnight timestamp), which
        # would hash-mismatch despite equal values
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "revenue", "avg_7d")
    )


def sql_moving_avg_daily_revenue() -> str:
    return """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, ROUND(SUM(o_totalprice), 4) AS revenue
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
)
SELECT STRFTIME(day, '%Y-%m-%d') AS day, revenue,
       ROUND(AVG(revenue) OVER (
         ORDER BY (day - DATE '1970-01-01')
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
       ), 4) AS avg_7d
FROM daily
"""


# ---------------------------------------------------------- sinks / sources
def q_partitioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet round-trip: write events partitioned by
    event_type, read back with a partition filter (directory pruning — plan
    asserted in tests/test_sinks.py), aggregate."""
    from naru_spark.sources.sinks import read_partitioned, write_partitioned

    ev = _load(spark, sf_dir, "events")
    path = _tmpdir(prefix="events_part_") + "/events"
    write_partitioned(ev.select("event_id", "ts", "event_type", "value"), path, ["event_type"])
    back = read_partitioned(spark, path).filter(
        F.col("event_type").isin("click", "purchase")
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value")
    )


def sql_partitioned_sink() -> str:
    return """
SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
FROM events WHERE event_type IN ('click', 'purchase')
GROUP BY event_type
"""


def q_partition_overwrite_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite (sources.sinks.overwrite_partitions) —
    the parquet-native reprocess-one-slice upsert: write events partitioned
    by type, then rewrite ONLY the click partition with transformed values
    (value + 1). Reading back must show updated clicks and bit-identical
    untouched partitions — which is exactly what the oracle checks, since
    a STATIC overwrite (the classic footgun this path guards against)
    would have wiped every other partition to zero rows."""
    from naru_spark.sources.sinks import (
        overwrite_partitions,
        read_partitioned,
        write_partitioned,
    )

    ev = _load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    path = _tmpdir(prefix="events_upsert_") + "/events"
    write_partitioned(ev, path, ["event_type"])
    updated = ev.filter(F.col("event_type") == "click").withColumn(
        "value", F.col("value") + 1
    )
    overwrite_partitions(updated, path, ["event_type"])
    back = read_partitioned(spark, path)
    return (
        back.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .orderBy("event_type")
    )


def sql_partition_overwrite_upsert() -> str:
    return """
SELECT event_type, COUNT(*) AS n,
       ROUND(SUM(value + CASE WHEN event_type = 'click' THEN 1 ELSE 0 END), 4) AS sum_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def q_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot isolation + time travel (sources.sinks.write_snapshot /
    read_snapshot — Iceberg/Delta-lite): v1 commits the even-doc_id half,
    v2 appends the odd half; readers open ONE manifest and exactly the
    files it names (no directory listing — the object-store-safe shape),
    so version 1 stays byte-identical AFTER the v2 append. The entry
    aggregates BOTH versions; the oracle replays the parity split."""
    from naru_spark.sources.sinks import read_snapshot, write_snapshot

    docs = _load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    path = _tmpdir(prefix="docs_snap_") + "/docs"
    v1 = write_snapshot(docs.filter(F.col("doc_id") % 2 == 0), path)
    v2 = write_snapshot(docs.filter(F.col("doc_id") % 2 == 1), path)
    assert (v1, v2) == (1, 2), (v1, v2)

    def agg(df: DataFrame, version: int) -> DataFrame:
        return df.groupBy("source").agg(
            F.lit(version).alias("version"),
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
        )

    out = agg(read_snapshot(spark, path, version=1), 1).unionByName(
        agg(read_snapshot(spark, path), 2)  # latest
    )
    return out.select("version", "source", "n", "sum_chars").orderBy("version", "source")


def sql_snapshot_time_travel() -> str:
    return """
SELECT 1 AS version, source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE doc_id % 2 = 0
GROUP BY source
UNION ALL
SELECT 2 AS version, source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY source
ORDER BY version, source
"""


def q_snapshot_incremental_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental scan between snapshot versions
    (sources.sinks.read_snapshot_changes — Iceberg incremental read /
    Delta CDF-lite for append-only tables): v1 commits doc_id % 3 == 0,
    v2 appends % 3 == 1, v3 appends % 3 == 2; the consumer reads ONLY
    what v1..v3 added — O(|delta|) I/O however large the table, the
    shape that feeds IVM folds and backfills without re-scanning
    history. The entry aggregates the v1->v3 delta (everything except
    v1's rows); the oracle replays the modulus split. A replace commit
    inside the range raises (asserted inline) rather than returning a
    wrong diff."""
    from naru_spark.sources.sinks import read_snapshot_changes, write_snapshot

    docs = _load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    path = _tmpdir(prefix="docs_snap_incr_") + "/docs"
    for k in range(3):
        write_snapshot(docs.filter(F.col("doc_id") % 3 == k), path)
    delta = read_snapshot_changes(spark, path, from_version=1)  # v1 -> latest
    return (
        delta.groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("source")
    )


def sql_snapshot_incremental_read() -> str:
    return """
SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE doc_id % 3 <> 0
GROUP BY source
ORDER BY source
"""


def q_snapshot_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITE-AUDIT-PUBLISH on branch refs (sinks.create_branch /
    publish_branch / create_tag — Iceberg branch refs + fast_forward;
    the staging discipline production ingest pipelines run so main NEVER
    serves unaudited data): main commits the even-doc corpus and tags
    it; the odd-doc batch lands on a zero-copy STAGING BRANCH; the audit
    finds quality violations (n_chars < 150) and row-level-deletes them
    ON THE BRANCH; publish atomically fast-forwards main to the audited
    state. Counter-asserted inline every run: main is unchanged while
    the branch holds the unaudited batch, the pre-publish tag still
    resolves to the old state AFTER publish, and a second publish of the
    now-stale branch is refused (non-fast-forward guard). The oracle
    replays the audit predicate in SQL."""
    from naru_spark.sources.sinks import (
        SnapshotConflictError,
        create_branch,
        create_tag,
        delete_from_snapshot,
        publish_branch,
        read_snapshot,
        resolve_tag,
        write_snapshot,
    )

    docs = _load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    path = _tmpdir(prefix="docs_snap_wap_") + "/docs"
    n_main = docs.filter(F.col("doc_id") % 2 == 0).count()
    write_snapshot(docs.filter(F.col("doc_id") % 2 == 0), path)
    create_tag(path, "pre-wap")

    bpath = create_branch(path, "staging")
    write_snapshot(docs.filter(F.col("doc_id") % 2 == 1), bpath)
    # AUDIT on the branch: main must not have moved while staging holds
    # the raw batch
    assert read_snapshot(spark, path).count() == n_main
    # scope the audit to the STAGED BATCH: the branch also references
    # main's (already-audited) rows — an unscoped predicate would
    # re-audit and delete them too
    delete_from_snapshot(spark, bpath, "n_chars < 150 AND doc_id % 2 = 1")

    publish_branch(path, "staging")
    # the tag pins the pre-publish state forever
    assert (
        read_snapshot(spark, path, version=resolve_tag(path, "pre-wap")).count()
        == n_main
    )
    # a published branch is stale: fast-forward refuses a second publish
    try:
        publish_branch(path, "staging")
        raise AssertionError("stale publish must be refused")
    except SnapshotConflictError:
        pass
    return (
        read_snapshot(spark, path)
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("source")
    )


def sql_snapshot_wap_publish() -> str:
    return """
SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE doc_id % 2 = 0 OR n_chars >= 150
GROUP BY source
ORDER BY source
"""


def q_snapshot_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (sources.sinks.compact_snapshot — Iceberg
    rewrite_data_files / Delta OPTIMIZE): three append commits land the
    corpus as many small parquet files; compaction rewrites the latest
    snapshot into 4 files as a replace commit. Asserted INLINE on every
    run: the file count actually shrank, and the PRE-compaction v3 stays
    time-travelable with identical row count (compaction must never be
    observable to readers except in file layout). The entry aggregates
    the compacted table; the oracle is the same aggregate on the raw
    corpus — content invariance IS the correctness claim."""
    from naru_spark.sources.sinks import compact_snapshot, read_snapshot, write_snapshot

    docs = _load(spark, sf_dir, "documents").select("doc_id", "source", "lang", "n_chars")
    path = _tmpdir(prefix="docs_snap_compact_") + "/docs"
    for k in range(3):
        # repartition(6) forces small files: 18 files across 3 commits
        write_snapshot(docs.filter(F.col("doc_id") % 3 == k).repartition(6), path)
    info = compact_snapshot(spark, path, target_files=4)
    assert info["version"] == 4 and info["files_after"] < info["files_before"], info
    n_total = docs.count()
    assert read_snapshot(spark, path, version=3).count() == n_total  # pre-compaction intact
    return (
        read_snapshot(spark, path)  # the compacted v4
        .groupBy("source", "lang")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("source", "lang")
    )


def sql_snapshot_compaction() -> str:
    return """
SELECT source, lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY source, lang
ORDER BY source, lang
"""


def q_snapshot_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level predicate delete (sources.sinks.delete_from_snapshot —
    Delta DELETE FROM WHERE, the GDPR-delete shape): the corpus is
    committed, then every ``doc_id % 7 == 0`` row of the first doc_id
    third is deleted as a replace commit pinned to the read version. Asserted
    inline: the reported delete count is exact, the PRE-delete v1
    stays time-travelable with the full row count (deletes must be
    invisible to historical readers until retention expiry), and the
    rewrite is FILE-PRUNED — the corpus is committed in three disjoint
    doc_id ranges and the predicate is bounded to the first, so the two
    non-overlapping commits must carry into the new manifest verbatim
    (Delta's delete path: pay for matching files, not the table). The
    entry aggregates the post-delete table; the oracle replays the
    survivor predicate — including Delta's NULL semantics, since rows
    where the condition is NULL must survive."""
    from naru_spark.sources.sinks import (
        delete_from_snapshot,
        read_snapshot,
        write_snapshot,
    )

    docs = _load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    path = _tmpdir(prefix="docs_snap_delete_") + "/docs"
    max_id = int(docs.agg(F.max("doc_id")).collect()[0][0])
    t1 = max_id // 3
    write_snapshot(docs.where(F.col("doc_id") <= t1), path)
    write_snapshot(
        docs.where((F.col("doc_id") > t1) & (F.col("doc_id") <= 2 * t1)), path
    )
    write_snapshot(docs.where(F.col("doc_id") > 2 * t1), path)
    # the prune box is derived from the condition's doc_id bound: the two
    # out-of-range commits are eliminated from the matching scan by the
    # MANIFEST's stamped column stats — zero I/O, not even a footer open
    info = delete_from_snapshot(
        spark, path, f"doc_id % 7 = 0 AND doc_id <= {t1}",
        prune={"doc_id": (0, t1)},
    )
    expected = docs.where(
        (F.col("doc_id") % 7 == 0) & (F.col("doc_id") <= t1)
    ).count()
    assert 0 < info["n_deleted"] == expected, (info, expected)
    # manifest-stats elimination: only the first commit was scanned
    assert info["entries_pruned"] >= 2 and info["entries_scanned"] >= 1, info
    # file pruning: the two out-of-range commits carry forward untouched
    assert info["files_carried"] >= 2, info
    assert read_snapshot(spark, path, version=3).count() == docs.count()
    return (
        read_snapshot(spark, path)
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("source")
    )


def sql_snapshot_delete_where() -> str:
    # IS NOT TRUE, not NOT(...): a NULL condition must SURVIVE the delete
    # (Delta semantics, mirrored by the entry's ~cond | cond.isNull()) —
    # plain NOT would drop NULL-condition rows if the corpus ever gains
    # them. The doc_id bound replays the entry's first-third range
    # (MAX//3, integer division in both engines).
    return """
SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE (doc_id % 7 = 0
       AND doc_id <= (SELECT MAX(doc_id) // 3 FROM documents)) IS NOT TRUE
GROUP BY source
ORDER BY source
"""


def q_snapshot_delete_auto_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE with AUTO-DERIVED entry elimination
    (sources.sinks.delete_from_snapshot auto_prune /
    _condition_prune_hints — Delta derives file skipping from the WHERE
    clause the same way): the corpus lands as three disjoint doc_id
    ranges, then a plain ``DELETE WHERE doc_id <= …`` with NO caller
    hints eliminates the two out-of-range commits on the manifest
    stats alone (asserted inline) — the hand-hint footgun (a too-small
    box silently leaving matches alive) is gone because the box comes
    from the condition itself. Oracle: the corpus minus the deleted
    range."""
    from naru_spark.sources.sinks import (
        delete_from_snapshot,
        read_snapshot,
        write_snapshot,
    )

    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    path = _tmpdir(prefix="docs_snap_autoprune_") + "/docs"
    t1 = int(docs.agg(F.max("doc_id")).collect()[0][0]) // 3
    write_snapshot(docs.where(F.col("doc_id") <= t1), path)            # v1
    write_snapshot(
        docs.where((F.col("doc_id") > t1) & (F.col("doc_id") <= 2 * t1)),
        path,
    )                                                                  # v2
    write_snapshot(docs.where(F.col("doc_id") > 2 * t1), path)         # v3
    cut = t1 // 2
    info = delete_from_snapshot(spark, path, f"doc_id <= {cut}")       # v4
    # the derived box eliminated the two out-of-range commits without
    # a single hint (and without opening a footer)
    assert info["entries_pruned"] >= 2, info
    assert info["n_deleted"] > 0, info
    assert read_snapshot(spark, path, version=3).count() == docs.count()
    return (
        read_snapshot(spark, path)
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("source")
    )


def sql_snapshot_delete_auto_prune() -> str:
    return """
WITH cut AS (SELECT (MAX(doc_id) // 3) // 2 AS c FROM documents)
SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM documents, cut
WHERE doc_id > cut.c
GROUP BY source
ORDER BY source
"""


def q_snapshot_merge_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILE-PRUNED MERGE INTO the snapshot table
    (sources.sinks.merge_into_snapshot — Delta's MERGE execution shape,
    the batch twin of the file-pruned DELETE): the corpus lands in three
    disjoint doc_id-range commits; the changeset's deletes and updates
    are bounded to the FIRST range (plus offset-id inserts that match no
    file), so the two out-of-range commits must carry into the new
    manifest verbatim — asserted inline, along with the exact change
    count. NO hand-written prune hint: the merge AUTO-DERIVES entry
    elimination from the changeset's own distinct keys (exact per-key
    containment against the stamped per-entry min/max — the far-out
    insert ids correctly match no entry instead of inflating a covering
    box), which removes the too-small-box footgun the old hand hint's
    CONTRACT comment warned about. The oracle replays matched-delete /
    matched-update / unmatched-insert in plain SQL over the same
    bounded changeset."""
    from naru_spark.sources.sinks import (
        merge_into_snapshot,
        read_snapshot,
        write_snapshot,
    )

    OFFSET = 100_000_000
    docs = _load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    path = _tmpdir(prefix="docs_snap_merge_") + "/docs"
    max_id = int(docs.agg(F.max("doc_id")).collect()[0][0])
    t1 = max_id // 3
    write_snapshot(docs.where(F.col("doc_id") <= t1), path)
    write_snapshot(
        docs.where((F.col("doc_id") > t1) & (F.col("doc_id") <= 2 * t1)), path
    )
    write_snapshot(docs.where(F.col("doc_id") > 2 * t1), path)
    in_r1 = F.col("doc_id") <= t1
    deletes = docs.filter(in_r1 & (F.col("doc_id") % 13 == 0)).select(
        "doc_id", "source", "n_chars", F.lit("D").alias("op")
    )
    updates = (
        docs.filter(in_r1 & (F.col("doc_id") % 13 != 0) & (F.col("doc_id") % 7 == 0))
        .withColumn("n_chars", F.col("n_chars") + 1000)
        .select("doc_id", "source", "n_chars", F.lit("U").alias("op"))
    )
    inserts = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + F.lit(OFFSET)).alias("doc_id"),
        F.lit("src_new").alias("source"), "n_chars", F.lit("U").alias("op"),
    )
    changes = deletes.unionByName(updates).unionByName(inserts)
    # the changeset's distinct keys scale with the corpus (~8k at sf1,
    # past the 8192 enumeration default at larger SFs): past the cap the
    # engine runs the SAME exact per-entry containment as a distributed
    # range join (keys never collect to the driver), so the pruning this
    # entry asserts on holds at every scale factor with the default cap
    info = merge_into_snapshot(spark, path, changes, key="doc_id")
    assert info["n_changes"] == changes.count(), info
    # the two out-of-range commits were never even scanned
    assert info["entries_pruned"] >= 2 and info["files_carried"] >= 2, info
    assert read_snapshot(spark, path, version=3).count() == docs.count()
    return (
        read_snapshot(spark, path)
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("source")
    )


def q_snapshot_replace_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional dynamic partition overwrite on an identity-
    PARTITIONED snapshot table (sources.sinks.replace_where — Delta
    replaceWhere; sources.sinks.write_snapshot(partition_by=...) stamps
    one manifest entry per partition value): the corpus lands as TWO
    lang-partitioned commits (10 entries), then the 'en' partitions are
    replaced with a reprocessed frame (even doc_ids only, n_chars+1000)
    — exactly the 2 'en' entries are replaced and the other 8 carry
    into the commit verbatim (asserted inline), a partition-pruned read
    plans ONLY the 'en' entries footer-free (inputFiles asserted), the
    replaceWhere constraint refuses an out-of-set frame, and
    pre-overwrite history stays time-travelable. The oracle replays
    keep-others + reprocessed-en in plain SQL."""
    from naru_spark.sources.sinks import (
        read_snapshot,
        replace_where,
        write_snapshot,
    )

    docs = _load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    path = _tmpdir(prefix="docs_snap_rw_") + "/docs"
    mid = int(docs.agg(F.max("doc_id")).collect()[0][0]) // 2
    write_snapshot(docs.where(F.col("doc_id") <= mid), path,
                   partition_by="lang")                                  # v1
    write_snapshot(docs.where(F.col("doc_id") > mid), path,
                   partition_by="lang")                                  # v2
    new_en = (
        docs.where((F.col("lang") == "en") & (F.col("doc_id") % 2 == 0))
        .withColumn("n_chars", F.col("n_chars") + 1000)
    )
    info = replace_where(spark, path, new_en, "lang", ["en"])            # v3
    assert info["partitions_replaced"] == 2, info
    assert info["entries_carried"] == 8, info
    # the constraint: an out-of-set frame refuses before writing
    try:
        replace_where(spark, path, docs.limit(1), "lang", ["zz"])
        raise AssertionError("out-of-set replacement frame must refuse")
    except ValueError:
        pass
    # footer-free partition pruning: only en entries are planned
    pruned = read_snapshot(spark, path, partitions={"lang": ["en"]})
    assert all("__part_lang=en" in f for f in pruned.inputFiles())
    # pre-overwrite history is intact
    assert read_snapshot(spark, path, version=2).count() == docs.count()
    return (
        read_snapshot(spark, path)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("lang")
    )


def q_snapshot_replace_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-COLUMN identity partition spec + composite replaceWhere
    (sources.sinks.write_snapshot(partition_by=[c1, c2]) /
    replace_where({c1: [...], c2: [...]}) — the Iceberg multi-field
    spec): the corpus lands partitioned by (lang, bucket) — one
    manifest entry per LEAF cell, stamped on BOTH columns — then (1) a
    composite predicate replaces exactly the (en, 1) cell while every
    other cell carries verbatim, and (2) a SUBSET-column predicate
    replaces bucket=2 across ALL languages in one commit, re-committing
    under the full two-column spec (asserted from the manifest). The
    oracle replays both overwrites in plain SQL."""
    import json
    import os

    from naru_spark.sources.sinks import (
        read_snapshot,
        replace_where,
        write_snapshot,
    )

    docs = (
        _load(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .withColumn("bucket", F.col("doc_id") % 3)
    )
    path = _tmpdir(prefix="docs_snap_rwc_") + "/docs"
    write_snapshot(docs, path, partition_by=["lang", "bucket"])        # v1
    n_langs = docs.select("lang").distinct().count()
    new_cell = (
        docs.where((F.col("lang") == "en") & (F.col("bucket") == 1)
                   & (F.col("doc_id") % 2 == 0))
        .withColumn("n_chars", F.col("n_chars") + 7000)
    )
    info = replace_where(spark, path, new_cell,
                         {"lang": ["en"], "bucket": [1]})              # v2
    assert info["partitions_replaced"] == 1, info
    assert info["entries_carried"] == 3 * n_langs - 1, info
    new_b2 = (
        docs.where((F.col("bucket") == 2) & (F.col("doc_id") % 5 == 0))
        .withColumn("n_chars", F.col("n_chars") + 9000)
    )
    info2 = replace_where(spark, path, new_b2, {"bucket": [2]})        # v3
    assert info2["partitions_replaced"] == n_langs, info2
    # the subset replace re-committed under the FULL spec: every entry
    # still stamps BOTH columns (manifest-only check)
    with open(os.path.join(path, "_manifests", f"v{info2['version']}.json")) as fh:
        man = json.load(fh)
    assert all(
        set(man["stats"][e]["partition"]) == {"bucket", "lang"}
        for e in man["dirs"]
    )
    # composed two-column pruning plans exactly one cell, footer-free
    pruned = read_snapshot(
        spark, path, partitions={"lang": ["en"], "bucket": [0]}
    )
    assert all(
        "__part_lang=en" in f and "__part_bucket=0" in f
        for f in pruned.inputFiles()
    )
    return (
        read_snapshot(spark, path)
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("lang", "bucket")
    )


def sql_snapshot_replace_composite() -> str:
    return """
WITH base AS (SELECT doc_id, lang, n_chars FROM documents),
final AS (
  SELECT doc_id, lang, n_chars FROM base
  WHERE NOT (lang = 'en' AND doc_id % 3 = 1) AND doc_id % 3 <> 2
  UNION ALL
  SELECT doc_id, lang, n_chars + 7000 FROM base
  WHERE lang = 'en' AND doc_id % 3 = 1 AND doc_id % 2 = 0
  UNION ALL
  SELECT doc_id, lang, n_chars + 9000 FROM base
  WHERE doc_id % 3 = 2 AND doc_id % 5 = 0
)
SELECT lang, CAST(doc_id % 3 AS BIGINT) AS bucket, COUNT(*) AS n,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM final
GROUP BY lang, bucket
ORDER BY lang, bucket
"""


def q_snapshot_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta CHECK constraints on the snapshot table
    (sources.sinks.add_snapshot_constraint / write-time enforcement):
    the corpus commits, a CHECK is added (validated against the existing
    rows first — a constraint the data violates refuses), a VIOLATING
    append is refused with nothing published and no orphan data dir
    (asserted inline), and a valid transformed batch commits under the
    enforcement probe. The oracle replays corpus + the valid batch in
    plain SQL — the refused batch must have left zero trace."""
    from naru_spark.sources.sinks import (
        add_snapshot_constraint,
        read_snapshot,
        write_snapshot,
    )

    OFFSET = 100_000_000
    docs = _load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    path = _tmpdir(prefix="docs_snap_check_") + "/docs"
    write_snapshot(docs, path)                                           # v1
    # a constraint the existing data violates refuses at add time
    try:
        add_snapshot_constraint(spark, path, "huge", "n_chars >= 1000000")
        raise AssertionError("violated-by-existing-data CHECK must refuse")
    except ValueError:
        pass
    add_snapshot_constraint(spark, path, "chars_nonneg", "n_chars >= 0")  # v2

    import os
    data_root = os.path.join(path, "data")
    before = sorted(os.listdir(data_root))
    bad = docs.limit(1).select(
        (F.col("doc_id") + F.lit(2 * OFFSET)).alias("doc_id"),
        F.lit("src_bad").alias("source"),
        F.lit(-1).alias("n_chars"),
    )
    try:
        write_snapshot(bad, path)
        raise AssertionError("violating append must refuse")
    except ValueError:
        pass
    assert sorted(os.listdir(data_root)) == before  # no orphan data

    good = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + F.lit(OFFSET)).alias("doc_id"),
        F.lit("src_new").alias("source"),
        (F.col("n_chars") + 1000).alias("n_chars"),
    )
    write_snapshot(good, path)                                           # v3
    return (
        read_snapshot(spark, path)
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("source")
    )


def sql_snapshot_constraints() -> str:
    return """
WITH merged AS (
  SELECT doc_id, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 100000000, 'src_new', n_chars + 1000 FROM documents
  WHERE doc_id % 11 = 0
)
SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MAX(doc_id) AS max_id
FROM merged
GROUP BY source
ORDER BY source
"""


def sql_snapshot_replace_where() -> str:
    return """
WITH merged AS (
  SELECT doc_id, lang, n_chars FROM documents WHERE lang <> 'en'
  UNION ALL
  SELECT doc_id, lang, n_chars + 1000 FROM documents
  WHERE lang = 'en' AND doc_id % 2 = 0
)
SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM merged
GROUP BY lang
ORDER BY lang
"""


def sql_snapshot_merge_pruned() -> str:
    return """
WITH m AS (SELECT MAX(doc_id) // 3 AS t1 FROM documents),
merged AS (
  SELECT d.doc_id, d.source,
         CASE WHEN d.doc_id <= m.t1 AND d.doc_id % 13 <> 0
                   AND d.doc_id % 7 = 0
              THEN d.n_chars + 1000 ELSE d.n_chars END AS n_chars
  FROM documents d, m
  WHERE NOT (d.doc_id <= m.t1 AND d.doc_id % 13 = 0)
  UNION ALL
  SELECT d.doc_id + 100000000, 'src_new', d.n_chars
  FROM documents d WHERE d.doc_id % 11 = 0
)
SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM merged
GROUP BY source
ORDER BY source
"""


def q_snapshot_rename_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rename-without-rewrite schema evolution
    (sources.sinks.alter_snapshot_schema — Iceberg/Delta column-mapping):
    half the corpus commits under the ORIGINAL column name, the rename
    (+ a column drop) lands as a METADATA-ONLY commit (asserted inline:
    zero new data files), the other half appends under the NEW name, and
    the read maps both physical layouts to one logical schema at scan
    time. Time travel to v1 still sees the original names; compaction
    materializes and the aggregate must be unchanged. The oracle
    aggregates the raw corpus under the post-rename name."""
    import os

    from naru_spark.sources.sinks import (
        alter_snapshot_schema,
        compact_snapshot,
        read_snapshot,
        write_snapshot,
    )

    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    )
    path = _tmpdir(prefix="docs_snap_rename_") + "/docs"
    write_snapshot(docs.filter(F.col("doc_id") % 2 == 0), path)  # v1: n_chars

    def n_data_files() -> int:
        root = os.path.join(path, "data")
        return sum(
            1 for d in os.listdir(root)
            for f in os.listdir(os.path.join(root, d)) if f.endswith(".parquet")
        )

    before = n_data_files()
    alter_snapshot_schema(path, rename={"n_chars": "chars"}, drop=["lang"])
    assert n_data_files() == before, "schema op must be metadata-only"
    assert set(read_snapshot(spark, path, version=1).columns) == {
        "doc_id", "source", "lang", "n_chars"
    }
    # the second half appends under the LOGICAL (new) schema
    write_snapshot(
        docs.filter(F.col("doc_id") % 2 == 1).select(
            "doc_id", "source", F.col("n_chars").alias("chars")
        ),
        path,
    )
    agg = (
        read_snapshot(spark, path)
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("chars").alias("sum_chars"))
        .orderBy("source")
    )
    pre = {tuple(r) for r in agg.collect()}
    compact_snapshot(spark, path)  # materializes the mapping
    out = (
        read_snapshot(spark, path)
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("chars").alias("sum_chars"))
        .orderBy("source")
    )
    assert {tuple(r) for r in out.collect()} == pre
    return out


def sql_snapshot_rename_column() -> str:
    return """
SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY source
ORDER BY source
"""


def q_snapshot_delete_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-index-pruned point DELETE (sources.sinks write_snapshot
    bloom_key= + delete_from_snapshot prune_keys= — the Delta
    bloom-filter-index / Iceberg puffin shape): the corpus lands in
    three commits with fully INTERLEAVED doc_id ranges (doc_id % 3 —
    every commit's min/max box overlaps everything, so the column-stats
    pruning of snapshot_delete_where is provably useless here), each
    commit stamping a bloom sidecar over its keys. A two-key IN-list
    delete (the GDPR point-delete shape) probes the blooms and
    eliminates the commit containing neither key BEFORE the matching
    scan — asserted inline. Survivor aggregation shares a plain
    NULL-safe oracle."""
    from naru_spark.sources.sinks import (
        delete_from_snapshot,
        read_snapshot,
        write_snapshot,
    )

    docs = _load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    path = _tmpdir(prefix="docs_snap_bloom_") + "/docs"
    for k in range(3):
        write_snapshot(
            docs.filter(F.col("doc_id") % 3 == k), path, bloom_key="doc_id"
        )
    # victims 0 (commit 1) and 7 (commit 2); commit 3 holds neither
    info = delete_from_snapshot(
        spark, path, "doc_id IN (0, 7)", prune_keys={"doc_id": [0, 7]}
    )
    assert info["n_deleted"] == 2, info
    assert info["entries_pruned"] >= 1 and info["entries_scanned"] <= 2, info
    assert read_snapshot(spark, path, version=3).count() == docs.count()
    return (
        read_snapshot(spark, path)
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("source")
    )


def sql_snapshot_delete_bloom() -> str:
    return """
SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE (doc_id IN (0, 7)) IS NOT TRUE
GROUP BY source
ORDER BY source
"""


def q_snapshot_delete_bloom_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPOSED pruning on one DELETE (sources.sinks.write_snapshot
    partition_by + bloom_key — the core Delta shape: a partitioned
    table with a bloom index on a point-lookup key inside partitions):
    two lang-partitioned, doc_id-bloomed commits, then a two-key DELETE
    eliminates every non-'en' entry on partition identity (exact,
    manifest-only) and the surviving partitions' non-matching commits
    on their per-entry bloom sidecars — both on ONE manifest read, no
    footer opened. Spec AND bloom survive the file-pruned rewrite and a
    full compaction (asserted from the manifests); a composed pruned
    read still plans only 'en' files. Oracle: both commits minus the
    two deleted ids."""
    import json
    import os

    from naru_spark.sources.sinks import (
        compact_snapshot,
        delete_from_snapshot,
        read_snapshot,
        write_snapshot,
    )

    OFFSET = 100_000_000
    # two languages keep the fixture lean (bloom builds are one bounded
    # Spark job per partition entry) while still exercising partition
    # elimination, per-entry bloom probes, and their composition
    docs = (
        _load(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .where(F.col("lang").isin("de", "en"))
    )
    path = _tmpdir(prefix="docs_snap_bp_") + "/docs"
    write_snapshot(docs, path, partition_by="lang",
                   bloom_key="doc_id")                                 # v1
    write_snapshot(
        docs.select((F.col("doc_id") + F.lit(OFFSET)).alias("doc_id"),
                    "lang", "n_chars"),
        path, partition_by="lang", bloom_key="doc_id",
    )                                                                  # v2
    targets = [
        r["doc_id"] for r in docs.where(F.col("lang") == "en")
        .select("doc_id").orderBy("doc_id").limit(2).collect()
    ]
    n_langs = docs.select("lang").distinct().count()
    info = delete_from_snapshot(
        spark, path, f"doc_id IN ({targets[0]}, {targets[1]})",
        partitions={"lang": ["en"]}, prune_keys={"doc_id": targets},
    )
    assert info["n_deleted"] == 2, info
    # partition identity alone eliminates every non-en entry; the bloom
    # then (deterministically here: disjoint key ranges) drops v2's en
    # entry too — the delete scanned at most the one matching entry +
    # a possible bloom false positive
    assert info["entries_pruned"] >= 2 * (n_langs - 1), info
    assert info["entries_scanned"] <= 2, info
    # spec AND bloom survive the rewrite and a full compaction
    cinfo = compact_snapshot(spark, path, full=True)
    man_dir = os.path.join(path, "_manifests")
    with open(os.path.join(man_dir, f"v{cinfo['version']}.json")) as fh:
        man = json.load(fh)
    assert man["dirs"], man
    for e in man["dirs"]:
        s = man["stats"][e]
        assert s.get("partition", {}).get("lang"), (e, s)
        assert s.get("bloom", {}).get("key") == "doc_id", (e, s)
    pruned = read_snapshot(spark, path, partitions={"lang": ["en"]},
                           prune_keys={"doc_id": [targets[0] + OFFSET]})
    assert all("__part_lang=en" in f for f in pruned.inputFiles())
    return (
        read_snapshot(spark, path)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("lang")
    )


def sql_snapshot_delete_bloom_partition() -> str:
    return """
WITH base AS (
  SELECT doc_id, lang, n_chars FROM documents WHERE lang IN ('de', 'en')
),
en2 AS (
  SELECT doc_id FROM base WHERE lang = 'en' ORDER BY doc_id LIMIT 2
),
merged AS (
  SELECT doc_id, lang, n_chars FROM base
  UNION ALL
  SELECT doc_id + 100000000, lang, n_chars FROM base
),
kept AS (
  SELECT * FROM merged WHERE doc_id NOT IN (SELECT doc_id FROM en2)
)
SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM kept
GROUP BY lang
ORDER BY lang
"""


def q_snapshot_delete_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE (sources.sinks.delete_from_snapshot with
    mode="merge-on-read" — Iceberg v2 / Hudi MoR, the write-cheap twin of
    the copy-on-write snapshot_delete_where): the corpus lands in three
    commits, a predicate delete commits METADATA-ONLY (asserted inline:
    zero new data files), a LATER append adds offset-id rows the earlier
    predicate must NOT touch (sequence semantics — each predicate pins
    the entries visible when it committed), then a second predicate
    stacks. The read plan is a union of per-predicate-set filtered scans
    (filters pushed into the parquet scans); the oracle replays both
    predicates with their sequence scope and Delta NULL semantics in
    plain SQL. Finally compaction materializes the deletes and the
    re-read must aggregate identically."""
    import json
    import os

    from naru_spark.sources.sinks import (
        compact_snapshot,
        delete_from_snapshot,
        read_snapshot,
        write_snapshot,
    )

    OFFSET = 100_000_000
    docs = _load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    path = _tmpdir(prefix="docs_snap_mor_") + "/docs"
    for k in range(3):
        write_snapshot(docs.filter(F.col("doc_id") % 3 == k), path)
    n_files_before = sum(
        1 for d in os.listdir(os.path.join(path, "data"))
        for f in os.listdir(os.path.join(path, "data", d)) if f.endswith(".parquet")
    )
    info = delete_from_snapshot(
        spark, path, "doc_id % 7 = 0", mode="merge-on-read"
    )
    assert info["n_deleted"] is None and info["files_rewritten"] == 0, info
    n_files_after = sum(
        1 for d in os.listdir(os.path.join(path, "data"))
        for f in os.listdir(os.path.join(path, "data", d)) if f.endswith(".parquet")
    )
    assert n_files_after == n_files_before, "MoR delete must be metadata-only"
    # sequence semantics: offset-id re-appends land AFTER the delete, so
    # doc_id % 7 = 0 must not touch them even where it matches
    write_snapshot(
        docs.select(
            (F.col("doc_id") + OFFSET).alias("doc_id"), "source", "n_chars"
        ),
        path,
    )
    delete_from_snapshot(spark, path, "source = 'web'", mode="merge-on-read")
    agg = (
        read_snapshot(spark, path)
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("source")
    )
    pre = {tuple(r) for r in agg.collect()}
    # compaction materializes the predicates; content must be unchanged
    res = compact_snapshot(spark, path)
    with open(os.path.join(path, "_manifests", f"v{res['version']}.json")) as fh:
        assert json.load(fh).get("deletes", []) == []
    out = (
        read_snapshot(spark, path)
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("source")
    )
    assert {tuple(r) for r in out.collect()} == pre
    return out


def sql_snapshot_delete_mor() -> str:
    # predicate 1 (doc_id % 7 = 0) scopes to the ORIGINAL three commits
    # only (sequence semantics); predicate 2 (source = 'web') scopes to
    # everything including the offset re-append. IS NOT TRUE keeps Delta
    # NULL-survival semantics in both.
    return """
WITH mor AS (
    SELECT doc_id, source, n_chars FROM documents
    WHERE (doc_id % 7 = 0) IS NOT TRUE
    UNION ALL
    SELECT doc_id + 100000000 AS doc_id, source, n_chars FROM documents
)
SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM mor
WHERE (source = 'web') IS NOT TRUE
GROUP BY source
ORDER BY source
"""


def q_snapshot_merge_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE ... WHEN NOT MATCHED BY SOURCE THEN DELETE
    (sources.sinks.merge_into_snapshot not_matched_by_source /
    operators.merge.merge_into — Delta's third MERGE clause, the CDC
    full-sync shape): the target table converges to EXACTLY the
    changeset — matched rows update, unmatched changeset rows insert
    (none here), and base rows the changeset does not carry are
    DELETED. Pruning is impossible by construction (every base row
    participates — asserted: zero entries pruned) and the change data
    feed reports the dropped rows as deletes alongside the update
    pairs (asserted by count). Oracle: the changeset itself."""
    from naru_spark.sources.sinks import (
        merge_into_snapshot,
        read_snapshot,
        read_snapshot_changes,
        write_snapshot,
    )

    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    path = _tmpdir(prefix="docs_snap_sync_") + "/docs"
    write_snapshot(docs, path, cdf=True)                               # v1
    source_now = (
        docs.where(F.col("doc_id") % 3 != 0)
        .withColumn("n_chars", F.col("n_chars") + 500)
        .withColumn("op", F.lit("U"))
    )
    info = merge_into_snapshot(
        spark, path, source_now, key="doc_id",
        not_matched_by_source="delete",
    )                                                                  # v2
    assert info["entries_pruned"] == 0, info
    n_gone = docs.where(F.col("doc_id") % 3 == 0).count()
    n_kept = docs.count() - n_gone
    assert read_snapshot(spark, path).count() == n_kept
    ch = read_snapshot_changes(spark, path, 1, row_level=True)
    counts = {
        r["_change_type"]: r["n"]
        for r in ch.groupBy("_change_type")
        .agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"delete": n_gone, "update_preimage": n_kept,
                      "update_postimage": n_kept}, counts
    return (
        read_snapshot(spark, path)
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("source")
    )


def sql_snapshot_merge_sync() -> str:
    return """
SELECT source, COUNT(*) AS n,
       CAST(SUM(n_chars + 500) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM documents
WHERE doc_id % 3 <> 0
GROUP BY source
ORDER BY source
"""


def q_snapshot_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level UPDATE (sources.sinks.update_snapshot — Delta
    ``UPDATE ... SET``, completing the DML quartet): the corpus lands as
    three disjoint doc_id ranges, then ``UPDATE WHERE doc_id <= cut SET
    n_chars = n_chars + 1000, source = concat(source, '_u')`` rewrites
    ONLY the files holding matches — entry elimination AUTO-DERIVED
    from the condition (two out-of-range commits never scanned,
    asserted) — while unmatched neighbors copy and untouched files
    carry verbatim. Assignments are simultaneous against the pre-update
    row and cast back to the column types. Oracle: CASE WHEN over the
    corpus."""
    from naru_spark.sources.sinks import (
        read_snapshot,
        update_snapshot,
        write_snapshot,
    )

    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    path = _tmpdir(prefix="docs_snap_upd_") + "/docs"
    t1 = int(docs.agg(F.max("doc_id")).collect()[0][0]) // 3
    write_snapshot(docs.where(F.col("doc_id") <= t1), path)            # v1
    write_snapshot(
        docs.where((F.col("doc_id") > t1) & (F.col("doc_id") <= 2 * t1)),
        path,
    )                                                                  # v2
    write_snapshot(docs.where(F.col("doc_id") > 2 * t1), path)         # v3
    cut = t1 // 2
    info = update_snapshot(
        spark, path, f"doc_id <= {cut}",
        {"n_chars": "n_chars + 1000", "source": "concat(source, '_u')"},
    )                                                                  # v4
    assert info["n_updated"] > 0, info
    # the derived box eliminated the two out-of-range commits
    assert info["entries_pruned"] >= 2, info
    # pre-update history intact
    assert read_snapshot(spark, path, version=3).count() == docs.count()
    return (
        read_snapshot(spark, path)
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("source")
    )


def sql_snapshot_update_where() -> str:
    return """
WITH cut AS (SELECT (MAX(doc_id) // 3) // 2 AS c FROM documents),
updated AS (
  SELECT doc_id,
         CASE WHEN doc_id <= cut.c THEN source || '_u' ELSE source END
           AS source,
         CASE WHEN doc_id <= cut.c THEN n_chars + 1000 ELSE n_chars END
           AS n_chars
  FROM documents, cut
)
SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM updated
GROUP BY source
ORDER BY source
"""


def q_snapshot_update_over_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DV-AWARE UPDATE (sources.sinks.update_snapshot composing with
    pending deletion vectors — Delta's DV-aware DML): the corpus lands
    as three doc_id-range commits with cdf on, a deletion-vector DELETE
    kills ``doc_id % 7 = 0`` (zero files rewritten), then ``UPDATE WHERE
    doc_id <= cut`` rewrites ONLY the in-range files — positionally-dead
    rows neither match nor update (the rewrite materializes their
    vectors out), the OUT-of-range commits carry byte-identical and
    their vectors SURVIVE in the remainder plane, and the change feed
    reports pre/post images for live rows only. Oracle: corpus minus the
    %7 rows with the CASE update applied."""
    import json
    import os

    from naru_spark.sources.sinks import (
        delete_from_snapshot,
        read_snapshot,
        read_snapshot_changes,
        update_snapshot,
        write_snapshot,
    )

    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    path = _tmpdir(prefix="docs_snap_upd_dv_") + "/docs"
    t1 = int(docs.agg(F.max("doc_id")).collect()[0][0]) // 3
    write_snapshot(docs.where(F.col("doc_id") <= t1), path, cdf=True)  # v1
    write_snapshot(
        docs.where((F.col("doc_id") > t1) & (F.col("doc_id") <= 2 * t1)),
        path,
    )                                                                  # v2
    write_snapshot(docs.where(F.col("doc_id") > 2 * t1), path)         # v3
    dinfo = delete_from_snapshot(spark, path, "doc_id % 7 = 0",
                                 mode="deletion-vector")               # v4
    assert dinfo["files_rewritten"] == 0 and dinfo["n_deleted"] > 0, dinfo
    cut = t1 // 2
    info = update_snapshot(
        spark, path, f"doc_id <= {cut}", {"n_chars": "n_chars + 1000"}
    )                                                                  # v5
    # only LIVE in-range rows updated (dead %7 rows do not re-surface)
    n_live = docs.where(
        (F.col("doc_id") <= cut) & (F.col("doc_id") % 7 != 0)
    ).count()
    assert info["n_updated"] == n_live, (info, n_live)
    # the out-of-range commits were never scanned — their files carry
    # byte-identical AND their vectors survive in the remainder plane
    assert info["entries_pruned"] >= 2, info
    with open(os.path.join(path, "_manifests", "v5.json")) as fh:
        assert json.load(fh).get("dvs"), "untouched vectors must survive"
    # CDF exact through the composition: pre-images are live rows only
    feed = read_snapshot_changes(spark, path, 4, 5, row_level=True)
    assert feed.where(
        "_change_type = 'update_preimage' AND doc_id % 7 = 0"
    ).count() == 0
    assert feed.where("_change_type = 'update_preimage'").count() == n_live
    return (
        read_snapshot(spark, path)
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("source")
    )


def sql_snapshot_update_over_dv() -> str:
    return """
WITH cut AS (SELECT (MAX(doc_id) // 3) // 2 AS c FROM documents),
final AS (
  SELECT doc_id, source,
         CASE WHEN doc_id <= cut.c THEN n_chars + 1000 ELSE n_chars END
           AS n_chars
  FROM documents, cut
  WHERE doc_id % 7 <> 0
)
SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM final
GROUP BY source
ORDER BY source
"""


def q_snapshot_merge_over_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DV-AWARE MERGE (merge_into_snapshot composing with pending
    deletion vectors): two range commits, a deletion-vector DELETE kills
    ``doc_id % 5 = 0``, then a changeset confined to the FIRST range
    upserts ``% 11`` keys and deletes ``% 13`` keys. A positionally-dead
    base row is NOT a live match — an upsert on a dead key re-INSERTS
    the changeset row (never resurrects the old one), a delete on a
    dead/absent key no-ops; the untouched second range carries
    byte-identical with its vectors alive in the remainder plane.
    Oracle: the same algebra over the raw corpus."""
    import json
    import os

    from naru_spark.sources.sinks import (
        delete_from_snapshot,
        merge_into_snapshot,
        read_snapshot,
        write_snapshot,
    )

    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    path = _tmpdir(prefix="docs_snap_mrg_dv_") + "/docs"
    mid = int(docs.agg(F.max("doc_id")).collect()[0][0]) // 2
    write_snapshot(docs.where(F.col("doc_id") <= mid), path)           # v1
    write_snapshot(docs.where(F.col("doc_id") > mid), path)            # v2
    dinfo = delete_from_snapshot(spark, path, "doc_id % 5 = 0",
                                 mode="deletion-vector")               # v3
    assert dinfo["files_rewritten"] == 0 and dinfo["n_deleted"] > 0, dinfo
    changes = (
        docs.where(
            (F.col("doc_id") <= mid)
            & ((F.col("doc_id") % 11 == 0) | (F.col("doc_id") % 13 == 0))
        )
        .select(
            "doc_id",
            F.lit("merged").alias("source"),
            (F.col("n_chars") + 5000).alias("n_chars"),
            F.when(F.col("doc_id") % 13 == 0, F.lit("D"))
            .otherwise(F.lit("U")).alias("op"),
        )
    )
    minfo = merge_into_snapshot(spark, path, changes, key="doc_id")    # v4
    assert minfo["n_changes"] > 0, minfo
    # the untouched second range keeps its vectors in the remainder
    with open(os.path.join(path, "_manifests", "v4.json")) as fh:
        assert json.load(fh).get("dvs"), "untouched vectors must survive"
    # a dead upserted key holds EXACTLY the changeset row (no resurrect)
    probe = read_snapshot(spark, path).where(
        f"doc_id <= {mid} AND doc_id % 55 = 0 AND doc_id % 13 <> 0"
    )
    assert probe.where("source <> 'merged'").count() == 0
    return (
        read_snapshot(spark, path)
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("source")
    )


def sql_snapshot_merge_over_dv() -> str:
    return """
WITH mid AS (SELECT MAX(doc_id) // 2 AS m FROM documents),
final AS (
  SELECT doc_id,
         CASE WHEN doc_id <= mid.m AND doc_id % 11 = 0
              THEN 'merged' ELSE source END AS source,
         CASE WHEN doc_id <= mid.m AND doc_id % 11 = 0
              THEN n_chars + 5000 ELSE n_chars END AS n_chars
  FROM documents, mid
  WHERE (doc_id % 5 <> 0
         OR (doc_id <= mid.m AND doc_id % 11 = 0 AND doc_id % 13 <> 0))
    AND NOT (doc_id <= mid.m AND doc_id % 13 = 0)
)
SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM final
GROUP BY source
ORDER BY source
"""


def q_snapshot_delete_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSITIONAL deletion vectors (sources.sinks.delete_from_snapshot
    mode="deletion-vector" — Delta DV / Iceberg v2 positional deletes):
    two DV deletes stack over the corpus with an append in between —
    each writes only a (file, row-index) sidecar (ZERO data files
    rewritten, dirs byte-identical across the commit, asserted from the
    manifests), reads drop the rows via one anti-join, the append's
    rows are untouched by the EARLIER vector (positional pins, not
    predicates), the overlapping second delete counts only newly-dead
    rows, and the closing compaction MATERIALIZES the vectors without
    changing content. Oracle: corpus + the insert batch minus both
    delete predicates."""
    import json
    import os

    from naru_spark.sources.sinks import (
        compact_snapshot,
        delete_from_snapshot,
        read_snapshot,
        write_snapshot,
    )

    OFFSET = 100_000_000  # divisible by 5: shifted ids keep doc_id % 5
    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    path = _tmpdir(prefix="docs_snap_dv_") + "/docs"
    mid = int(docs.agg(F.max("doc_id")).collect()[0][0]) // 2
    write_snapshot(docs.where(F.col("doc_id") <= mid), path)           # v1
    write_snapshot(docs.where(F.col("doc_id") > mid), path)            # v2
    info = delete_from_snapshot(spark, path, "doc_id % 7 = 0",
                                mode="deletion-vector")                # v3
    assert info["files_rewritten"] == 0 and info["n_deleted"] > 0, info
    with open(os.path.join(path, "_manifests", "v3.json")) as fh:
        man3 = json.load(fh)
    with open(os.path.join(path, "_manifests", "v2.json")) as fh:
        man2 = json.load(fh)
    assert man3["dirs"] == man2["dirs"]  # zero data files touched
    write_snapshot(
        docs.where(F.col("doc_id") % 11 == 0).select(
            (F.col("doc_id") + F.lit(OFFSET)).alias("doc_id"),
            F.lit("src_new").alias("source"), "n_chars",
        ),
        path,
    )                                                                  # v4
    # the appended rows are ALL untouched by v3's vector (positional
    # pins on pre-existing files, not predicates)
    assert read_snapshot(spark, path).where(
        F.col("doc_id") >= OFFSET  # doc_id 0 shifts to exactly OFFSET
    ).count() == docs.where(F.col("doc_id") % 11 == 0).count()
    info2 = delete_from_snapshot(spark, path, "doc_id % 5 = 0",
                                 mode="deletion-vector")               # v5
    # stacking: exactly the VISIBLE matching rows die — rows dead since
    # v3 (doc_id % 35 = 0 originals) are not re-counted even though the
    # raw files still hold them
    n_visible5 = read_snapshot(spark, path, version=4).where(
        "doc_id % 5 = 0").count()
    n_raw5 = (docs.where("doc_id % 5 = 0").count()
              + docs.where("doc_id % 11 = 0 AND doc_id % 5 = 0").count())
    assert info2["n_deleted"] == n_visible5 < n_raw5, (info2, n_visible5,
                                                       n_raw5)
    # materialization: content-invariant, plane cleared (DV-aware
    # selective pass — every entry here is under-sized and rewrites)
    cinfo = compact_snapshot(spark, path)
    assert cinfo["entries_carried"] == 0, cinfo
    with open(os.path.join(
        path, "_manifests", f"v{cinfo['version']}.json"
    )) as fh:
        assert "dvs" not in json.load(fh)
    return (
        read_snapshot(spark, path)
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("source")
    )


def sql_snapshot_delete_dv() -> str:
    return """
WITH merged AS (
  SELECT doc_id, source, n_chars FROM documents
  WHERE doc_id % 7 <> 0 AND doc_id % 5 <> 0
  UNION ALL
  SELECT doc_id + 100000000, 'src_new', n_chars FROM documents
  WHERE doc_id % 11 = 0 AND doc_id % 5 <> 0
)
SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM merged
GROUP BY source
ORDER BY source
"""


def q_snapshot_merge_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE SCHEMA EVOLUTION (merge_into_snapshot(schema_evolution=
    True) — Delta withSchemaEvolution): the changeset carries a NEW
    ``lang`` column; upserts stamp it on matched rows, inserts carry
    it, every untouched/target-only row surfaces NULL (additive, like
    the append path), and the change feed is exact through the evolved
    commit (pre-images NULL, post-images typed). Oracle: the same
    algebra in SQL with an explicit NULL lang for unmerged rows."""
    from naru_spark.sources.sinks import (
        merge_into_snapshot,
        read_snapshot,
        read_snapshot_changes,
        write_snapshot,
    )

    OFFSET = 100_000_000
    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    path = _tmpdir(prefix="docs_snap_mev_") + "/docs"
    write_snapshot(docs, path, cdf=True)                           # v1
    changes = (
        docs.where(F.col("doc_id") % 10 == 0)
        .select(
            "doc_id", "source",
            (F.col("n_chars") + 1).alias("n_chars"),
            F.lit("xx").alias("lang"),
            F.lit("U").alias("op"),
        )
        .unionByName(
            docs.where(F.col("doc_id") % 17 == 0).select(
                (F.col("doc_id") + F.lit(OFFSET)).alias("doc_id"),
                F.lit("src_new").alias("source"), "n_chars",
                F.lit("yy").alias("lang"), F.lit("U").alias("op"),
            )
        )
    )
    info = merge_into_snapshot(spark, path, changes, key="doc_id",
                               schema_evolution=True)              # v2
    assert info["n_changes"] > 0, info
    # CDF exact through the evolved commit: pre-images NULL, post 'xx'
    feed = read_snapshot_changes(spark, path, 1, 2, row_level=True)
    assert feed.where(
        "_change_type = 'update_preimage' AND lang IS NOT NULL"
    ).count() == 0
    assert feed.where(
        "_change_type = 'update_postimage' AND lang <> 'xx'"
    ).count() == 0
    assert feed.where(
        "_change_type = 'insert' AND lang <> 'yy'").count() == 0
    return (
        read_snapshot(spark, path, merge_schema=True)
        # NULL group keys sort differently across engines: label them
        .groupBy(F.coalesce(F.col("lang"), F.lit("none")).alias("lang"))
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("lang")
    )


def sql_snapshot_merge_evolve() -> str:
    return """
WITH final AS (
  SELECT doc_id, n_chars + 1 AS n_chars, 'xx' AS lang
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id, n_chars, 'none' AS lang
  FROM documents WHERE doc_id % 10 <> 0
  UNION ALL
  SELECT doc_id + 100000000, n_chars, 'yy' AS lang
  FROM documents WHERE doc_id % 17 = 0
)
SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM final
GROUP BY lang
ORDER BY lang
"""


def q_snapshot_days_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIDDEN PARTITIONING, days transform (write_snapshot(
    partition_by="days(o_orderdate)") — Iceberg's days() partition
    field): January-1995 orders land day-partitioned with NO
    materialized day column, then a DATE-RANGE read_snapshot_where
    prunes the out-of-range day entries on the manifest alone —
    counter-asserted via inputFiles (the pruned plan opens strictly
    fewer files than the full table). Oracle: the same range filter in
    SQL."""
    from naru_spark.sources.sinks import (
        read_snapshot,
        read_snapshot_where,
        write_snapshot,
    )

    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice"
    ).where("o_orderdate >= '1995-01-01' AND o_orderdate <= '1995-01-31'")
    path = _tmpdir(prefix="orders_snap_days_") + "/orders"
    write_snapshot(orders, path, partition_by="days(o_orderdate)")
    full_files = len(read_snapshot(spark, path).inputFiles())
    q = read_snapshot_where(
        spark, path,
        "o_orderdate >= '1995-01-10' AND o_orderdate <= '1995-01-20'",
    )
    pruned_files = len(q.inputFiles())
    assert 0 < pruned_files < full_files, (pruned_files, full_files)
    return (
        q.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("o_orderpriority")
    )


def sql_snapshot_days_transform() -> str:
    return """
SELECT o_orderpriority, COUNT(*) AS n,
       MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
FROM orders
WHERE o_orderdate >= DATE '1995-01-10' AND o_orderdate <= DATE '1995-01-20'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_snapshot_bucket_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIDDEN PARTITIONING, bucket transform (write_snapshot(
    partition_by="bucket(16,doc_id)") — Iceberg's bucket() field for
    high-cardinality keys): the corpus lands in 16 hash buckets, then a
    point/IN-list read_snapshot_where prunes to the buckets holding the
    probe keys (xxhash64 computed probe-side under the stamped dtype,
    exactly like the bloom sidecars) — counter-asserted via inputFiles.
    The auto-pruned DELETE composes on the same stamps. Oracle: the
    IN-list in SQL."""
    from naru_spark.sources.sinks import (
        delete_from_snapshot,
        read_snapshot,
        read_snapshot_where,
        write_snapshot,
    )

    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    path = _tmpdir(prefix="docs_snap_bucket_") + "/docs"
    write_snapshot(docs, path, partition_by="bucket(16,doc_id)")
    full_files = len(read_snapshot(spark, path).inputFiles())
    q = read_snapshot_where(spark, path, "doc_id IN (3, 44, 171)")
    pruned_files = len(q.inputFiles())
    assert 0 < pruned_files < full_files, (pruned_files, full_files)
    # DELETE rides the same bucket stamps (counter-asserted), and the
    # survivors re-commit under the same transformed spec
    info = delete_from_snapshot(spark, path, "doc_id = 9")
    assert info["n_deleted"] == 1 and info["entries_pruned"] >= 1, info
    out = read_snapshot_where(spark, path, "doc_id IN (3, 44, 171, 9)")
    return out.select("doc_id", "source", "n_chars").orderBy("doc_id")


def sql_snapshot_bucket_transform() -> str:
    return """
SELECT doc_id, source, n_chars
FROM documents
WHERE doc_id IN (3, 44, 171)
ORDER BY doc_id
"""


def q_snapshot_datasource_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``naru_snapshot`` Spark DataSource (sources/snapshot_source —
    the Spark 4 Python DataSource API over the manifest protocol): the
    corpus lands in two doc_id-range commits, then a plain
    ``spark.read.format("naru_snapshot").load(path).where(...)`` read
    lets CATALYST'S OWN pushed filters eliminate the out-of-range
    manifest entry (counter-asserted via planned partitions) — data
    skipping with zero hint plumbing, derived from the query plan
    itself. Oracle: the same range filter in SQL."""
    from naru_spark.sources.sinks import write_snapshot
    from naru_spark.sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    # a corpus QUARTER: the entry proves the integration (pushdown
    # skipping, manifest reads) — the data path crosses Python by
    # design, so don't pay the arrow transfer on the full corpus
    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    ).where("doc_id % 4 = 0")
    path = _tmpdir(prefix="docs_snap_ds_") + "/docs"
    mid = int(docs.agg(F.max("doc_id")).collect()[0][0]) // 2
    write_snapshot(docs.where(F.col("doc_id") <= mid), path)        # v1
    write_snapshot(docs.where(F.col("doc_id") > mid), path)         # v2
    # independent load() per frame: a filtered child shares its parent's
    # reader instance, so the pushed-filter hints would contaminate the
    # unfiltered baseline if measured afterwards
    n_full = (
        spark.read.format("naru_snapshot").load(path)
        .rdd.getNumPartitions()
    )
    cut = mid // 2
    q = spark.read.format("naru_snapshot").load(path).where(
        f"doc_id <= {cut}"
    )
    assert q.rdd.getNumPartitions() < n_full, (
        q.rdd.getNumPartitions(), n_full
    )
    return (
        q.groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("source")
    )


def sql_snapshot_datasource_read() -> str:
    return """
WITH q AS (SELECT * FROM documents WHERE doc_id % 4 = 0),
cut AS (SELECT (MAX(doc_id) // 2) // 2 AS c FROM q)
SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM q, cut
WHERE doc_id <= cut.c
GROUP BY source
ORDER BY source
"""


def q_stream_snapshot_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM from a snapshot table through the ``naru_snapshot``
    DataSource (``spark.readStream.format(...)``): offsets are manifest
    VERSIONS checkpointed by Structured Streaming — the first
    availableNow drain serves v1, the second serves exactly the commits
    landed since (O(delta), exactly-once across restarts; a third drain
    with no new commits emits nothing). Oracle: the final table
    content, aggregated."""
    from naru_spark.sources.sinks import write_snapshot
    from naru_spark.sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    ).where("doc_id % 4 = 0")  # integration proof, not a transfer bench
    root = _tmpdir(prefix="docs_snap_dss_")
    path = root + "/docs"
    mid = int(docs.agg(F.max("doc_id")).collect()[0][0]) // 2
    write_snapshot(docs.where(F.col("doc_id") <= mid), path)        # v1
    outp, ckpt = root + "/out", root + "/ckpt"

    def drain():
        _await_drain(lambda: (
            spark.readStream.format("naru_snapshot").load(path)
            .writeStream.foreachBatch(
                lambda b, i: b.write.mode("append").parquet(outp)
            )
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        ))

    drain()
    n1 = spark.read.parquet(outp).count()
    write_snapshot(docs.where(F.col("doc_id") > mid), path)         # v2
    drain()
    got = spark.read.parquet(outp)
    n2 = got.count()
    assert n1 < n2 == docs.count(), (n1, n2)
    drain()  # no new commits: nothing re-served
    assert spark.read.parquet(outp).count() == n2
    return (
        got.groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("source")
    )


def sql_stream_snapshot_datasource() -> str:
    return """
SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM documents
WHERE doc_id % 4 = 0
GROUP BY source
ORDER BY source
"""


def q_stream_snapshot_datasource_sink(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Snapshot tables as a Structured Streaming SINK
    (``writeStream.format("naru_snapshot")`` — the write side of the
    Python DataSource): a file stream of the corpus drains into a
    snapshot table with each micro-batch committing one version under
    a ``<app>:<batchId>`` txn id, so a re-drain with the same
    checkpoint re-commits NOTHING (exactly-once by content, asserted)
    — the foreachBatch ingest idiom with zero foreachBatch code.
    Oracle: the corpus aggregated."""
    from naru_spark.sources.sinks import read_snapshot, snapshot_history
    from naru_spark.sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    ).where("doc_id % 4 = 0")  # integration proof, not a transfer bench
    root = _tmpdir(prefix="docs_snap_dsw_")
    src, sink, ckpt = root + "/src", root + "/sink", root + "/ckpt"
    docs.write.parquet(src)

    schema = spark.read.parquet(src).schema

    def drain():
        _await_drain(lambda: (
            spark.readStream.schema(schema).parquet(src)
            .writeStream.format("naru_snapshot")
            .option("partitionBy", "source")  # stamped identity leaves
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start(sink)
        ))

    drain()
    n1 = read_snapshot(spark, sink).count()
    drain()  # same checkpoint: txn replay, zero new rows
    assert read_snapshot(spark, sink).count() == n1 == docs.count()
    assert all(h["op"] == "append" for h in snapshot_history(sink))
    # the sink's commits carry partition stamps: reads prune on them
    from naru_spark.sources.sinks import read_snapshot_where

    one_src = docs.select("source").first()["source"]
    pruned = read_snapshot_where(spark, sink, f"source = '{one_src}'")
    assert 0 < len(pruned.inputFiles()) < len(
        read_snapshot(spark, sink).inputFiles()
    ), one_src
    return (
        read_snapshot(spark, sink)
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("source")
    )


def sql_stream_snapshot_datasource_sink() -> str:
    return """
SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM documents
WHERE doc_id % 4 = 0
GROUP BY source
ORDER BY source
"""


def q_snapshot_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only table stats per snapshot version
    (sources.sinks.snapshot_stats — Iceberg's snapshots metadata table):
    the corpus is committed in three deterministic slices (doc_id % 3),
    then each version's exact row count is answered from the MANIFEST's
    per-entry stats stamped at commit — zero data reads, zero file
    listings. The oracle recomputes the cumulative slice counts from the
    raw corpus, so the stamped stats themselves are hash-verified."""
    from naru_spark.sources.sinks import snapshot_stats, write_snapshot

    docs = _load(spark, sf_dir, "documents").select("doc_id", "source")
    path = _tmpdir(prefix="docs_snap_stats_") + "/docs"
    for k in range(3):
        write_snapshot(docs.filter(F.col("doc_id") % 3 == k), path)
    rows = []
    for v in (1, 2, 3):
        s = snapshot_stats(path, version=v)
        assert s["n_bytes"] > 0 and s["n_files"] >= s["n_entries"] >= v, s
        rows.append((v, int(s["n_rows"])))
    return spark.createDataFrame(rows, "version int, n_rows long")


def sql_snapshot_stats() -> str:
    return """
SELECT v.version, (SELECT COUNT(*) FROM documents
                   WHERE doc_id % 3 < v.version) AS n_rows
FROM (VALUES (1), (2), (3)) AS v(version)
ORDER BY v.version
"""


def q_snapshot_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHALLOW CLONE (sources.sinks.clone_snapshot — Delta SHALLOW
    CLONE): the corpus table forks METADATA-ONLY into a second table —
    zero bytes copied (the clone's data tree is empty, asserted), the
    clone reads the source's files through its own v1 manifest, and the
    two evolve independently afterwards (an append to the clone and a
    DELETE on the source are invisible to each other, asserted). The
    oracle replays corpus + the clone's own append; content equality
    with the source AT THE CLONE POINT is asserted live."""
    import os

    from naru_spark.sources.sinks import (
        clone_snapshot,
        delete_from_snapshot,
        read_snapshot,
        write_snapshot,
    )

    OFFSET = 100_000_000
    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    base = _tmpdir(prefix="docs_snap_clone_")
    src, dst = base + "/src", base + "/fork"
    write_snapshot(docs, src)                                          # src v1
    assert clone_snapshot(src, dst) == 1                               # dst v1
    # zero data copied: the clone's own data tree is empty
    assert os.listdir(os.path.join(dst, "data")) == []
    assert read_snapshot(spark, dst).count() == docs.count()
    # independent evolution: clone appends, source deletes — invisible
    # to each other
    write_snapshot(
        docs.where(F.col("doc_id") % 9 == 0).select(
            (F.col("doc_id") + F.lit(OFFSET)).alias("doc_id"),
            F.lit("src_fork").alias("source"), "n_chars",
        ),
        dst,
    )                                                                  # dst v2
    delete_from_snapshot(spark, src, "doc_id % 2 = 0")                 # src v2
    assert read_snapshot(spark, src).count() == docs.where(
        "doc_id % 2 <> 0").count()
    assert read_snapshot(spark, dst).where(
        F.col("doc_id") < OFFSET).count() == docs.count()
    return (
        read_snapshot(spark, dst)
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("source")
    )


def sql_snapshot_clone() -> str:
    return """
WITH merged AS (
  SELECT doc_id, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 100000000, 'src_fork', n_chars FROM documents
  WHERE doc_id % 9 = 0
)
SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM merged
GROUP BY source
ORDER BY source
"""


def q_snapshot_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only column statistics (sources.sinks.
    snapshot_column_stats — Iceberg table.files / Delta stats-query
    analog): the table-level per-column [min, max] folds from the
    manifest's stamped per-entry column ranges on ONE manifest read —
    zero data I/O, the surface an external CBO or freshness monitor
    reads instead of scanning. Three slice commits, then the folded
    ranges for the four short columns must equal the true MIN/MAX the
    oracle computes by scanning."""
    from naru_spark.sources.sinks import (
        snapshot_column_stats,
        write_snapshot,
    )

    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    path = _tmpdir(prefix="docs_snap_colstats_") + "/docs"
    for k in range(3):
        write_snapshot(docs.filter(F.col("doc_id") % 3 == k), path)
    stats = snapshot_column_stats(path)
    rows = [
        (c, str(stats[c][0]), str(stats[c][1]))
        for c in ("doc_id", "lang", "n_chars", "source")
    ]
    return spark.createDataFrame(
        rows, "col string, lo string, hi string"
    ).orderBy("col")


def sql_snapshot_column_stats() -> str:
    return """
WITH s AS (
  SELECT 'doc_id' AS col, CAST(MIN(doc_id) AS VARCHAR) AS lo,
         CAST(MAX(doc_id) AS VARCHAR) AS hi FROM documents
  UNION ALL
  SELECT 'lang', MIN(lang), MAX(lang) FROM documents
  UNION ALL
  SELECT 'n_chars', CAST(MIN(n_chars) AS VARCHAR),
         CAST(MAX(n_chars) AS VARCHAR) FROM documents
  UNION ALL
  SELECT 'source', MIN(source), MAX(source) FROM documents
)
SELECT col, lo, hi FROM s ORDER BY col
"""


def q_snapshot_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta RESTORE TABLE TO VERSION (sources.sinks.restore_snapshot):
    the corpus commits in two slices, a copy-on-write DELETE removes
    rows (v3), and RESTORE to v2 brings the FULL corpus back as the new
    head (v4) — METADATA-ONLY, asserted inline: the restore commit adds
    zero data directories, the post-delete head stays time-travelable,
    and a second restore (to v3's state) undoes the first. The oracle is
    the plain corpus aggregate — the delete must leave no trace in the
    restored head."""
    import os

    from naru_spark.sources.sinks import (
        delete_from_snapshot,
        read_snapshot,
        restore_snapshot,
        write_snapshot,
    )

    docs = _load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    path = _tmpdir(prefix="docs_snap_restore_") + "/docs"
    write_snapshot(docs.where(F.col("doc_id") % 2 == 0), path)          # v1
    write_snapshot(docs.where(F.col("doc_id") % 2 == 1), path)          # v2
    n_all = docs.count()
    delete_from_snapshot(spark, path, "doc_id % 7 = 0")                 # v3
    assert read_snapshot(spark, path, version=3).count() < n_all

    data_root = os.path.join(path, "data")
    dirs_before = sorted(os.listdir(data_root))
    v = restore_snapshot(path, 2)                                       # v4
    assert v == 4
    assert sorted(os.listdir(data_root)) == dirs_before  # metadata-only
    assert read_snapshot(spark, path).count() == n_all
    # the deleted head stays time-travelable, and restoring to it
    # undoes the restore
    assert read_snapshot(spark, path, version=3).count() < n_all
    restore_snapshot(path, 3)                                           # v5
    assert read_snapshot(spark, path).count() < n_all
    restore_snapshot(path, 4)                                           # v6
    return (
        read_snapshot(spark, path)
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("source")
    )


def sql_snapshot_restore() -> str:
    return """
SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY source
ORDER BY source
"""


def q_snapshot_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE HISTORY (sources.sinks.snapshot_history — Delta history /
    Iceberg snapshots metadata table): three deterministic slice commits,
    one metadata-only merge-on-read delete, then a RESTORE to v3; every
    version's exact row count, pending-delete count, and OPERATION
    metadata (Delta's operation / operationParameters — what
    distinguishes the restore from a plain replace) come from the
    MANIFESTS alone (zero data reads — the stamped stats and op stamps
    are what the oracle hash-verifies; the restore drops the pending
    predicate because v3 predates it)."""
    from naru_spark.sources.sinks import (
        delete_from_snapshot,
        restore_snapshot,
        snapshot_history,
        write_snapshot,
    )

    docs = _load(spark, sf_dir, "documents").select("doc_id", "source")
    path = _tmpdir(prefix="docs_snap_history_") + "/docs"
    for k in range(3):
        write_snapshot(docs.filter(F.col("doc_id") % 3 == k), path)
    delete_from_snapshot(spark, path, "doc_id % 5 = 0",
                         mode="merge-on-read")                          # v4
    restore_snapshot(path, 3)                                           # v5
    hist = snapshot_history(path)
    assert [h["version"] for h in hist] == [1, 2, 3, 4, 5]
    assert all(h["ts"] is not None and h["n_files"] > 0 for h in hist)
    # op params are stamped too (zero-I/O, straight from the manifest)
    by_v = {h["version"]: h for h in hist}
    assert by_v[4]["op_params"]["condition"] == "doc_id % 5 = 0", by_v[4]
    assert by_v[5]["op_params"]["to_version"] == 3, by_v[5]
    return spark.createDataFrame(
        [(h["version"], h["op"], h["n_rows"], h["n_delete_preds"])
         for h in hist],
        "version int, op string, n_rows long, n_delete_preds int",
    )


def sql_snapshot_history() -> str:
    return """
SELECT v.version, v.op,
       (SELECT COUNT(*) FROM documents
        WHERE doc_id % 3 < LEAST(v.version, 3)) AS n_rows,
       CASE WHEN v.version = 4 THEN 1 ELSE 0 END AS n_delete_preds
FROM (VALUES (1, 'append'), (2, 'append'), (3, 'append'),
             (4, 'delete'), (5, 'restore')) AS v(version, op)
ORDER BY v.version
"""


def _build_cdf_table(spark: SparkSession, sf_dir: str, path: str) -> int:
    """Shared fixture for the change-data-feed entries: a cdf-enabled,
    lang-partitioned snapshot table driven through the full
    row-mutating commit vocabulary — v1 append, v2 MERGE (update /
    delete / insert), v3 replace_where on the 'en' partition (a REPLACE
    commit), v4 metadata-only merge-on-read delete. Every step is a
    deterministic function of the documents table so plain SQL can
    replay both the per-commit change rows and the final state.
    Returns the latest version (4)."""
    from naru_spark.sources.sinks import (
        delete_from_snapshot,
        merge_into_snapshot,
        replace_where,
        write_snapshot,
    )

    OFFSET = 100_000_000
    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    write_snapshot(docs, path, partition_by="lang", cdf=True)         # v1
    updates = (
        docs.where(F.col("doc_id") % 5 == 0)
        .withColumn("n_chars", F.col("n_chars") + 1000)
        .withColumn("op", F.lit("U"))
    )
    deletes = (
        docs.where((F.col("doc_id") % 11 == 0) & (F.col("doc_id") % 5 != 0))
        .withColumn("op", F.lit("D"))
    )
    inserts = docs.where(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + F.lit(OFFSET)).alias("doc_id"),
        "lang", "n_chars", F.lit("U").alias("op"),
    )
    merge_into_snapshot(
        spark, path, updates.unionByName(deletes).unionByName(inserts),
        key="doc_id",
    )                                                                  # v2
    new_en = (
        docs.where((F.col("lang") == "en") & (F.col("doc_id") % 2 == 0))
        .withColumn("n_chars", F.col("n_chars") + 5000)
    )
    replace_where(spark, path, new_en, "lang", ["en"])                 # v3
    delete_from_snapshot(spark, path, "doc_id % 3 = 0",
                         mode="merge-on-read")                         # v4
    return 4


# the staged replay both CDF oracles build on: state after each commit of
# _build_cdf_table, as plain SQL over the documents table
_CDF_STAGES = """
WITH base AS (SELECT doc_id, lang, n_chars FROM documents),
upd_pre AS (SELECT * FROM base WHERE doc_id % 5 = 0),
upd_post AS (SELECT doc_id, lang, n_chars + 1000 AS n_chars FROM base
             WHERE doc_id % 5 = 0),
del_rows AS (SELECT * FROM base
             WHERE doc_id % 11 = 0 AND doc_id % 5 <> 0),
ins AS (SELECT doc_id + 100000000 AS doc_id, lang, n_chars FROM base
        WHERE doc_id % 13 = 0),
after_v2 AS (
  SELECT * FROM base
  WHERE doc_id % 5 <> 0 AND NOT (doc_id % 11 = 0)
  UNION ALL SELECT * FROM upd_post
  UNION ALL SELECT * FROM ins
),
new_en AS (SELECT doc_id, lang, n_chars + 5000 AS n_chars FROM base
           WHERE lang = 'en' AND doc_id % 2 = 0),
v3_del AS (SELECT * FROM after_v2 WHERE lang = 'en'),
after_v3 AS (
  SELECT * FROM after_v2 WHERE lang <> 'en'
  UNION ALL SELECT * FROM new_en
),
v4_del AS (SELECT * FROM after_v3 WHERE doc_id % 3 = 0),
final AS (SELECT * FROM after_v3 WHERE doc_id % 3 <> 0)
"""


def q_snapshot_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level CHANGE DATA FEED (sources.sinks.read_snapshot_changes
    (row_level=True) — Delta CDF): the cdf table's full history reads
    back as typed change rows — append inserts from the data files,
    MERGE's persisted delete/update_preimage/update_postimage/insert
    plane, replace_where reconstructed from the manifest diff (THROUGH
    a replace commit the file-level path refuses — asserted), and the
    merge-on-read delete's matched rows persisted at delete time while
    its data plane stayed metadata-only. The oracle replays every
    commit's change rows in plain SQL."""
    from naru_spark.sources.sinks import read_snapshot_changes

    path = _tmpdir(prefix="docs_snap_cdf_") + "/docs"
    latest = _build_cdf_table(spark, sf_dir, path)
    # the file-level fast path refuses across the v3 replace...
    try:
        read_snapshot_changes(spark, path, 1)
        raise AssertionError("file-level read must refuse across replace")
    except ValueError:
        pass
    # ...the row-level feed serves the whole range
    out = read_snapshot_changes(spark, path, 0, to_version=latest,
                                row_level=True)
    assert out.where("_commit_timestamp IS NULL").count() == 0
    return (
        out.groupBy(
            F.col("_commit_version").alias("commit_version"),
            F.col("_change_type").alias("change_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("commit_version", "change_type")
    )


def sql_snapshot_cdf() -> str:
    return _CDF_STAGES + """
, all_changes AS (
  SELECT 1 AS commit_version, 'insert' AS change_type, doc_id, n_chars
  FROM base
  UNION ALL SELECT 2, 'delete', doc_id, n_chars FROM del_rows
  UNION ALL SELECT 2, 'insert', doc_id, n_chars FROM ins
  UNION ALL SELECT 2, 'update_preimage', doc_id, n_chars FROM upd_pre
  UNION ALL SELECT 2, 'update_postimage', doc_id, n_chars FROM upd_post
  UNION ALL SELECT 3, 'delete', doc_id, n_chars FROM v3_del
  UNION ALL SELECT 3, 'insert', doc_id, n_chars FROM new_en
  UNION ALL SELECT 4, 'delete', doc_id, n_chars FROM v4_del
)
SELECT commit_version, change_type, COUNT(*) AS n,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM all_changes
GROUP BY commit_version, change_type
ORDER BY commit_version, change_type
"""


def q_stream_snapshot_follow_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downstream replica following the change data feed THROUGH a
    replace commit (the consumer shape today's file-stream follower
    refuses): starting from a full read of v1, each new version's
    row-level changes are applied incrementally — anti-join out the
    delete/update_preimage keys, union in the insert/update_postimage
    rows — exactly the Delta CDF -> foreachBatch apply pattern. Each
    step is O(that commit's changes), never a table rescan; manifests
    are the polling source (the documented scale path past file
    listings). The oracle is the FINAL table state — the replica must
    converge to it through the merge, the partition replace, and the
    metadata-only merge-on-read delete."""
    from naru_spark.sources.sinks import (
        _latest_version,
        read_snapshot,
        read_snapshot_changes,
    )

    path = _tmpdir(prefix="docs_snap_cdff_") + "/docs"
    _build_cdf_table(spark, sf_dir, path)
    import os

    latest = _latest_version(os.path.join(path, "_manifests"))
    replica = read_snapshot(spark, path, version=1)
    cols = replica.columns
    for v in range(2, latest + 1):  # poll one version at a time
        ch = read_snapshot_changes(spark, path, v - 1, to_version=v,
                                   row_level=True)
        removals = ch.where(
            F.col("_change_type").isin("delete", "update_preimage")
        ).select("doc_id").distinct()
        upserts = ch.where(
            F.col("_change_type").isin("insert", "update_postimage")
        ).select(*cols)
        replica = (
            replica.join(removals, "doc_id", "left_anti")
            .unionByName(upserts)
        )
    # the replica converged to the table's latest state
    expect = read_snapshot(spark, path).count()
    got = replica.count()
    assert got == expect, (got, expect)
    return (
        replica.groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("lang")
    )


def sql_stream_snapshot_follow_cdf() -> str:
    return _CDF_STAGES + """
SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM final
GROUP BY lang
ORDER BY lang
"""


def q_stream_snapshot_follow_cdf_ts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The CDF follower bootstrapped from a WALL-CLOCK, not a version
    number (Delta ``startingTimestamp`` composed end-to-end): the
    replica starts from ``read_snapshot(as_of=t1)`` (v1's commit
    stamp), pulls ONE ``read_snapshot_changes(from_ts=t1,
    row_level=True)`` frame, and applies it version-group by
    version-group — no version identifiers anywhere in the consumer,
    which is what a downstream system that only knows 'when it last
    synced' actually does. Both endpoints resolve through the same
    monotone commit stamps, so bootstrap and feed can never overlap or
    gap. Shares stream_snapshot_follow_cdf's oracle (the final table
    state)."""
    import json
    import os

    from naru_spark.sources.sinks import (
        read_snapshot,
        read_snapshot_changes,
    )

    path = _tmpdir(prefix="docs_snap_cdfts_") + "/docs"
    _build_cdf_table(spark, sf_dir, path)
    with open(os.path.join(path, "_manifests", "v1.json")) as fh:
        t1 = float(json.load(fh)["ts"])
    replica = read_snapshot(spark, path, as_of=t1)
    cols = replica.columns
    ch_all = read_snapshot_changes(spark, path, from_ts=t1,
                                   row_level=True)
    versions = sorted(
        r["_commit_version"]
        for r in ch_all.select("_commit_version").distinct().collect()
    )
    for v in versions:
        ch = ch_all.where(F.col("_commit_version") == v)
        removals = ch.where(
            F.col("_change_type").isin("delete", "update_preimage")
        ).select("doc_id").distinct()
        upserts = ch.where(
            F.col("_change_type").isin("insert", "update_postimage")
        ).select(*cols)
        replica = (
            replica.join(removals, "doc_id", "left_anti")
            .unionByName(upserts)
        )
    expect = read_snapshot(spark, path).count()
    got = replica.count()
    assert got == expect, (got, expect)
    return (
        replica.groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("lang")
    )


def q_stream_snapshot_cdf_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The change data feed as a REAL Structured Streaming source
    (``readStream.format("naru_snapshot").option("readChangeFeed",
    "true")`` — Delta's CDC-stream idiom): the full commit vocabulary
    (append, MERGE with its persisted change plane, a replace_where
    REPLACE commit served from the manifest diff, a metadata-only
    merge-on-read delete served from its change plane) streams as typed
    change rows with checkpointed version offsets. The consumer shape
    is the real one: bootstrap from a snapshot read of v1, stream ONLY
    the changes after it (``startingVersion`` — the feed carries
    O(changes), the Python hop never carries the corpus), fold, and
    converge to the table's final state. Shares the poll-based
    follower's oracle (the final table, aggregated)."""
    from naru_spark.sources.sinks import read_snapshot
    from naru_spark.sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    root = _tmpdir(prefix="docs_snap_cdfsrc_")
    path = root + "/docs"
    _build_cdf_table(spark, sf_dir, path)
    out, ckpt = root + "/feed", root + "/ckpt"
    _await_drain(lambda: (
        spark.readStream.format("naru_snapshot")
        .option("readChangeFeed", "true")
        .option("startingVersion", 2).load(path)  # Delta-inclusive
        .writeStream.foreachBatch(
            lambda b, i: b.write.mode("append").parquet(out)
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    ))
    feed = spark.read.parquet(out)
    cols = ["doc_id", "lang", "n_chars"]
    versions = sorted(
        r["_commit_version"]
        for r in feed.select("_commit_version").distinct().collect()
    )
    assert versions and versions[0] > 1, versions  # bootstrap not re-fed
    # bootstrap from the snapshot, fold ONLY the streamed changes
    replica = read_snapshot(spark, path, version=1).select(*cols)
    for v in versions:
        ch = feed.where(F.col("_commit_version") == v)
        removals = ch.where(
            F.col("_change_type").isin("delete", "update_preimage")
        ).select("doc_id").distinct()
        upserts = ch.where(
            F.col("_change_type").isin("insert", "update_postimage")
        ).select(*cols)
        replica = (
            replica.join(removals, "doc_id", "left_anti")
            .unionByName(upserts)
        )
    expect = read_snapshot(spark, path).count()
    got = replica.count()
    assert got == expect, (got, expect)
    return (
        replica.groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("lang")
    )


def q_snapshot_cdf_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance from the change data feed
    (sources.sinks.apply_cdf_to_aggregate — the CDF's raison d'être at
    100 TB): a per-language COUNT+SUM view bootstraps from v1 and is
    then refreshed ONLY from each version's row-level change rows (+1
    for insert/update_postimage, -1 for delete/update_preimage) through
    the MERGE, the replace_where REPLACE commit, and the metadata-only
    merge-on-read delete — each refresh reads O(that commit's CHANGED
    bytes) (change planes, or the replaced partition's entries for the
    replace reconstruction), never a table rescan. Oracle: the plain
    groupBy of the FINAL table state — the folds must converge to it
    exactly (asserted inline against a live recompute too)."""
    from naru_spark.sources.sinks import (
        apply_cdf_to_aggregate,
        read_snapshot,
        read_snapshot_changes,
    )

    path = _tmpdir(prefix="docs_snap_cdfivm_") + "/docs"
    latest = _build_cdf_table(spark, sf_dir, path)
    view = (
        read_snapshot(spark, path, version=1)
        .groupBy("lang")
        .agg(F.count("*").alias("n"),
             F.sum("n_chars").alias("sum_n_chars"))
    ).localCheckpoint(eager=True)  # the bootstrap: the ONE full read
    for v in range(2, latest + 1):
        ch = read_snapshot_changes(spark, path, v - 1, to_version=v,
                                   row_level=True)
        view = apply_cdf_to_aggregate(
            view, ch, keys=["lang"], sums=["n_chars"]
        ).localCheckpoint(eager=True)  # pin each refresh (tiny: |langs|)
    # the maintained view equals a full recompute of the final state
    expect = {
        (r["lang"]): (r["n"], r["s"])
        for r in read_snapshot(spark, path).groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("s"))
        .collect()
    }
    got = {r["lang"]: (r["n"], r["sum_n_chars"]) for r in view.collect()}
    assert got == expect, (got, expect)
    return (
        view.select(
            "lang", F.col("n"),
            F.col("sum_n_chars").alias("sum_chars"),
        ).orderBy("lang")
    )


def sql_snapshot_cdf_ivm() -> str:
    return _CDF_STAGES + """
SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM final
GROUP BY lang
ORDER BY lang
"""


def q_snapshot_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The snapshot table's maintenance decision loop
    (sources.sinks.maintain_snapshot — Delta auto-OPTIMIZE shape,
    the storage twin of the serving indexes' maintain entries): three
    fragmented ingest commits, then ONE maintenance call measures file
    count against the right-sized target from the manifest (metadata
    only) and triggers exactly one compaction; a second call on the
    now-compact table is a no-op. Asserted inline; pre-compaction
    history stays time-travelable. Content invariance is the
    correctness claim — the oracle aggregates the raw corpus."""
    from naru_spark.sources.sinks import (
        maintain_snapshot,
        read_snapshot,
        write_snapshot,
    )

    docs = _load(spark, sf_dir, "documents").select("doc_id", "source", "lang", "n_chars")
    path = _tmpdir(prefix="docs_snap_maintain_") + "/docs"
    for k in range(3):
        # repartition(6) forces small files: 18 across 3 commits
        write_snapshot(docs.filter(F.col("doc_id") % 3 == k).repartition(6), path)
    res = maintain_snapshot(spark, path, merge_factor=2)
    assert res["action"] == "compact" and res["files_after"] < res["files"], res
    res2 = maintain_snapshot(spark, path, merge_factor=2)
    assert res2["action"] == "noop", res2
    assert read_snapshot(spark, path, version=3).count() == docs.count()
    return (
        read_snapshot(spark, path)
        .groupBy("source", "lang")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("source", "lang")
    )


def q_snapshot_optimize_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ... ZORDER BY inside the maintenance loop
    (sources.sinks.maintain_snapshot(zorder_by=...) — Delta auto-OPTIMIZE
    with a clustering spec): three fragmented ingest commits trip the
    file-count policy, and the triggered rewrite routes through the
    Morton-interleave clustering instead of plain coalesce — same rewrite
    I/O, one extra range-exchange shuffle, and every compacted file now
    covers a small (doc_id, n_chars) hyper-rectangle. Asserted inline
    against a plain-coalesce twin over the same commits: the z-ordered
    layout's parquet FOOTER min/max stats prune strictly more files for
    a 2-D box (the mechanism the file-pruned DELETE and every scan use).
    Clustering never changes content — the entry shares compaction's
    content-invariance oracle."""
    from naru_spark.sources.sinks import (
        file_skip_fraction,
        maintain_snapshot,
        read_snapshot,
        snapshot_stats,
        write_snapshot,
    )

    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    )
    base = _tmpdir(prefix="docs_snap_zorder_")
    zpath, ppath = base + "/z", base + "/plain"
    for path in (zpath, ppath):
        for k in range(3):
            write_snapshot(docs.filter(F.col("doc_id") % 3 == k).repartition(6), path)
    # right-size to ~12 files at every SF so the skip audit has files to
    # prune (metadata-only: bytes come from the manifest stats)
    tfb = max(1, snapshot_stats(zpath)["n_bytes"] // 12)
    res_z = maintain_snapshot(
        spark, zpath, merge_factor=1, target_file_bytes=tfb,
        zorder_by=["doc_id", "n_chars"],
    )
    res_p = maintain_snapshot(spark, ppath, merge_factor=1, target_file_bytes=tfb)
    assert res_z["action"] == res_p["action"] == "compact", (res_z, res_p)

    def compacted_dir(path: str) -> str:
        import json
        import os

        man_dir = os.path.join(path, "_manifests")
        latest = max(
            int(f[1:-5]) for f in os.listdir(man_dir)
            if f.startswith("v") and f.endswith(".json")
        )
        with open(os.path.join(man_dir, f"v{latest}.json")) as fh:
            dirs = json.load(fh)["dirs"]
        assert len(dirs) == 1, dirs  # replace commit: one rewritten dir
        return dirs[0]

    # a mid-range 2-D box: the clustered layout must touch strictly fewer
    # files than the coalesced one (which preserves ingest order)
    row = docs.agg(
        F.min("doc_id").alias("dlo"), F.max("doc_id").alias("dhi"),
        F.min("n_chars").alias("clo"), F.max("n_chars").alias("chi"),
    ).collect()[0]
    box = {
        "doc_id": (row["dlo"] + 0.40 * (row["dhi"] - row["dlo"]),
                   row["dlo"] + 0.55 * (row["dhi"] - row["dlo"])),
        "n_chars": (row["clo"] + 0.40 * (row["chi"] - row["clo"]),
                    row["clo"] + 0.55 * (row["chi"] - row["clo"])),
    }
    zm, zt = file_skip_fraction(spark, compacted_dir(zpath), box)
    pm, pt = file_skip_fraction(spark, compacted_dir(ppath), box)
    if pt >= 8:  # enough files for skipping to be measurable at this SF
        assert zm / zt < pm / pt, (zm, zt, pm, pt)
    return (
        read_snapshot(spark, zpath)
        .groupBy("source", "lang")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("source", "lang")
    )


def q_snapshot_optimize_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped OPTIMIZE (sources.sinks.compact_snapshot /
    maintain_snapshot ``partitions={col: [values]}`` — Delta
    ``OPTIMIZE ... WHERE``): the corpus lands lang-partitioned, three
    fragmented appends hit ONLY the 'en' partition, and one scoped pass
    re-clusters (ZORDER) and compacts exactly the 'en' entries — every
    other language's entry carries byte-identical (asserted against the
    manifests), so at 100 TB re-laying-out one hot partition costs that
    partition's bytes, never the table. Partition pruning still plans
    footer-free after the rewrite. Content invariance is the
    correctness claim — the oracle replays corpus + the three appends."""
    import json
    import os

    from naru_spark.sources.sinks import (
        compact_snapshot,
        maintain_snapshot,
        read_snapshot,
        write_snapshot,
    )

    OFFSET = 100_000_000
    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    path = _tmpdir(prefix="docs_snap_optw_") + "/docs"
    write_snapshot(docs, path, partition_by="lang")                    # v1
    en = docs.where(F.col("lang") == "en")
    for k in (1, 2, 3):  # fragment ONLY the en partition
        write_snapshot(
            en.select(
                (F.col("doc_id") + F.lit(k * OFFSET)).alias("doc_id"),
                "lang",
                (F.col("n_chars") + F.lit(k)).alias("n_chars"),
            ).repartition(4),
            path, partition_by="lang",
        )                                                        # v2..v4
    man_dir = os.path.join(path, "_manifests")
    with open(os.path.join(man_dir, "v4.json")) as fh:
        man4 = json.load(fh)
    other = [e for e in man4["dirs"] if not e.endswith("__part_lang=en")]
    info = compact_snapshot(spark, path, partitions={"lang": ["en"]},
                            zorder_by=["doc_id"])
    # every non-en entry carried VERBATIM; only en entries rewrote
    assert info["mode"] == "selective", info
    assert info["entries_carried"] == len(other), info
    with open(os.path.join(man_dir, f"v{info['version']}.json")) as fh:
        man5 = json.load(fh)
    assert all(e in man5["dirs"] for e in other)
    # the rewrite kept the partition spec: scoped maintenance now no-ops
    # and a partition-pruned read plans only en entries, footer-free
    res = maintain_snapshot(spark, path, merge_factor=2,
                            partitions={"lang": ["en"]})
    assert res["action"] == "noop", res
    pruned = read_snapshot(spark, path, partitions={"lang": ["en"]})
    assert all("__part_lang=en" in f for f in pruned.inputFiles())
    return (
        read_snapshot(spark, path)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("lang")
    )


def sql_snapshot_optimize_partition() -> str:
    return """
WITH merged AS (
  SELECT doc_id, lang, n_chars FROM documents
  UNION ALL
  SELECT d.doc_id + 100000000 * g.k, d.lang, d.n_chars + g.k
  FROM documents d, (VALUES (1), (2), (3)) AS g(k)
  WHERE d.lang = 'en'
)
SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM merged
GROUP BY lang
ORDER BY lang
"""


def q_merge_into_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level MERGE INTO (operators.merge.merge_into — the
    Delta/Iceberg CDC apply as ONE keyed full-outer join): a
    deterministic changeset against documents — doc_id % 13 == 0
    deleted, else % 7 == 0 updated (n_chars recomputed +1000), plus
    brand-new inserted ids above the current max — then the merged table
    is aggregated per source. The oracle replays MERGE semantics in
    plain SQL (anti-join the deletes, coalesce updates over base, union
    the inserts), so matched-update / matched-delete / unmatched-insert
    all hash-verify."""
    from naru_spark.operators.merge import merge_into

    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    )
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    deletes = docs.filter(F.col("doc_id") % 13 == 0).select(
        "doc_id", "source", "lang", "n_chars", F.lit("D").alias("op")
    )
    updates = (
        docs.filter((F.col("doc_id") % 13 != 0) & (F.col("doc_id") % 7 == 0))
        .withColumn("n_chars", F.col("n_chars") + 1000)
        .select("doc_id", "source", "lang", "n_chars", F.lit("U").alias("op"))
    )
    inserts = (
        docs.filter(F.col("doc_id") % 11 == 0)
        .select(
            (F.col("doc_id") + F.lit(int(max_id) + 1)).alias("doc_id"),
            F.lit("src_new").alias("source"),
            "lang",
            "n_chars",
            F.lit("U").alias("op"),
        )
    )
    changes = deletes.unionByName(updates).unionByName(inserts)
    # deletes/updates/inserts are key-disjoint by construction
    # (%13==0 vs %13!=0&%7==0 vs shifted-above-max ids), so skip the
    # validator's extra changeset aggregation job
    merged = merge_into(docs, changes, key="doc_id", validate=False)
    return (
        merged.groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("source")
    )


def sql_merge_into_cdc() -> str:
    return """
WITH m AS (SELECT MAX(doc_id) AS mx FROM documents),
base AS (SELECT doc_id, source, lang, n_chars FROM documents),
merged AS (
  SELECT b.doc_id, b.source, b.lang,
         CASE WHEN b.doc_id % 7 = 0 THEN b.n_chars + 1000 ELSE b.n_chars END AS n_chars
  FROM base b WHERE b.doc_id % 13 <> 0
  UNION ALL
  SELECT b.doc_id + m.mx + 1, 'src_new', b.lang, b.n_chars
  FROM base b, m WHERE b.doc_id % 11 = 0
)
SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM merged
GROUP BY source
ORDER BY source
"""


def q_snapshot_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Delta-style MERGE workflow: base table committed as
    snapshot v1, the CDC changeset applied via operators.merge.merge_into
    against the v1 READ, and the merged state committed as a REPLACE
    snapshot v2 — readers atomically flip from pre- to post-merge, and
    v1 stays byte-identical for time travel (asserted inline). Exactly
    merge_into_cdc's changeset and aggregate, so this entry SHARES its
    oracle — the snapshot plumbing must never change answers."""
    from naru_spark.operators.merge import merge_into
    from naru_spark.sources.sinks import read_snapshot, write_snapshot

    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    )
    n_docs = docs.count()
    path = _tmpdir(prefix="docs_snapmerge_") + "/docs"
    assert write_snapshot(docs, path) == 1

    base = read_snapshot(spark, path, version=1)
    max_id = base.agg(F.max("doc_id")).collect()[0][0]
    deletes = base.filter(F.col("doc_id") % 13 == 0).select(
        "doc_id", "source", "lang", "n_chars", F.lit("D").alias("op")
    )
    updates = (
        base.filter((F.col("doc_id") % 13 != 0) & (F.col("doc_id") % 7 == 0))
        .withColumn("n_chars", F.col("n_chars") + 1000)
        .select("doc_id", "source", "lang", "n_chars", F.lit("U").alias("op"))
    )
    inserts = base.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + F.lit(int(max_id) + 1)).alias("doc_id"),
        F.lit("src_new").alias("source"),
        "lang",
        "n_chars",
        F.lit("U").alias("op"),
    )
    changes = deletes.unionByName(updates).unionByName(inserts)
    # key-disjoint by construction (same modulus split as the CDC
    # entry) — skip the validator's extra changeset aggregation job
    merged = merge_into(base, changes, key="doc_id", validate=False)
    assert write_snapshot(merged, path, mode="replace") == 2
    # time travel: the pre-merge version is still intact after the commit
    assert read_snapshot(spark, path, version=1).count() == n_docs

    return (
        read_snapshot(spark, path)  # latest = post-merge
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("source")
    )


def q_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution (sources.sinks.read_merged_schema): an early batch
    written WITHOUT n_chars, a later batch with it, both appended into one
    directory; mergeSchema surfaces the old rows with NULL — the
    append-only column-add pattern every long-lived dataset hits. The
    aggregate counts rows and sums coalesce(n_chars, 0) per lang, so the
    NULL-for-predating-files semantics is exactly what the oracle pins."""
    from naru_spark.sources.sinks import read_merged_schema

    docs = _load(spark, sf_dir, "documents")
    path = _tmpdir(prefix="docs_evolve_") + "/docs"
    old = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    new = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "lang", "n_chars")
    old.write.mode("overwrite").parquet(path)
    new.write.mode("append").parquet(path)
    back = read_merged_schema(spark, path)
    return (
        back.groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.coalesce(F.col("n_chars"), F.lit(0))).alias("sum_chars_known"),
            F.sum(F.col("n_chars").isNull().cast("long")).alias("n_legacy_rows"),
        )
        .orderBy("lang")
    )


def sql_schema_evolution_read() -> str:
    return """
SELECT lang, COUNT(*) AS n,
       CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE 0 END) AS BIGINT) AS sum_chars_known,
       CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_legacy_rows
FROM documents
GROUP BY lang
ORDER BY lang
"""


def q_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction (sources.sinks.compact): lineitem written
    deliberately over-partitioned (64 files), compacted to <= 4 with ONE
    narrow coalesce — both the file-count reduction and the no-shuffle
    property are asserted INLINE on every driver run (small files are the
    silent scan killer at 100 TB; a compactor that shuffles would pay a
    full data movement for a layout fix). The aggregate proves the data
    survived byte-for-byte."""
    import os as _os

    from naru_spark.sources.sinks import compact

    li = _load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    base = _tmpdir(prefix="li_compact_")
    scattered, compacted = base + "/scattered", base + "/compacted"
    li.repartition(64).write.mode("overwrite").parquet(scattered)
    n_small = len([f for f in _os.listdir(scattered) if f.endswith(".parquet")])
    assert n_small >= 32, f"expected an over-partitioned source, got {n_small} files"

    c = compact(scattered, spark, target_files=4)
    plan = c._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "compaction must be a narrow coalesce"
    c.write.mode("overwrite").parquet(compacted)
    n_big = len([f for f in _os.listdir(compacted) if f.endswith(".parquet")])
    assert n_big <= 4, f"compaction left {n_big} files"

    back = spark.read.parquet(compacted)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


def sql_compact_small_files() -> str:
    return """
SELECT l_returnflag, COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q_zorder_data_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered layout (sources.sinks.zorder_write — the
    Delta/Iceberg OPTIMIZE ZORDER analog): lineitem re-laid-out on the
    Morton interleave of (l_partkey, l_suppkey), then a two-column range
    box is answered over the clustered files. The data-skipping property
    is asserted INLINE on every run via per-file min/max FOOTER stats
    (file_skip_fraction — the same stats row-group pruning reads): a
    5%-per-dim box must intersect at most half of the 16 files (small
    boxes fragment into few z-curve segments; a wider box fragments into
    more segments than 16 coarse file ranges can localize), which a
    single-column sort or random layout cannot achieve for BOTH columns.
    Layout never changes results, so the oracle is the plain box
    aggregate; the box bounds derive from min/max by the SAME arithmetic
    on both engines (exact integer min/max, one multiply-add)."""
    from naru_spark.sources.sinks import file_skip_fraction, zorder_write

    li = _load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_returnflag", "l_quantity"
    )
    path = _tmpdir(prefix="li_zorder_") + "/li"
    info = zorder_write(li, path, ["l_partkey", "l_suppkey"], n_files=16, bits=8)

    def box(c: str, lo_f: float, hi_f: float) -> tuple[float, float]:
        lo = info["mins"][c] + lo_f * (info["maxs"][c] - info["mins"][c])
        hi = info["mins"][c] + hi_f * (info["maxs"][c] - info["mins"][c])
        return lo, hi

    lo_p, hi_p = box("l_partkey", 0.45, 0.5)
    lo_s, hi_s = box("l_suppkey", 0.45, 0.5)
    m, t = file_skip_fraction(
        spark, path, {"l_partkey": (lo_p, hi_p), "l_suppkey": (lo_s, hi_s)}
    )
    assert t >= 8, f"expected a multi-file layout, got {t}"
    assert m <= t // 2, f"z-order failed to skip: {m}/{t} files intersect the box"

    back = spark.read.parquet(path)
    return (
        back.filter(
            (F.col("l_partkey") >= lo_p) & (F.col("l_partkey") <= hi_p)
            & (F.col("l_suppkey") >= lo_s) & (F.col("l_suppkey") <= hi_s)
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


def sql_zorder_data_skipping() -> str:
    # identical box arithmetic: min + f*(max-min) on exact integer min/max
    return """
WITH r AS (
  SELECT CAST(MIN(l_partkey) AS DOUBLE) AS pmin, CAST(MAX(l_partkey) AS DOUBLE) AS pmax,
         CAST(MIN(l_suppkey) AS DOUBLE) AS smin, CAST(MAX(l_suppkey) AS DOUBLE) AS smax
  FROM lineitem
)
SELECT l_returnflag, COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty
FROM lineitem, r
WHERE l_partkey >= r.pmin + 0.45 * (r.pmax - r.pmin)
  AND l_partkey <= r.pmin + 0.5 * (r.pmax - r.pmin)
  AND l_suppkey >= r.smin + 0.45 * (r.smax - r.smin)
  AND l_suppkey <= r.smin + 0.5 * (r.smax - r.smin)
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + explicit-schema source round-trip over documents."""
    from naru_spark.sources.sinks import read_jsonl, write_jsonl

    docs = _load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    path = _tmpdir(prefix="docs_jsonl_") + "/docs"
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, "doc_id long, lang string, n_chars long")
    return back.groupBy("lang").agg(
        F.count("*").alias("n"), F.sum("n_chars").alias("sum_chars")
    )


def sql_jsonl_roundtrip() -> str:
    return """
SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang
"""


def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + explicit-schema source round-trip over lineitem columns
    including a timestamp (the type CSV loses without a schema)."""
    from naru_spark.sources.sinks import read_csv, write_csv

    li = _load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity", "l_shipdate"
    )
    path = _tmpdir(prefix="li_csv_") + "/li"
    write_csv(li, path)
    back = read_csv(
        spark, path,
        "l_orderkey long, l_returnflag string, l_quantity double, l_shipdate timestamp",
    )
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.max("l_shipdate").alias("max_shipdate"),
    )


def sql_csv_roundtrip() -> str:
    return """
SELECT l_returnflag, COUNT(*) AS n,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       MAX(l_shipdate) AS max_shipdate
FROM lineitem GROUP BY l_returnflag
"""


# ------------------------------------------------------- streaming dedup
def q_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedup: the events stream unioned with itself
    (every row duplicated) must dedup back to exactly the original table."""
    from naru_spark.streaming.events import (
        dedup_stream,
        events_stream,
        run_stream_to_memory,
    )

    return run_stream_to_memory(
        spark,
        dedup_stream(events_stream(spark, sf_dir)),
        output_mode="append",
    )


def sql_dedup_stream() -> str:
    return "SELECT event_id, event_type, value FROM events"


def q_stream_parquet_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once durable file sink: stream half the events into a
    checkpointed parquet sink, then drop the second half into the source
    directory and RESUME from the same checkpoint. The final sink must
    hold every event exactly once — the checkpoint's source offsets stop
    re-processing of half 1, the sink manifest excludes uncommitted
    files. This is the restart contract every production backfill relies
    on; correctness = full hash parity with the batch projection."""
    import glob
    import shutil
    from naru_spark.streaming.events import run_stream_to_parquet

    ev = _load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    src = _tmpdir(prefix="ev_resume_src_")
    sink = _tmpdir(prefix="ev_resume_sink_") + "/out"
    ckpt = _tmpdir(prefix="ev_resume_ckpt_") + "/ckpt"
    halves = [
        ev.filter(F.pmod("event_id", F.lit(2)) == 0),
        ev.filter(F.pmod("event_id", F.lit(2)) == 1),
    ]
    for i, half in enumerate(halves):
        tmp = _tmpdir(prefix=f"ev_resume_half{i}_")
        half.coalesce(1).write.mode("overwrite").parquet(tmp)
        for j, f in enumerate(sorted(glob.glob(f"{tmp}/part-*.parquet"))):
            shutil.copy(f, f"{src}/half{i}_{j}.parquet")
        stream = spark.readStream.schema(ev.schema).parquet(src)
        run_stream_to_parquet(spark, stream, sink, ckpt)
    return spark.read.parquet(sink)


def sql_stream_parquet_resume() -> str:
    return "SELECT event_id, event_type, value FROM events"


def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source round-trip over orders, with a filter on the
    read side (ORC predicate pushdown, same as parquet)."""
    from naru_spark.sources.sinks import read_orc, write_orc

    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    path = _tmpdir(prefix="orders_orc_") + "/orders"
    write_orc(orders, path)
    back = read_orc(spark, path).filter(F.col("o_orderpriority") == "1-URGENT")
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


def sql_orc_roundtrip() -> str:
    return """
SELECT o_orderpriority, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_orderpriority
"""


# ------------------------------------------------------ advised star join
def q_advised_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality-advised star join (plans/joinplan.py): the estimator's
    post-filter row counts choose broadcast-vs-shuffle per dimension and the
    greedy most-selective-first join order; the RESULT is plan-independent
    (same rows whatever the strategy — the strategy choice is gated in
    tests/test_plans.py)."""
    from naru_spark.plans.joinplan import advised_join

    li = _load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") >= F.lit("1998-01-01"))
    orders = _load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    part = _load(spark, sf_dir, "part").filter(F.col("p_size") <= 20)
    supplier = _load(spark, sf_dir, "supplier")
    dims = [
        ("orders", orders, li.l_orderkey == orders.o_orderkey),
        ("part", part, li.l_partkey == part.p_partkey),
        ("supplier", supplier, li.l_suppkey == supplier.s_suppkey),
    ]
    joined, _ = advised_join(li, dims, card_fn=lambda name, df: df.count())
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


def sql_advised_star_join() -> str:
    return """
SELECT o_orderpriority, COUNT(*) AS n_items,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE l_shipdate >= '1998-01-01' AND o_orderpriority = '1-URGENT' AND p_size <= 20
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------- registry
_JOIN_SPECS = [
    ("customer_orders", "customer", "c_custkey", "orders", "o_custkey"),
    ("orders_lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("supplier_lineitem", "supplier", "s_suppkey", "lineitem", "l_suppkey"),
]


def q_join_card_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join cardinality estimation (the System-R containment formula
    Catalyst's CBO uses, driving plans/joinplan.advised_join): per join,
    the exact inputs (row counts, distinct keys), the estimate
    N_L*N_R/max(d_L,d_R), and the true join size — all exact integers, so
    the estimator itself is oracle-verified, not just sanity-checked."""
    # one LAZY frame per join — exact-count aggregates on each side, the
    # true join size, and the containment estimate composed with integer
    # `div` (bit-identical to the old driver-side // on these positive
    # bigints) — unioned so the whole entry evaluates as ONE action
    # instead of 9 driver-synchronized collect/count round-trips
    # (guide §5: the driver should do almost no work). Same integers,
    # same formula as plans/joinplan.estimate_join_rows.
    parts = []
    for name, lt, lk, rt, rk in _JOIN_SPECS:
        left, right = _load(spark, sf_dir, lt), _load(spark, sf_dir, rt)
        ls = left.agg(
            F.count("*").alias("n_left"),
            F.count_distinct(F.col(lk)).alias("d_left"),
        )
        rs = right.agg(
            F.count("*").alias("n_right"),
            F.count_distinct(F.col(rk)).alias("d_right"),
        )
        tr = left.join(right, left[lk] == right[rk]).agg(
            F.count("*").alias("true_rows")
        )
        parts.append(
            ls.crossJoin(rs).crossJoin(tr).select(
                F.lit(name).alias("join_name"),
                "n_left", "n_right", "d_left", "d_right",
                F.expr(
                    "(n_left * n_right) div greatest(d_left, d_right, 1)"
                ).alias("est_rows"),
                "true_rows",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def sql_join_card_estimates() -> str:
    parts = []
    for name, lt, lk, rt, rk in _JOIN_SPECS:
        parts.append(f"""
SELECT '{name}' AS join_name,
       (SELECT COUNT(*) FROM {lt}) AS n_left,
       (SELECT COUNT(*) FROM {rt}) AS n_right,
       (SELECT COUNT(DISTINCT {lk}) FROM {lt}) AS d_left,
       (SELECT COUNT(DISTINCT {rk}) FROM {rt}) AS d_right,
       CAST((SELECT COUNT(*) FROM {lt}) * (SELECT COUNT(*) FROM {rt})
            // GREATEST((SELECT COUNT(DISTINCT {lk}) FROM {lt}),
                        (SELECT COUNT(DISTINCT {rk}) FROM {rt}), 1) AS BIGINT) AS est_rows,
       (SELECT COUNT(*) FROM {lt} l JOIN {rt} r ON l.{lk} = r.{rk}) AS true_rows
""".strip())
    return "\nUNION ALL\n".join(parts)


def q_advised_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Q5 star join planned BY THE ADVISOR: dimension order and
    broadcast-vs-shuffle come from estimator row counts (advised_join);
    the supplier-nation locality condition is applied as a post-join
    filter so each dimension join stays single-key and order-free.
    Shares the plain Q5 entry's oracle — estimator-driven planning must
    never change results."""
    from naru_spark.plans.joinplan import advised_join

    region = _load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _load(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust_dim = (
        _load(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_nationkey", "n_name")
    )
    supp = _load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = _load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _load(spark, sf_dir, "lineitem")
    fact = li.join(orders, li.l_orderkey == orders.o_orderkey)
    dims = [
        ("cust_region", cust_dim, F.col("o_custkey") == F.col("c_custkey")),
        ("supplier", supp, F.col("l_suppkey") == F.col("s_suppkey")),
    ]
    from naru_spark.entry_queries import _decimal_revenue

    joined, _ = advised_join(fact, dims, card_fn=lambda name, df: df.count())
    return (
        joined.filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            _decimal_revenue().alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


def q_snapshot_cdf_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH change-feed read through the DataSource (``spark.read
    .option("readChangeFeed", "true").option("startingVersion", 1)`` —
    Delta's primary CDF idiom, the r13-advice gap): the cdf table's
    full commit vocabulary reads back as typed change rows planned by
    the same per-commit logic as the streaming CDF source, and a read
    with NO version range REFUSES loudly instead of silently returning
    current rows with NULL change columns. Shares
    ``sql_snapshot_cdf``'s change-row replay oracle."""
    from naru_spark.sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    path = _tmpdir(prefix="docs_snap_cdfbatch_") + "/docs"
    latest = _build_cdf_table(spark, sf_dir, path)
    try:
        (spark.read.format("naru_snapshot")
         .option("readChangeFeed", "true").load(path).count())
        raise AssertionError("rangeless batch CDF read must refuse")
    except AssertionError:
        raise
    except Exception as exc:
        assert "startingVersion" in str(exc), exc
    out = (
        spark.read.format("naru_snapshot")
        .option("readChangeFeed", "true")
        .option("startingVersion", 1)
        .option("endingVersion", latest)
        .load(path)
    )
    return (
        out.groupBy(
            F.col("_commit_version").alias("commit_version"),
            F.col("_change_type").alias("change_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("commit_version", "change_type")
    )


def q_snapshot_datasource_write_constrained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CHECK constraints on the DataSource WRITE path: the session-less
    commit worker probes the staged bytes with DuckDB in a whitelisted
    dialect (sinks._duckdb_check_probe) — a violating batch REFUSES
    with zero trace (no manifest, no rows, no orphan commit dir), a
    clean batch commits; both counter-asserted. Oracle: the surviving
    content in plain SQL."""
    from naru_spark.sources.sinks import (
        _latest_version,
        add_snapshot_constraint,
        read_snapshot,
        write_snapshot,
    )
    from naru_spark.sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    ).where("doc_id % 7 = 0")
    path = _tmpdir(prefix="docs_ds_check_") + "/docs"
    write_snapshot(docs, path)                                     # v1
    add_snapshot_constraint(spark, path, "chars_nonneg", "n_chars >= 0")
    man_dir = path + "/_manifests"
    v_before = _latest_version(man_dir)
    n_before = read_snapshot(spark, path).count()
    bad = docs.limit(1).select(
        "doc_id", "source", F.lit(-5).cast("bigint").alias("n_chars")
    )
    try:
        bad.write.format("naru_snapshot").mode("append").save(path)
        raise AssertionError("violating batch must refuse")
    except AssertionError:
        raise
    except Exception as exc:
        assert "CHECK constraint" in str(exc), exc
    assert _latest_version(man_dir) == v_before                # no commit
    assert read_snapshot(spark, path).count() == n_before      # no rows
    clean = docs.where("doc_id % 2 = 0").select(
        (F.col("doc_id") + F.lit(100_000_000)).alias("doc_id"),
        "source", "n_chars",
    )
    clean.write.format("naru_snapshot").mode("append").save(path)
    return (
        read_snapshot(spark, path)
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("source")
    )


def sql_snapshot_datasource_write_constrained() -> str:
    return """
WITH q AS (SELECT doc_id, source, n_chars FROM documents
           WHERE doc_id % 7 = 0),
allr AS (
  SELECT * FROM q
  UNION ALL
  SELECT doc_id + 100000000, source, n_chars FROM q WHERE doc_id % 2 = 0
)
SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM allr GROUP BY source ORDER BY source
"""


def q_snapshot_datasource_days_write(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TRANSFORMED hidden partitioning through the DataSource WRITER
    (``option("partitionBy", "days(o_orderdate)")``): the Python write
    tasks compute UTC epoch-day values (bucket would go through the
    XXH64 twin), the commit stamps canonical specs + partition_meta
    dtypes exactly like write_snapshot — proven here by
    ``read_snapshot_where`` pruning a timestamp-range read on the
    ingested stamps (counter-asserted via inputFiles). Shares the JVM
    days-transform entry's oracle."""
    from naru_spark.sources.sinks import read_snapshot, read_snapshot_where
    from naru_spark.sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice"
    ).where("o_orderdate >= '1995-01-01' AND o_orderdate <= '1995-01-31'")
    path = _tmpdir(prefix="orders_ds_days_") + "/orders"
    (
        orders.write.format("naru_snapshot")
        .option("partitionBy", "days(o_orderdate)")
        .mode("append").save(path)
    )
    full_files = len(read_snapshot(spark, path).inputFiles())
    q = read_snapshot_where(
        spark, path,
        "o_orderdate >= '1995-01-10' AND o_orderdate <= '1995-01-20'",
    )
    pruned_files = len(q.inputFiles())
    assert 0 < pruned_files < full_files, (pruned_files, full_files)
    return (
        q.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("o_orderpriority")
    )


def q_stream_snapshot_cdf_pipeline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """END-TO-END composition of the three DataSource pieces in ONE
    Structured Streaming query: ``readStream.format("naru_snapshot")
    .option("readChangeFeed", "true")`` → stateless signed-delta
    transform (+1·insert/update_postimage, −1·delete/update_preimage —
    the IVM delta-table shape) → ``writeStream.format("naru_snapshot")``
    sink under a ``txnAppId``, drained with availableNow across TWO
    restarts from the same checkpoint (exactly-once: the re-drain with
    no new commits appends nothing — counter-asserted on the derived
    table's version). The derived delta table rolls up to the same
    state ``apply_cdf_to_aggregate`` folds batch-side (asserted), and
    the oracle is the final source state aggregated in plain SQL."""
    from naru_spark.sources.sinks import (
        _latest_version,
        apply_cdf_to_aggregate,
        delete_from_snapshot,
        read_snapshot,
        read_snapshot_changes,
        write_snapshot,
    )
    from naru_spark.sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    root = _tmpdir(prefix="docs_cdf_pipe_")
    src, dst, ckpt = root + "/src", root + "/delta", root + "/ckpt"
    docs = _load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    write_snapshot(docs, src, partition_by="lang", cdf=True)       # v1

    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"),
        F.lit(1),
    ).otherwise(F.lit(-1))

    def drain():
        _await_drain(lambda: (
            spark.readStream.format("naru_snapshot")
            .option("readChangeFeed", "true")
            .option("startingVersion", 1).load(src)
            .select(
                "lang",
                sign.cast("bigint").alias("dn"),
                (sign * F.col("n_chars")).cast("bigint").alias("dchars"),
            )
            .writeStream.format("naru_snapshot")
            .option("txnAppId", "cdf_pipe")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start(dst)
        ))

    drain()                                      # serves v1's inserts
    delete_from_snapshot(spark, src, "doc_id % 11 = 0")            # v2
    write_snapshot(
        docs.where("doc_id % 13 = 0").select(
            (F.col("doc_id") + F.lit(100_000_000)).alias("doc_id"),
            "lang", "n_chars",
        ),
        src,
    )                                                              # v3
    drain()                  # restart from checkpoint: exactly v2..v3
    v_done = _latest_version(dst + "/_manifests")
    drain()                  # second restart, no new commits
    assert _latest_version(dst + "/_manifests") == v_done  # no dup rows

    derived = (
        read_snapshot(spark, dst)
        .groupBy("lang")
        .agg(
            F.sum("dn").alias("n"),
            F.sum("dchars").alias("sum_chars"),
        )
        .where("n > 0")
    )
    # batch IVM twin: bootstrap v1, fold v2..v3 through the sign algebra
    boot = (
        read_snapshot(spark, src, version=1)
        .groupBy("lang")
        .agg(F.count("*").alias("n"),
             F.sum("n_chars").alias("sum_n_chars"))
    )
    folded = apply_cdf_to_aggregate(
        boot,
        read_snapshot_changes(spark, src, 1, row_level=True),
        keys=["lang"], sums=["n_chars"],
    )
    assert sorted(map(tuple, derived.collect())) == sorted(
        map(tuple, folded.select("lang", "n", "sum_n_chars").collect())
    )
    return derived.orderBy("lang")


def q_stream_snapshot_days_sink(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TRANSFORMED hidden partitioning through the STREAMING sink
    (VERDICT r14 item 5 — the r14 DataSource writer stamps
    ``days()``/``bucket()`` specs, but the end-to-end streaming entry
    sank with an identity spec only): a snapshot-source stream drains
    into ``writeStream.format("naru_snapshot").option("partitionBy",
    "days(o_orderdate)")`` across TWO checkpoint restarts (January
    lands in drain 1, February in drain 2 — each micro-batch commits
    day-partition stamps exactly like the batch writer), then a
    downstream BATCH timestamp-range read PRUNES on those stamps —
    counter-asserted via inputFiles, so a partition-blind read would
    fail the entry. Exactly-once across an idle third drain asserted
    on the derived table's version. Oracle: the same range filter in
    plain SQL."""
    from naru_spark.sources.sinks import (
        _latest_version,
        read_snapshot,
        read_snapshot_where,
        write_snapshot,
    )
    from naru_spark.sources.snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    orders = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    ).where("o_orderdate >= '1996-01-01' AND o_orderdate <= '1996-02-29'")
    root = _tmpdir(prefix="orders_stream_days_")
    src, dst, ckpt = root + "/src", root + "/days", root + "/ckpt"
    write_snapshot(orders.where("o_orderdate <= '1996-01-31'"), src)  # v1

    def drain():
        _await_drain(lambda: (
            spark.readStream.format("naru_snapshot").load(src)
            .writeStream.format("naru_snapshot")
            .option("txnAppId", "days_sink")
            .option("partitionBy", "days(o_orderdate)")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start(dst)
        ))

    drain()                                       # January partitions
    write_snapshot(orders.where("o_orderdate > '1996-01-31'"), src)  # v2
    drain()          # restart from checkpoint: February partitions
    v_done = _latest_version(dst + "/_manifests")
    drain()          # third drain, no new commits
    assert _latest_version(dst + "/_manifests") == v_done

    full = read_snapshot(spark, dst)
    full_files = len(full.inputFiles())
    q = read_snapshot_where(
        spark, dst,
        "o_orderdate >= '1996-02-05' AND o_orderdate <= '1996-02-15'",
    )
    pruned_files = len(q.inputFiles())
    assert 0 < pruned_files < full_files, (pruned_files, full_files)
    return (
        q.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("o_orderpriority")
    )


def sql_stream_snapshot_days_sink() -> str:
    return """
SELECT o_orderpriority, COUNT(*) AS n,
       MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
FROM orders
WHERE o_orderdate >= '1996-02-05' AND o_orderdate <= '1996-02-15'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def sql_stream_snapshot_cdf_pipeline() -> str:
    return """
WITH base AS (SELECT doc_id, lang, n_chars FROM documents),
final AS (
  SELECT * FROM base WHERE doc_id % 11 <> 0
  UNION ALL
  SELECT doc_id + 100000000, lang, n_chars FROM base WHERE doc_id % 13 = 0
)
SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM final GROUP BY lang ORDER BY lang
"""


def build_ops_registry():
    queries = {
        "join_card_estimates": q_join_card_estimates,
        "advised_q5": q_advised_q5,
        "asof_purchase_view": q_asof_purchase_view,
        "salted_join": q_salted_join,
        "range_join_windows": q_range_join_windows,
        "semi_join_urgent": q_semi_join_urgent,
        "anti_join_no_urgent": q_anti_join_no_urgent,
        "set_ops_buyers": q_set_ops_buyers,
        "rollup_pricing": q_rollup_pricing,
        "cube_pricing": q_cube_pricing,
        "pivot_event_counts": q_pivot_event_counts,
        "hypertable_daily": q_hypertable_daily,
        "moving_avg_daily_revenue": q_moving_avg_daily_revenue,
        "cumulative_revenue": q_cumulative_revenue,
        "distinct_counts": q_distinct_counts,
        "approx_distinct_counts": q_approx_distinct_counts,
        "events_json_props": q_events_json_props,
        "quantiles_quantity": q_quantiles_quantity,
        "workload_oracle_limited": q_workload_oracle_limited,
        "partitioned_sink_roundtrip": q_partitioned_sink,
        "partition_overwrite_upsert": q_partition_overwrite_upsert,
        "schema_evolution_read": q_schema_evolution_read,
        "compact_small_files": q_compact_small_files,
        "zorder_data_skipping": q_zorder_data_skipping,
        "merge_into_cdc": q_merge_into_cdc,
        "snapshot_time_travel": q_snapshot_time_travel,
        "snapshot_incremental_read": q_snapshot_incremental_read,
        "snapshot_wap_publish": q_snapshot_wap_publish,
        "snapshot_compaction": q_snapshot_compaction,
        "snapshot_delete_where": q_snapshot_delete_where,
        "snapshot_delete_mor": q_snapshot_delete_mor,
        "snapshot_delete_bloom": q_snapshot_delete_bloom,
        "snapshot_rename_column": q_snapshot_rename_column,
        "snapshot_merge_pruned": q_snapshot_merge_pruned,
        "snapshot_replace_where": q_snapshot_replace_where,
        "snapshot_replace_composite": q_snapshot_replace_composite,
        "snapshot_constraints": q_snapshot_constraints,
        "snapshot_restore": q_snapshot_restore,
        "snapshot_history": q_snapshot_history,
        "snapshot_cdf": q_snapshot_cdf,
        "snapshot_delete_bloom_partition": q_snapshot_delete_bloom_partition,
        "snapshot_delete_auto_prune": q_snapshot_delete_auto_prune,
        "snapshot_delete_dv": q_snapshot_delete_dv,
        "snapshot_update_over_dv": q_snapshot_update_over_dv,
        "snapshot_merge_over_dv": q_snapshot_merge_over_dv,
        "snapshot_merge_evolve": q_snapshot_merge_evolve,
        "snapshot_days_transform": q_snapshot_days_transform,
        "snapshot_bucket_transform": q_snapshot_bucket_transform,
        "snapshot_datasource_read": q_snapshot_datasource_read,
        "snapshot_cdf_batch": q_snapshot_cdf_batch,
        "snapshot_datasource_write_constrained":
            q_snapshot_datasource_write_constrained,
        "snapshot_datasource_days_write": q_snapshot_datasource_days_write,
        "stream_snapshot_cdf_pipeline": q_stream_snapshot_cdf_pipeline,
        "stream_snapshot_days_sink": q_stream_snapshot_days_sink,
        "stream_snapshot_datasource": q_stream_snapshot_datasource,
        "stream_snapshot_datasource_sink": q_stream_snapshot_datasource_sink,
        "snapshot_update_where": q_snapshot_update_where,
        "snapshot_merge_sync": q_snapshot_merge_sync,
        "stream_snapshot_follow_cdf": q_stream_snapshot_follow_cdf,
        "stream_snapshot_follow_cdf_ts": q_stream_snapshot_follow_cdf_ts,
        "stream_snapshot_cdf_source": q_stream_snapshot_cdf_source,
        "snapshot_cdf_ivm": q_snapshot_cdf_ivm,
        "snapshot_stats": q_snapshot_stats,
        "snapshot_column_stats": q_snapshot_column_stats,
        "snapshot_clone": q_snapshot_clone,
        "snapshot_maintain": q_snapshot_maintain,
        "snapshot_optimize_zorder": q_snapshot_optimize_zorder,
        "snapshot_optimize_partition": q_snapshot_optimize_partition,
        "snapshot_merge_upsert": q_snapshot_merge_upsert,
        "jsonl_roundtrip": q_jsonl_roundtrip,
        "csv_roundtrip": q_csv_roundtrip,
        "dedup_stream": q_dedup_stream,
        "stream_parquet_resume": q_stream_parquet_resume,
        "advised_star_join": q_advised_star_join,
        "orc_roundtrip": q_orc_roundtrip,
    }
    from naru_spark.entry_queries import sql_local_supplier_volume

    oracles = {
        "join_card_estimates": sql_join_card_estimates(),
        # planning must be result-invariant: same oracle as the plain Q5
        "advised_q5": sql_local_supplier_volume(),
        "asof_purchase_view": sql_asof_purchase_view(),
        "salted_join": sql_salted_join(),
        "range_join_windows": sql_range_join_windows(),
        "semi_join_urgent": sql_semi_join_urgent(),
        "anti_join_no_urgent": sql_anti_join_no_urgent(),
        "set_ops_buyers": sql_set_ops_buyers(),
        "rollup_pricing": sql_rollup_pricing(),
        "cube_pricing": sql_cube_pricing(),
        "pivot_event_counts": sql_pivot_event_counts(),
        "hypertable_daily": sql_hypertable_daily(),
        "moving_avg_daily_revenue": sql_moving_avg_daily_revenue(),
        "cumulative_revenue": sql_cumulative_revenue(),
        "distinct_counts": sql_distinct_counts(),
        "events_json_props": sql_events_json_props(),
        "quantiles_quantity": sql_quantiles_quantity(),
        "workload_oracle_limited": sql_workload_oracle_limited(),
        "partitioned_sink_roundtrip": sql_partitioned_sink(),
        "partition_overwrite_upsert": sql_partition_overwrite_upsert(),
        "schema_evolution_read": sql_schema_evolution_read(),
        "compact_small_files": sql_compact_small_files(),
        "zorder_data_skipping": sql_zorder_data_skipping(),
        "merge_into_cdc": sql_merge_into_cdc(),
        "snapshot_time_travel": sql_snapshot_time_travel(),
        "snapshot_incremental_read": sql_snapshot_incremental_read(),
        "snapshot_wap_publish": sql_snapshot_wap_publish(),
        "snapshot_compaction": sql_snapshot_compaction(),
        "snapshot_delete_where": sql_snapshot_delete_where(),
        "snapshot_delete_mor": sql_snapshot_delete_mor(),
        "snapshot_delete_bloom": sql_snapshot_delete_bloom(),
        "snapshot_rename_column": sql_snapshot_rename_column(),
        "snapshot_merge_pruned": sql_snapshot_merge_pruned(),
        "snapshot_replace_where": sql_snapshot_replace_where(),
        "snapshot_replace_composite": sql_snapshot_replace_composite(),
        "snapshot_constraints": sql_snapshot_constraints(),
        "snapshot_restore": sql_snapshot_restore(),
        "snapshot_history": sql_snapshot_history(),
        "snapshot_cdf": sql_snapshot_cdf(),
        "snapshot_delete_bloom_partition": sql_snapshot_delete_bloom_partition(),
        "snapshot_delete_auto_prune": sql_snapshot_delete_auto_prune(),
        "snapshot_delete_dv": sql_snapshot_delete_dv(),
        "snapshot_update_over_dv": sql_snapshot_update_over_dv(),
        "snapshot_merge_over_dv": sql_snapshot_merge_over_dv(),
        "snapshot_merge_evolve": sql_snapshot_merge_evolve(),
        "snapshot_days_transform": sql_snapshot_days_transform(),
        "snapshot_bucket_transform": sql_snapshot_bucket_transform(),
        "snapshot_datasource_read": sql_snapshot_datasource_read(),
        "snapshot_cdf_batch": sql_snapshot_cdf(),
        "snapshot_datasource_write_constrained":
            sql_snapshot_datasource_write_constrained(),
        "snapshot_datasource_days_write": sql_snapshot_days_transform(),
        "stream_snapshot_cdf_pipeline": sql_stream_snapshot_cdf_pipeline(),
        "stream_snapshot_days_sink": sql_stream_snapshot_days_sink(),
        "stream_snapshot_datasource": sql_stream_snapshot_datasource(),
        "stream_snapshot_datasource_sink": sql_stream_snapshot_datasource_sink(),
        "snapshot_update_where": sql_snapshot_update_where(),
        "snapshot_merge_sync": sql_snapshot_merge_sync(),
        "stream_snapshot_follow_cdf": sql_stream_snapshot_follow_cdf(),
        # wall-clock bootstrap is content-invariant: same oracle
        "stream_snapshot_follow_cdf_ts": sql_stream_snapshot_follow_cdf(),
        # the streamed feed folds to the same final state: same oracle
        "stream_snapshot_cdf_source": sql_stream_snapshot_follow_cdf(),
        "snapshot_cdf_ivm": sql_snapshot_cdf_ivm(),
        "snapshot_stats": sql_snapshot_stats(),
        "snapshot_column_stats": sql_snapshot_column_stats(),
        "snapshot_clone": sql_snapshot_clone(),
        # content invariance: maintenance must never change answers
        "snapshot_maintain": sql_snapshot_compaction(),
        # clustering never changes content: same compaction oracle
        "snapshot_optimize_zorder": sql_snapshot_compaction(),
        "snapshot_optimize_partition": sql_snapshot_optimize_partition(),
        "snapshot_merge_upsert": sql_merge_into_cdc(),
        "jsonl_roundtrip": sql_jsonl_roundtrip(),
        "csv_roundtrip": sql_csv_roundtrip(),
        "dedup_stream": sql_dedup_stream(),
        "stream_parquet_resume": sql_stream_parquet_resume(),
        "advised_star_join": sql_advised_star_join(),
        "orc_roundtrip": sql_orc_roundtrip(),
        # approx_distinct_counts: rows-only (HLL sketch internals)
    }
    return queries, oracles
