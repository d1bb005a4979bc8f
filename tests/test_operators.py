"""Tests for naru_spark.operators — as-of join, range joins, grouping sets,
hypertable rollup, and distinct sketches."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from naru_spark.operators import (
    approx_distinct_counts,
    asof_join,
    continuous_aggregate,
    distinct_counts,
    pivot_counts,
    range_join_broadcast,
    range_join_bucketed,
    rollup_aggregate,
)
from naru_spark.sources import load_table
from tests.conftest import SF_SMOKE


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# ----------------------------------------------------------- salted join
def test_salted_join_identity_and_spread(spark):
    """salted_join == plain inner equi-join row-for-row (salting only
    changes partitioning), the salt is deterministic (repartition-
    invariant results), and the hot key's rows actually spread over
    multiple salts."""
    from naru_spark.operators.joins import salted_join

    rows = [(0, i, f"p{i}") for i in range(900)] + [
        (k, 1000 + k, f"q{k}") for k in range(1, 40)
    ]
    big = spark.createDataFrame(rows, ["k", "v", "pay"])
    small = spark.createDataFrame([(k, k % 5) for k in range(0, 40)], ["k", "grp"])

    plain = {tuple(r) for r in big.join(small, "k").collect()}
    salted = salted_join(big, small, "k", salts=8)
    assert {tuple(r) for r in salted.collect()} == plain
    assert "__salt" not in salted.columns
    # deterministic under repartitioning (a rand() salt would not be)
    again = {
        tuple(r)
        for r in salted_join(big.repartition(7), small, "k", salts=8).collect()
    }
    assert again == plain
    # the hot key's 900 rows spread across several salt buckets
    from pyspark.sql import functions as FF

    spread = (
        big.filter(FF.col("k") == 0)
        .withColumn(
            "__salt", FF.pmod(FF.xxhash64(FF.col("v"), FF.col("pay")), FF.lit(8))
        )
        .select("__salt")
        .distinct()
        .count()
    )
    assert spread >= 6


# ------------------------------------------------------------- as-of join
def test_asof_join_matches_pandas_merge_asof(spark):
    """Edge cases a window bug would miss: equal timestamps (inclusive),
    no-prior-match rows (NULL), keys present on one side only."""
    left = [
        (1, _ts("2024-01-01 00:05:00"), "l1"),
        (1, _ts("2024-01-01 00:10:00"), "l2"),
        (1, _ts("2024-01-01 00:00:30"), "l3"),  # before any right row -> NULL
        (2, _ts("2024-01-01 00:02:00"), "l4"),  # equal ts -> inclusive match
        (3, _ts("2024-01-01 00:09:00"), "l5"),  # key absent on right -> NULL
    ]
    right = [
        (1, _ts("2024-01-01 00:01:00"), 10.0),
        (1, _ts("2024-01-01 00:05:00"), 20.0),  # ties l1's ts exactly
        (1, _ts("2024-01-01 00:07:00"), 30.0),
        (2, _ts("2024-01-01 00:02:00"), 40.0),
    ]
    l = spark.createDataFrame(left, "k long, ts timestamp, tag string")
    r = spark.createDataFrame(right, "k long, ts timestamp, v double")
    out = asof_join(
        l, r, on="k", left_ts="ts", right_ts="ts", right_cols=["ts", "v"]
    ).toPandas()

    lp = pd.DataFrame(left, columns=["k", "ts", "tag"]).sort_values("ts")
    rp = pd.DataFrame(right, columns=["k", "ts", "v"]).sort_values("ts")
    expect = pd.merge_asof(
        lp, rp, on="ts", by="k", direction="backward", suffixes=("", "_r")
    )
    got = {(row.k, row.tag): (row.asof_v if pd.notnull(row.asof_v) else None)
           for row in out.itertuples()}
    want = {(row.k, row.tag): (row.v if pd.notnull(row.v) else None)
            for row in expect.itertuples()}
    assert got == want


def test_asof_join_tiebreak_deterministic(spark):
    """Two right rows at the identical (key, ts): the one with the larger
    right_order value wins."""
    l = spark.createDataFrame(
        [(1, _ts("2024-01-01 01:00:00"))], "k long, ts timestamp"
    )
    r = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:30:00"), 100, 1.0),
            (1, _ts("2024-01-01 00:30:00"), 200, 2.0),
        ],
        "k long, ts timestamp, rid long, v double",
    )
    out = asof_join(
        l, r, on="k", left_ts="ts", right_ts="ts",
        right_cols=["rid", "v"], right_order="rid",
    ).collect()
    assert len(out) == 1 and out[0]["asof_rid"] == 200 and out[0]["asof_v"] == 2.0


def test_asof_join_single_shuffle(spark):
    """The whole as-of join must cost exactly one Exchange (the window's
    partitionBy) — no join-induced second shuffle."""
    ev = load_table(spark, "events", SF_SMOKE)
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view")
    out = asof_join(purchases, views, on="user_id", left_ts="ts",
                    right_ts="ts", right_cols=["value"], right_order="event_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


# ------------------------------------------------------------ range join
def _intervals(spark):
    rows = [
        (0, "2024-01-02 00:00:00", "2024-01-02 06:00:00"),
        (1, "2024-01-05 12:00:00", "2024-01-06 00:00:00"),
        (2, "2024-01-10 00:00:00", "2024-01-20 00:00:00"),
    ]
    return spark.createDataFrame(rows, "window_id int, start string, end string").select(
        "window_id",
        F.to_timestamp("start").alias("start"),
        F.to_timestamp("end").alias("end"),
    )


def test_range_join_bucketed_equals_broadcast(spark):
    ev = load_table(spark, "events", SF_SMOKE)
    iv = _intervals(spark)
    a = (
        range_join_broadcast(ev, iv, "ts", "start", "end")
        .groupBy("window_id").count().collect()
    )
    b = (
        range_join_bucketed(ev, iv, "ts", "start", "end", bucket_seconds=3600)
        .groupBy("window_id").count().collect()
    )
    assert {r["window_id"]: r["count"] for r in a} == {
        r["window_id"]: r["count"] for r in b
    }
    assert len(a) == 3  # every window non-empty at sf0.001


def test_range_join_broadcast_plan_has_no_shuffle(spark):
    ev = load_table(spark, "events", SF_SMOKE)
    out = range_join_broadcast(ev, _intervals(spark), "ts", "start", "end")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_range_join_bucketed_is_equi_join(spark):
    """The bucketed variant must NOT be a nested-loop join — the bucket key
    gives Catalyst an equi-join."""
    ev = load_table(spark, "events", SF_SMOKE)
    out = range_join_bucketed(ev, _intervals(spark), "ts", "start", "end")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan


# ------------------------------------------- grouping sets / pivot / hyper
def test_rollup_gid_totals(spark, duck_smoke):
    from naru_spark.entry_ops import q_rollup_pricing, sql_rollup_pricing

    got = q_rollup_pricing(spark, SF_SMOKE).toPandas()
    want = duck_smoke.execute(sql_rollup_pricing()).df()
    total = int(got.loc[got.gid == 3, "n"].iloc[0])
    assert total == int(want.loc[want.gid == 3, "n"].iloc[0])
    # detail rows sum to the grand total
    assert int(got.loc[got.gid == 0, "n"].sum()) == total
    assert len(got) == len(want)


def test_pivot_counts_matches_groupby(spark):
    ev = load_table(spark, "events", SF_SMOKE)
    types = ["click", "error", "purchase", "signup", "view"]
    piv = pivot_counts(ev, "user_id", "event_type", types).toPandas()
    flat = (
        ev.groupBy("user_id", "event_type").count().toPandas()
        .pivot(index="user_id", columns="event_type", values="count")
        .fillna(0).astype(int)
    )
    piv = piv.set_index("user_id").sort_index()
    assert (piv[types].to_numpy() == flat[types].sort_index().to_numpy()).all()


def test_hypertable_rollup_equals_direct(spark):
    ev = load_table(spark, "events", SF_SMOKE)
    hourly = continuous_aggregate(ev, bucket="hour")
    daily = rollup_aggregate(hourly, bucket="day").toPandas()
    direct = (
        ev.groupBy(F.date_trunc("day", "ts").alias("bucket"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .toPandas()
    )
    d = daily.set_index(["bucket", "event_type"]).sort_index()
    e = direct.set_index(["bucket", "event_type"]).sort_index()
    assert (d["n"] == e["n"]).all()
    assert (d["sum_value"] - e["sum_value"]).abs().max() < 1e-6


# -------------------------------------------------------------- sketches
def test_approx_distinct_within_tolerance(spark):
    df = load_table(spark, "lineitem", SF_SMOKE)
    cols = ["l_returnflag", "l_quantity", "l_orderkey"]
    exact = distinct_counts(df, cols).collect()[0].asDict()
    approx = approx_distinct_counts(df, cols, rsd=0.02).collect()[0].asDict()
    for c in cols:
        rel = abs(approx[f"d_{c}"] - exact[f"d_{c}"]) / max(exact[f"d_{c}"], 1)
        assert rel <= 0.06, (c, exact[f"d_{c}"], approx[f"d_{c}"])


def test_merge_into_semantics(spark):
    """MERGE INTO on a hand-built table: matched update, matched delete,
    unmatched insert, unmatched-delete no-op, untouched rows — and the
    result carries the base schema exactly."""
    from naru_spark.operators.merge import merge_into

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "id long, name string, v long",
    )
    changes = spark.createDataFrame(
        [
            (2, "B", 200, "U"),   # matched update
            (3, None, 0, "D"),    # matched delete
            (5, "e", 50, "U"),    # unmatched insert
            (9, None, 0, "D"),    # unmatched delete: no-op
        ],
        "id long, name string, v long, op string",
    )
    out = merge_into(base, changes, key="id")
    assert out.columns == ["id", "name", "v"]
    got = sorted(map(tuple, out.collect()))
    assert got == [(1, "a", 10), (2, "B", 200), (4, "d", 40), (5, "e", 50)]

    # duplicate changeset keys violate the SQL MERGE one-row-per-key
    # precondition: fail loudly (like "multiple source rows matched"),
    # never silently fan base rows out through the full-outer join
    import pytest

    dup = spark.createDataFrame(
        [(2, "B", 200, "U"), (2, "BB", 201, "U")],
        "id long, name string, v long, op string",
    )
    with pytest.raises(ValueError, match="one changeset row"):
        merge_into(base, dup, key="id")
    # pre-validated changesets can opt out of the extra aggregate
    assert merge_into(base, changes, key="id", validate=False).count() == 4
