"""Structured Streaming: stream result == batch result (availableNow)."""

from pyspark.sql import functions as F

from naru_spark.sources import load_table
from naru_spark.streaming.events import (
    events_stream,
    hourly_aggregate_stream,
    run_stream_to_memory,
)
from tests.conftest import SF_SMOKE


def test_stream_equals_batch(spark):
    stream_res = run_stream_to_memory(
        spark, hourly_aggregate_stream(events_stream(spark, SF_SMOKE))
    )
    batch = (
        load_table(spark, "events", SF_SMOKE)
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )
    assert stream_res.count() == batch.count()
    assert stream_res.exceptAll(batch).count() == 0
    assert batch.exceptAll(stream_res).count() == 0


def test_sessionize_stream_equals_batch(spark):
    from naru_spark.streaming.events import sessionize

    batch = sessionize(load_table(spark, "events", SF_SMOKE), gap="30 minutes")
    stream_res = run_stream_to_memory(
        spark,
        sessionize(events_stream(spark, SF_SMOKE), gap="30 minutes", watermark="2 hours"),
    )
    assert stream_res.count() == batch.count()
    assert stream_res.exceptAll(batch).count() == 0


def test_sessionize_gap_semantics(spark):
    """Two bursts 40 min apart -> two sessions; intra-burst 10-min gaps merge."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 1.0),
        (1, base + dt.timedelta(minutes=10), 1.0),
        (1, base + dt.timedelta(minutes=50), 1.0),  # 40 min gap -> new session
        (2, base, 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    from naru_spark.streaming.events import sessionize

    got = {
        (r.user_id, r.session_start, r.n_events)
        for r in sessionize(df, gap="30 minutes").collect()
    }
    assert got == {
        (1, base, 2),
        (1, base + dt.timedelta(minutes=50), 1),
        (2, base, 1),
    }


def test_stateful_user_totals_equals_batch(spark):
    from naru_spark.streaming.events import events_stream, user_totals_stateful

    stream_res = run_stream_to_memory(
        spark,
        user_totals_stateful(events_stream(spark, SF_SMOKE)),
        output_mode="update",
    )
    batch = (
        load_table(spark, "events", SF_SMOKE)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
    )
    assert stream_res.count() == batch.count()
    assert stream_res.exceptAll(batch).count() == 0


def test_stream_stream_join_matches_batch(spark):
    """Two-sided watermarked interval join == batch non-equi join."""
    from pyspark.sql import functions as F

    from naru_spark.sources import load_table
    from naru_spark.streaming.events import (
        events_stream,
        run_stream_to_memory,
        stream_stream_interval_join,
    )
    from tests.conftest import SF_SMOKE

    purchases = events_stream(spark, SF_SMOKE).filter(F.col("event_type") == "purchase")
    views = events_stream(spark, SF_SMOKE).filter(F.col("event_type") == "view")
    out = run_stream_to_memory(
        spark,
        stream_stream_interval_join(purchases, views, lookback="1 hour"),
        output_mode="append",
    )
    ev = load_table(spark, "events", SF_SMOKE)
    p = ev.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("l_id"), F.col("user_id").alias("l_key"), F.col("ts").alias("l_ts")
    )
    v = ev.filter("event_type = 'view'").select(
        F.col("event_id").alias("r_id"), F.col("user_id").alias("r_key"),
        F.col("ts").alias("r_ts"), F.col("value").alias("r_value"),
    )
    batch = p.join(
        v,
        (p.l_key == v.r_key)
        & (v.r_ts >= p.l_ts - F.expr("INTERVAL 1 HOUR"))
        & (v.r_ts < p.l_ts),
    ).select("l_id", "r_id", "l_key", "r_ts", "r_value")
    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_parquet_sink_resume_exactly_once(spark, tmp_path):
    """Checkpointed file-sink restart contract: run 1 commits half the
    source; run 2 (same checkpoint, new files) adds ONLY the new half;
    run 3 (same checkpoint, nothing new) adds nothing. Final sink ==
    batch projection, no duplicates."""
    import glob
    import shutil

    from naru_spark.sources import load_table
    from naru_spark.streaming.events import run_stream_to_parquet
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, "events", SF_SMOKE).select("event_id", "event_type", "value")
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    import os

    os.makedirs(src)
    halves = [
        ev.filter(F.pmod("event_id", F.lit(2)) == 0),
        ev.filter(F.pmod("event_id", F.lit(2)) == 1),
    ]
    counts = []
    for i, half in enumerate(halves):
        tmp = str(tmp_path / f"half{i}")
        half.coalesce(1).write.parquet(tmp)
        for j, f in enumerate(sorted(glob.glob(f"{tmp}/part-*.parquet"))):
            shutil.copy(f, f"{src}/half{i}_{j}.parquet")
        stream = spark.readStream.schema(ev.schema).parquet(src)
        run_stream_to_parquet(spark, stream, sink, ckpt)
        counts.append(spark.read.parquet(sink).count())

    total = ev.count()
    assert counts[0] == halves[0].count()  # run 1: first half only
    assert counts[1] == total  # run 2 resumed: everything, once

    # run 3: same checkpoint, no new files -> nothing re-processed
    stream = spark.readStream.schema(ev.schema).parquet(src)
    run_stream_to_parquet(spark, stream, sink, ckpt)
    out = spark.read.parquet(sink)
    assert out.count() == total
    assert out.select("event_id").distinct().count() == total  # no dupes


def test_stream_static_dedup_stateless_ingest(spark):
    """Stream-static anti-join ingest filter: drops content already in the
    static index, keeps everything else (including within-stream dups —
    statelessness is the contract; within-stream dedup belongs to
    dedup_stream/batch compaction)."""
    from naru_spark.streaming.events import (
        documents_stream,
        run_stream_to_memory,
        stream_static_dedup,
    )
    from naru_spark.sources import load_table
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, "documents", SF_SMOKE)
    stream = documents_stream(spark, SF_SMOKE)
    new_b = stream.filter(F.col("doc_id") % 5 == 0)
    index = docs.filter(F.col("doc_id") % 5 != 0)
    got = run_stream_to_memory(
        spark, stream_static_dedup(new_b, index).select("doc_id"), output_mode="append"
    )
    want = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .withColumn("__fp", F.md5("text"))
        .join(index.select(F.md5("text").alias("__fp")).distinct(), "__fp", "left_anti")
        .select("doc_id")
    )
    assert sorted(r.doc_id for r in got.collect()) == sorted(
        r.doc_id for r in want.collect()
    )
