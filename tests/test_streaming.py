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


def test_watermark_drops_late_data_across_batches(spark, tmp_path):
    """Watermark semantics, demonstrated across REAL micro-batch
    boundaries: maxFilesPerTrigger=1 under availableNow processes the two
    files as two batches in mtime order, the watermark advances to
    (batch-1 max event time - 10 min) between them, and batch 2's
    too-late row (event time far below the watermark) is DROPPED from the
    windowed aggregate — while its fresh rows land normally. Without a
    watermark the same pipeline cannot even run in append mode, which is
    the state-bound trade the watermark exists to make."""
    import os
    import time as _time

    from pyspark.sql import functions as F

    d = str(tmp_path / "in")
    os.makedirs(d)
    base = "2024-01-01 "
    # Three observed semantics pinned here: (1) lateness is judged by
    # WINDOW END vs watermark, not raw event time; (2) the filtering
    # watermark LAGS one batch behind the eviction watermark (a row for a
    # just-closed window one batch later is still healed into the state,
    # not dropped); (3) only a row arriving two batches after its window
    # closed is dropped, and the drop shows in numRowsDroppedByWatermark.
    f1 = [(1, base + "00:05:00"), (2, base + "00:25:00"), (3, base + "01:30:00")]
    f2 = [(5, base + "03:10:00"), (6, base + "03:40:00")]  # advances wm to 03:30
    f3 = [(4, base + "00:10:00")]  # late by TWO batches -> dropped

    def write_one(rows, path, mtime):
        pdf = spark.createDataFrame(rows, ["id", "ts_s"]).select(
            "id", F.to_timestamp("ts_s").alias("ts")
        )
        pdf.coalesce(1).write.mode("overwrite").parquet(path)
        for f in os.listdir(path):
            os.utime(os.path.join(path, f), (mtime, mtime))

    now = _time.time()
    write_one(f1, d + "/b1", now - 100)
    write_one(f2, d + "/b2", now - 50)
    write_one(f3, d + "/b3", now)
    # flatten: file source lists leaf files; move parquet parts up
    import shutil

    for sub, mt in (("b1", now - 100), ("b2", now - 50), ("b3", now)):
        for f in os.listdir(os.path.join(d, sub)):
            if f.endswith(".parquet"):
                src = os.path.join(d, sub, f)
                dst = os.path.join(d, f"{sub}_{f}")
                shutil.move(src, dst)
                os.utime(dst, (mt, mt))
        shutil.rmtree(os.path.join(d, sub))

    stream = (
        spark.readStream.schema("id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").cast("string").alias("w_start"), "n")
    )
    from naru_spark.streaming.events import run_stream_to_memory

    got = {
        r["w_start"]: r["n"]
        for r in run_stream_to_memory(
            spark, agg, output_mode="append"
        ).collect()
    }
    # the 00:00 window holds ONLY batch-1's 2 rows: id=4 (00:10) arrived
    # two batches after the watermark closed its window and was dropped
    assert got.get("2024-01-01 00:00:00") == 2, got
    assert got.get("2024-01-01 01:00:00") == 1, got
    # the 03:00 window is NOT emitted (final wm 03:30 < its end 04:00) —
    # append mode only releases watermark-finalized windows
    assert "2024-01-01 03:00:00" not in got, got
    # a batch aggregate over the same files (no watermark) WOULD count it
    batch = (
        spark.read.parquet(d)
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").cast("string").alias("w_start"), "n")
    )
    bgot = {r["w_start"]: r["n"] for r in batch.collect()}
    assert bgot["2024-01-01 00:00:00"] == 3
