"""Structured Streaming over the events table.

The reference has no streaming surface; this is part of the north-star
extension set. Batch/stream parity: ``hourly_aggregate_stream`` computes the
same tumbling-window aggregation as ``entry_queries.q_events_hourly`` so the
two are cross-checked in tests (availableNow trigger -> memory sink ==
batch result).

Watermarking: 2h on event time — late rows beyond the watermark are dropped
from the windowed state, bounding state size for an unbounded stream.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


def events_stream(spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """readStream over the events parquet (schema pinned from a batch read;
    nanos timestamps handled the same way as the batch loader)."""
    from naru_spark.sources.registry import load_table

    load_table(spark, "events", sf_dir)  # sets nanosAsLong conf if needed
    path = os.path.join(sf_dir, "events.parquet")
    stream_dir = _symlink_stream_dir(path, "events_stream_")
    raw_schema = spark.read.parquet(path).schema  # post-conf schema (ts may be long)
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stream_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":  # nanos-as-long
        # integer `div` (see sources/registry.py — double division loses
        # microsecond precision on nanosecond epochs)
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # timestamp[us]-no-tz parquet surfaces as TIMESTAMP_NTZ, which
    # withWatermark rejects; session is UTC-pinned so the cast is
    # value-preserving (see sources/registry.py:_ntz_to_ltz).
    for c, dtype in stream.dtypes:
        if dtype == "timestamp_ntz":
            stream = stream.withColumn(c, F.col(c).cast("timestamp"))
    return stream


def hourly_aggregate_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h window x event_type: count + sum(value)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("win.start").alias("hour"), "event_type", "n", "sum_value")
    )


def sessionize(events: DataFrame, gap: str = "30 minutes", watermark: str | None = None) -> DataFrame:
    """Per-user session aggregation with a dynamic-gap session window: a
    session extends while successive events arrive within ``gap``; window
    end = last event + gap (Spark ``session_window`` semantics — a new
    event starts a new session iff its gap from the previous event is
    >= ``gap``).

    Works identically on a batch DataFrame and a stream (pass ``watermark``
    for streams to bound session state; late rows beyond it are dropped).
    Scale: one shuffle on user_id; sessions merge map-side within
    partitions, and state per user is O(open sessions), not O(events)."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def user_totals_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running totals kept in explicit GroupState (the
    arbitrary-stateful-processing API — for operators whose semantics the
    built-in windowed aggregations can't express; here the semantics ARE
    expressible as groupBy totals, which is exactly what makes the operator
    parity-testable against the batch aggregate).

    State per key is two scalars — O(distinct users) total, partitioned by
    the groupBy key, so state scales out with executors."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdf_iter, state):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 4)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="n long, s double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(events: DataFrame, watermark: str = "4 hours") -> DataFrame:
    """Streaming exact deduplication with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps each seen key only until the
    event-time watermark passes it, so state is O(keys per watermark
    horizon) instead of O(all keys ever) — the only viable exact-dedup shape
    on an unbounded stream. Parity gate: the input is the events stream
    unioned with itself (every row duplicated), and the deduped output must
    equal the original table exactly."""
    doubled = events.unionAll(events)
    return (
        doubled.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "event_type", "value")
    )


_STREAM_DIR_CACHE: dict[tuple[str, str], str] = {}


def _symlink_stream_dir(table_file_path: str, prefix: str) -> str:
    """FileStreamSource needs a *directory* of files; testdata ships single
    parquet files, so expose each through a symlink dir (zero copy). One
    cached dir per source path — repeated bench/gate/test runs must not
    accumulate orphaned /tmp dirs — cleaned up at interpreter exit."""
    import atexit
    import shutil
    import tempfile

    key = (table_file_path, prefix)
    if key in _STREAM_DIR_CACHE:
        return _STREAM_DIR_CACHE[key]
    stream_dir = tempfile.mkdtemp(prefix=prefix)
    os.symlink(table_file_path, os.path.join(stream_dir, os.path.basename(table_file_path)))
    atexit.register(shutil.rmtree, stream_dir, ignore_errors=True)
    _STREAM_DIR_CACHE[key] = stream_dir
    return stream_dir


def documents_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """readStream over the documents parquet (schema pinned from a batch
    read; single-file table exposed through a cached symlink dir like
    ``events_stream``)."""
    path = os.path.join(sf_dir, "documents.parquet")
    stream_dir = _symlink_stream_dir(path, "documents_stream_")
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stream_dir)
    )


def stream_static_dedup(
    new_stream: DataFrame,
    index_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming-ingest dedup: drop every incoming document whose content
    hash already exists in the static indexed corpus, via a stream-static
    LEFT ANTI equi-join on md5(text).

    This operator is deliberately STATELESS — no watermark, no state store:
    the static side is a compact hash column (broadcast or shuffled-static
    by Catalyst), so the filter scales to an unbounded ingest stream with
    zero streaming state. Within-stream duplicates are NOT collapsed here;
    that is ``dedup_stream``'s job (bounded-state
    dropDuplicatesWithinWatermark) or a downstream batch compaction —
    composing the two keeps each stage's state story explicit."""
    index_fp = index_df.select(F.md5(F.col(text_col)).alias("__fp")).distinct()
    return (
        new_stream.withColumn("__fp", F.md5(F.col(text_col)))
        .join(index_fp, "__fp", "left_anti")
        .drop("__fp")
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    lookback: str = "1 hour",
    left_wm: str = "2 hours",
    right_wm: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: right events within ``lookback`` BEFORE
    each left event (same ``key``). Both sides carry event-time watermarks
    plus the time-range join condition — exactly what lets Spark bound the
    two-sided join state: a buffered right row can be dropped once the left
    watermark passes its ts + lookback. Without the range condition the
    state would grow forever.

    Columns are prefixed l_/r_ (two readers of the same source must not
    collide)."""
    l = left.select(
        F.col("event_id").alias("l_id"),
        F.col(key).alias("l_key"),
        F.col("ts").alias("l_ts"),
    ).withWatermark("l_ts", left_wm)
    r = right.select(
        F.col("event_id").alias("r_id"),
        F.col(key).alias("r_key"),
        F.col("ts").alias("r_ts"),
        F.col("value").alias("r_value"),
    ).withWatermark("r_ts", right_wm)
    cond = (
        (l["l_key"] == r["r_key"])
        & (r["r_ts"] >= l["l_ts"] - F.expr(f"INTERVAL {lookback}"))
        & (r["r_ts"] < l["l_ts"])
    )
    return l.join(r, cond, "inner").select("l_id", "r_id", "l_key", "r_ts", "r_value")


def run_stream_to_parquet(
    spark: SparkSession,
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
) -> None:
    """Drive a stream into a DURABLE parquet file sink with availableNow
    and a checkpoint. The checkpoint (WAL + source offsets + file-sink
    manifest) is what makes restarts exactly-once: a second run with the
    same checkpoint processes only files the first run had not committed,
    and the sink manifest atomically excludes any partially-written
    output. This is the production shape of every batch-to-stream
    backfill; the memory sink (run_stream_to_memory) is test-only."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_to_memory(
    spark: SparkSession,
    stream_df: DataFrame,
    name: str | None = None,
    output_mode: str = "complete",
    shuffle_partitions: int | None = 8,
) -> DataFrame:
    """Drive the stream with availableNow (process everything then stop) into
    a memory sink; return the sink contents as a DataFrame.
    applyInPandasWithState streams must pass output_mode='update'.

    ``shuffle_partitions`` pins the stateful-operator partition count for this
    query (a streaming query's state-store count is fixed at first start from
    ``spark.sql.shuffle.partitions`` and persists in the checkpoint — it must
    be sized to expected STATE volume, not the batch-shuffle default; each
    state store carries fixed per-micro-batch overhead, so overshooting
    multiplies latency). Pass None to inherit the session setting."""
    name = name or f"sink_{uuid.uuid4().hex[:8]}"
    conf_key = "spark.sql.shuffle.partitions"
    saved = spark.conf.get(conf_key)
    if shuffle_partitions is not None:
        spark.conf.set(conf_key, str(shuffle_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if shuffle_partitions is not None:
            spark.conf.set(conf_key, saved)
    return spark.sql(f"SELECT * FROM {name}")
