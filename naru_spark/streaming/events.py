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
    import tempfile

    from naru_spark.sources.registry import load_table

    load_table(spark, "events", sf_dir)  # sets nanosAsLong conf if needed
    path = os.path.join(sf_dir, "events.parquet")
    # FileStreamSource needs a *directory* of files; testdata ships a single
    # parquet file, so expose it through a symlink dir (zero copy).
    stream_dir = tempfile.mkdtemp(prefix="events_stream_")
    link = os.path.join(stream_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(path, link)
    raw_schema = spark.read.parquet(path).schema  # post-conf schema (ts may be long)
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stream_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":  # nanos-as-long
        stream = stream.withColumn("ts", F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long")))
    return stream


def hourly_aggregate_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h window x event_type: count + sum(value)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("win.start").alias("hour"), "event_type", "n", "sum_value")
    )


def run_stream_to_memory(spark: SparkSession, stream_df: DataFrame, name: str | None = None) -> DataFrame:
    """Drive the stream with availableNow (process everything then stop) into
    a memory sink; return the sink contents as a DataFrame."""
    name = name or f"sink_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")
