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
