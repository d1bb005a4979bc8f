from naru_spark.streaming.events import events_stream, hourly_aggregate_stream, run_stream_to_memory

__all__ = ["events_stream", "hourly_aggregate_stream", "run_stream_to_memory"]
