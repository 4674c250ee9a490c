from etl_job_spark.streaming.pipeline import (
    attribution_join_stream,
    dedup_events_stream,
    hourly_counts_stream,
    read_events_stream,
    run_to_completion,
    running_user_totals,
    session_stream,
    upsert_stream_sink,
)

__all__ = [
    "read_events_stream",
    "attribution_join_stream",
    "dedup_events_stream",
    "hourly_counts_stream",
    "session_stream",
    "running_user_totals",
    "upsert_stream_sink",
    "run_to_completion",
]
