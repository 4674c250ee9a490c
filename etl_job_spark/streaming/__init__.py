from etl_job_spark.streaming.cdf import (
    TableChangesDataSource,
    read_table_changes,
)
from etl_job_spark.streaming.pipeline import (
    attribution_join_stream,
    catalog_merge_batch,
    dedup_events_stream,
    enable_rocksdb_state,
    hourly_counts_stream,
    read_events_stream,
    read_kafka_events_stream,
    read_rate_events_stream,
    run_to_completion,
    running_user_totals,
    session_stream,
    upsert_stream_sink,
    upsert_stream_sink_catalog,
    upsert_stream_sink_manifest,
)

__all__ = [
    "TableChangesDataSource",
    "read_table_changes",
    "read_events_stream",
    "read_kafka_events_stream",
    "read_rate_events_stream",
    "attribution_join_stream",
    "dedup_events_stream",
    "enable_rocksdb_state",
    "hourly_counts_stream",
    "session_stream",
    "running_user_totals",
    "upsert_stream_sink",
    "upsert_stream_sink_catalog",
    "upsert_stream_sink_manifest",
    "catalog_merge_batch",
    "run_to_completion",
]
