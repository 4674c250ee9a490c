"""RocksDB state store + non-file (rate) streaming source.

Round-1 streaming coverage was file-source/availableNow with the
default heap state store; this pins the two production pieces the
container can exercise: the deterministic rate-micro-batch source
feeding the same event graph, and stateful aggregation running on the
RocksDB state store provider (bounded-memory state — the 100 TB
setting), proven by the RocksDB checkpoint layout on disk.
"""

from __future__ import annotations

import glob
import os
import time

from pyspark.sql import functions as F

from etl_job_spark.streaming import pipeline as sp


def _restore(spark, key, prev):
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


def test_rate_source_stateful_agg_on_rocksdb(spark, tmp_path):
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = sp.enable_rocksdb_state(spark)
    try:
        assert spark.conf.get(key) == sp.ROCKSDB_PROVIDER
        events = sp.read_rate_events_stream(spark, rows_per_batch=300)
        counts = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        ckpt = str(tmp_path / "ckpt")
        q = (
            counts.writeStream.format("memory")
            .queryName("rate_counts")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = time.time() + 60
            total = 0
            while time.time() < deadline:
                rows = spark.sql("SELECT sum(n) AS t FROM rate_counts").collect()
                total = rows[0].t or 0
                if total >= 600:  # ≥ 2 deterministic batches aggregated
                    break
                time.sleep(0.5)
        finally:
            q.stop()
        assert total >= 600 and total % 300 == 0, total
        # rate events derive from a monotonic counter: types balance
        per_type = {r.event_type: r.n for r in spark.sql("SELECT * FROM rate_counts").collect()}
        assert set(per_type) == {"view", "click", "purchase"}
        assert max(per_type.values()) - min(per_type.values()) <= 1
        # RocksDB provider really held the state: its checkpoint layout
        # (zip snapshots / changelog files) exists under state/
        state_files = glob.glob(os.path.join(ckpt, "state", "**", "*"), recursive=True)
        rocks = [f for f in state_files if f.endswith((".zip", ".changelog"))]
        assert rocks, f"no RocksDB checkpoint artifacts under {ckpt}/state"
    finally:
        _restore(spark, key, prev)


def test_rate_events_schema_matches_file_source_graph(spark):
    """The rate stream must slot into the same downstream graph as the
    parquet events stream (watermark + tumbling window compiles)."""
    events = sp.read_rate_events_stream(spark, rows_per_batch=10)
    agg = sp.hourly_counts_stream(events.select("event_id", "ts", "user_id", "event_type", "value"))
    assert set(agg.schema.fieldNames()) == {"window_start", "event_type", "n", "sum_value"}
    assert agg.isStreaming
