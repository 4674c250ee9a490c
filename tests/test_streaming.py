"""Structured Streaming parity tests (SURVEY.md §2.8).

Each streaming pipeline is checked against its batch twin on the same
data: the streaming result after consuming all input must equal the
batch query's result. Input is split into multiple files and fed with
maxFilesPerTrigger so multiple real micro-batches (and watermark
advances) occur.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_job_spark.plans.registry import QUERIES
from etl_job_spark.sources import load_table
from etl_job_spark.streaming import (
    attribution_join_stream,
    hourly_counts_stream,
    read_events_stream,
    run_to_completion,
    running_user_totals,
    session_stream,
    upsert_stream_sink,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """sf0.001 events re-landed as 4 parquet files (streaming source
    dirs need uniform plain-parquet files; the repartition also forces
    multiple micro-batches under maxFilesPerTrigger)."""
    out = str(tmp_path_factory.mktemp("events_stream") / "events")
    # load_table normalizes ts to TimestampType whichever physical
    # form the generator used (NANOS-as-long or MICROS ntz); re-land
    # as nanos longs, the shape read_events_stream's schema declares
    raw = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.unix_micros("ts") * 1000
    )
    raw.repartition(4).write.mode("overwrite").parquet(out)
    return out


def _rows(df, cols):
    return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())


def test_hourly_counts_stream_matches_batch(spark, sf_dir, events_dir, tmp_path):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    agg = hourly_counts_stream(stream)
    run_to_completion(
        agg.writeStream.format("memory").queryName("hourly_parity").outputMode("complete")
    )
    got = spark.table("hourly_parity")
    want = QUERIES["events_tumbling_hourly"](spark, sf_dir)
    cols = ["window_start", "event_type", "n", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_session_stream_matches_batch(spark, sf_dir, events_dir):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    sess = session_stream(stream)
    run_to_completion(
        sess.writeStream.format("memory").queryName("session_parity").outputMode("complete")
    )
    got = spark.table("session_parity")
    # batch twin keeps a session_id; parity is on the (user, size,
    # duration) multiset, which identifies sessions up to renumbering
    want = QUERIES["events_sessionize"](spark, sf_dir)
    cols = ["user_id", "n_events", "duration_us"]
    assert _rows(got, cols) == _rows(want, cols)


def test_upsert_stream_sink_converges_to_batch(spark, sf_dir, events_dir, tmp_path):
    """K3-as-streaming-sink: update-mode windowed counts merged into a
    parquet target per micro-batch (last writer wins) converge to the
    batch answer — the reference's idempotent late-data reconciliation
    (load_sales_data.py:129-134) in streaming form."""
    target = str(tmp_path / "mart")
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    # the 4 input files are a random split of a 30-day span, so a later
    # micro-batch can carry events ~30 days older than the advanced
    # watermark; the watermark must exceed the source's real disorder
    # or update mode correctly drops those rows as too-late
    agg = hourly_counts_stream(stream, watermark="60 days")
    writer = upsert_stream_sink(
        agg,
        target_path=target,
        keys=["window_start", "event_type"],
        checkpoint=str(tmp_path / "ckpt"),
    )
    run_to_completion(writer)
    got = spark.read.parquet(target)
    want = QUERIES["events_tumbling_hourly"](spark, sf_dir)
    cols = ["window_start", "event_type", "n", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, events_dir):
    """Stream-stream interval join parity: every (purchase, view) pair
    within the lookback must match the static join exactly."""
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    joined = attribution_join_stream(stream, lookback="7 days", watermark="60 days")
    run_to_completion(
        joined.writeStream.format("memory").queryName("attr_parity").outputMode("append")
    )
    got = spark.table("attr_parity")

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    want = p.join(
        v,
        F.expr("p_user = v_user AND v_ts <= p_ts AND v_ts >= p_ts - interval 7 days"),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"), "purchase_id", "view_id",
        F.unix_micros("p_ts").alias("p_us"), F.unix_micros("v_ts").alias("v_us"),
    )
    cols = ["user_id", "purchase_id", "view_id", "p_us", "v_us"]
    assert got.count() > 0
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_dedup_within_watermark(spark, sf_dir, tmp_path):
    """Re-delivered events (the whole input landed twice) collapse to
    one row per event_id — the reference's idempotency as a streaming
    operator."""
    from etl_job_spark.streaming import dedup_events_stream

    src = str(tmp_path / "dup_src")
    # load_table normalizes ts to TimestampType whichever physical
    # form the generator used (NANOS-as-long or MICROS ntz); re-land
    # as nanos longs, the shape read_events_stream's schema declares
    raw = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.unix_micros("ts") * 1000
    )
    raw.repartition(2).write.mode("overwrite").parquet(src)
    raw.repartition(3).write.mode("append").parquet(src)  # redelivery

    stream = read_events_stream(spark, src, max_files_per_trigger=2)
    run_to_completion(
        dedup_events_stream(stream)
        .select("event_id")
        .writeStream.format("memory").queryName("dedup_parity").outputMode("append")
    )
    got = spark.table("dedup_parity")
    assert got.count() == raw.count()
    assert got.distinct().count() == raw.count()


def test_restart_resumes_from_checkpoint_exactly_once(spark, sf_dir, tmp_path):
    """Stop the stream, land MORE input, restart with the SAME
    checkpoint: the second run must process only the new files, and
    the merged sink must equal one batch pass over everything —
    exactly-once across restarts, the property the reference
    approximates by re-running idempotent upserts."""
    src = str(tmp_path / "src")
    target = str(tmp_path / "mart")
    ckpt = str(tmp_path / "ckpt")
    # load_table normalizes ts to TimestampType whichever physical
    # form the generator used (NANOS-as-long or MICROS ntz); re-land
    # as nanos longs, the shape read_events_stream's schema declares
    raw = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.unix_micros("ts") * 1000
    )
    first = raw.filter(F.col("event_id") % 2 == 0)
    second = raw.filter(F.col("event_id") % 2 == 1)

    first.repartition(2).write.mode("overwrite").parquet(src)
    writer = upsert_stream_sink(
        hourly_counts_stream(read_events_stream(spark, src), watermark="60 days"),
        target_path=target, keys=["window_start", "event_type"], checkpoint=ckpt,
    )
    run_to_completion(writer)
    n_first = spark.read.parquet(target).agg(F.sum("n")).first()[0]
    assert n_first == first.count()

    # land the second half, restart from the same checkpoint
    second.repartition(2).write.mode("append").parquet(src)
    writer2 = upsert_stream_sink(
        hourly_counts_stream(read_events_stream(spark, src), watermark="60 days"),
        target_path=target, keys=["window_start", "event_type"], checkpoint=ckpt,
    )
    run_to_completion(writer2)
    got = spark.read.parquet(target)
    want = QUERIES["events_tumbling_hourly"](spark, sf_dir)
    cols = ["window_start", "event_type", "n", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_running_user_totals_converges_to_batch(spark, sf_dir, events_dir, tmp_path):
    """Custom stateful op (applyInPandasWithState): per-user running
    totals re-emitted each batch, merged keyed by user — final state
    equals the batch groupBy."""
    from pyspark.sql import Window

    target = str(tmp_path / "user_totals")
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    totals = running_user_totals(stream)
    writer = upsert_stream_sink(
        totals, target_path=target, keys=["user_id"], checkpoint=str(tmp_path / "ckpt")
    )
    run_to_completion(writer)
    got = spark.read.parquet(target)

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc())
    last = (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", F.col("event_type").alias("last_event"))
    )
    want = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .join(last, "user_id")
    )
    cols = ["user_id", "n_events", "last_event"]
    assert _rows(got, cols) == _rows(want, cols)
    # float accumulation order differs stream-vs-batch; compare to 1e-6
    g = {r["user_id"]: r["total_value"] for r in got.collect()}
    wv = {r["user_id"]: r["total_value"] for r in want.collect()}
    assert g.keys() == wv.keys()
    assert all(abs(g[u] - wv[u]) < 1e-6 for u in g)


def test_kafka_reader_wired_and_env_constraint_pinned(spark):
    """r3 verdict #10 closure: the Kafka source line is WIRED as
    read_kafka_events_stream (same output columns as the rate/file
    sources, so the whole downstream graph is source-parametrized).
    This container ships neither the spark-sql-kafka connector jar nor
    a broker, so constructing the reader must fail with the
    data-source-not-found error — loudly, at construction, not
    silently at runtime. If a deployment adds the jar, the constructor
    instead yields the events shape and this test checks the columns."""
    from etl_job_spark.streaming.pipeline import (
        read_kafka_events_stream,
        read_rate_events_stream,
    )

    rate_cols = read_rate_events_stream(spark).columns
    try:
        df = read_kafka_events_stream(spark, "localhost:9092")
    except Exception as exc:  # jar absent (this container): pinned
        msg = str(exc)
        assert "kafka" in msg.lower()
        assert "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find" in msg
    else:  # jar present (deployment): carries the full events shape
        assert set(rate_cols) <= set(df.columns)


def test_stream_reads_generator_micros_ntz_directly(spark, sf_dir, tmp_path):
    """ADVICE r4: the r4 generator writes events.ts as
    TIMESTAMP(MICROS, NTZ), which the former LongType-only schema
    could not read — streaming over generator-shaped files must work
    without re-landing (the footer-peek auto-detect), and produce the
    same answers as the batch query."""
    out = str(tmp_path / "events_ntz")
    load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    ).repartition(2).write.parquet(out)

    stream = read_events_stream(spark, out, max_files_per_trigger=1)
    agg = hourly_counts_stream(stream, watermark="60 days")
    run_to_completion(
        agg.writeStream.format("memory").queryName("ntz_parity").outputMode("complete")
    )
    got = spark.table("ntz_parity")
    want = QUERIES["events_tumbling_hourly"](spark, sf_dir)
    cols = ["window_start", "event_type", "n", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)

    # explicit override still available for empty-at-start directories
    import pytest as _pytest

    with _pytest.raises(ValueError, match="ts_unit"):
        read_events_stream(spark, out, ts_unit="bogus")


def test_multi_table_batch_lands_exactly_once_and_atomically(spark, tmp_path):
    """The reference's E1→E2 pair (staging merge + mart projection)
    through the transactional catalog sink: a replayed micro-batch —
    same (app, batch) id, DIFFERENT content, the post-crash shape —
    must change neither table, and a crash between the txn commit
    point and manifest publication must heal so both tables agree."""
    import os

    from etl_job_spark.streaming.pipeline import catalog_merge_batch
    from etl_job_spark.table import _manifest_name
    from etl_job_spark.txn import TransactionalCatalog

    root = str(tmp_path / "cat_stream")
    cat = TransactionalCatalog(root)
    app = "ckpt/app1"
    spec = {
        "staging": {"keys": ["k"]},
        "mart": {
            "keys": ["k"],
            # the E2 projection: rename + derived column
            "transform": lambda d: d.selectExpr("k", "upper(v) as mv"),
        },
    }
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    versions = catalog_merge_batch(cat, spec, app, b0, 0)
    assert versions == {"staging": 1, "mart": 1}
    # replay batch 0 with different content (content is not
    # deterministic across a crash): EXACTLY once — nothing changes
    b0_replay = spark.createDataFrame([(1, "XXX"), (9, "z")], "k long, v string")
    assert catalog_merge_batch(cat, spec, app, b0_replay, 0) == {}
    assert {r["v"] for r in cat.table("staging").snapshot(spark).collect()} == {"a", "b"}
    assert {r["mv"] for r in cat.table("mart").snapshot(spark).collect()} == {"A", "B"}
    # batch 1 applies to both
    b1 = spark.createDataFrame([(2, "b2"), (3, "c")], "k long, v string")
    assert catalog_merge_batch(cat, spec, app, b1, 1) == {"staging": 2, "mart": 2}
    # crash between commit point and manifest publication: drop the
    # MART manifest only — the asymmetric state a non-atomic two-table
    # sink would be stuck in
    os.remove(os.path.join(cat.table("mart").manifest_dir, _manifest_name(2)))
    cat2 = TransactionalCatalog(root)  # fresh process
    state = cat2.roll_forward()
    assert state == {"staging": 2, "mart": 2}
    staging = {r["k"]: r["v"] for r in cat2.table("staging").snapshot(spark).collect()}
    mart = {r["k"]: r["mv"] for r in cat2.table("mart").snapshot(spark).collect()}
    assert staging == {1: "a", 2: "b2", 3: "c"}
    assert mart == {k: v.upper() for k, v in staging.items()}
    # replays of BOTH applied batches through the fresh catalog: no-ops
    assert catalog_merge_batch(cat2, spec, app, b0_replay, 0) == {}
    assert catalog_merge_batch(cat2, spec, app, b1, 1) == {}


def test_catalog_stream_sink_writer_builds(spark, tmp_path):
    """The writer constructs against a real (unstarted) stream with the
    checkpoint-derived app id — the same smoke contract as the
    single-table manifest sink."""
    from etl_job_spark.streaming.pipeline import upsert_stream_sink_catalog

    w = upsert_stream_sink_catalog(
        spark.readStream.format("rate").load(),
        str(tmp_path / "cat"),
        {"t1": {"keys": ["value"]}},
        checkpoint=str(tmp_path / "ckpt"),
    )
    assert w is not None
