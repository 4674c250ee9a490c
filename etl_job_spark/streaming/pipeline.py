"""Structured Streaming pipelines (SURVEY.md §2.8).

The reference has no streaming engine; its streaming-shaped idioms are
a daily sliding re-fetch window that re-processes late-arriving
corrections (load_sales_data.py:146-147) reconciled by idempotent
upsert (the K3 merge, load_sales_data.py:129-134). These map onto
Structured Streaming as:

- file-source ``readStream`` over the events table (in production: a
  Kafka/queue source with the same downstream graph),
- event-time tumbling windows with a watermark as the principled
  late-data bound (vs the reference's fixed 1-day lookback),
- ``session_window`` for gap-based sessionization,
- ``foreachBatch`` + ``merge_upsert`` as the exactly-once-per-key sink
  — the direct streaming analog of the reference's exists-probe
  upsert, but set-oriented per micro-batch instead of per-row.

Scale notes: state for windowed aggs is keyed by (window, group); the
watermark bounds state size. At 100 TB/day the same graph runs with
`spark.sql.shuffle.partitions` sized to the cluster and RocksDB state
store enabled; nothing here is local-mode-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# File-source streams must declare their schema up front (schema
# inference is a batch-only convenience), and the declared type must
# match the files' physical ts encoding, which is GENERATOR-DEPENDENT:
# driver rounds have landed both TIMESTAMP(NANOS) (readable only as
# bigint via nanosAsLong) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
# (reads as timestamp_ntz). ``read_events_stream`` peeks ONE footer to
# pick the right schema — the streaming mirror of load_table's dual
# handling in sources/catalog.py.
def _events_schema(ts_field) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            ts_field,
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


SESSION_GAP = "30 minutes"


def _detect_ts_unit(path: str) -> str:
    """'nanos' | 'micros_ntz' from one parquet footer (driver-side,
    one ~8 KB read — never a data scan). An empty directory defaults
    to 'nanos', the historical driver encoding."""
    import glob as _glob
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as pq

    candidates = sorted(
        _glob.glob(_os.path.join(path, "*.parquet"))
        or _glob.glob(_os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    if _os.path.isfile(path):
        candidates = [path]
    if not candidates:
        return "nanos"
    t = pq.ParquetFile(candidates[0]).schema_arrow.field("ts").type
    if pa.types.is_timestamp(t) and t.unit != "ns":
        return "micros_ntz"
    return "nanos"


def read_events_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    ts_unit: str = "auto",
) -> DataFrame:
    """Streaming scan of an events parquet directory; ``ts`` is
    normalized to a UTC micros TimestampType whichever physical form
    the files carry.

    ``ts_unit`` — ``"auto"`` (default) peeks one footer at plan time;
    pass ``"nanos"`` (INT64 TIMESTAMP(NANOS) read as long) or
    ``"micros_ntz"`` (TIMESTAMP(MICROS, NTZ)) explicitly when the
    directory is empty at start but its producer's encoding is known.
    Note new files must keep the SAME encoding for the stream's
    lifetime — the schema is fixed at plan time.

    ``maxFilesPerTrigger`` throttles micro-batch size (one file per
    trigger exercises real incremental processing in tests).
    """
    if ts_unit == "auto":
        ts_unit = _detect_ts_unit(path)
    if ts_unit not in ("nanos", "micros_ntz"):
        raise ValueError(f"ts_unit {ts_unit!r}: use 'auto', 'nanos' or 'micros_ntz'")
    # UTC pin: the NTZ→timestamp cast below is wall-clock-preserving
    # only under UTC, and the nanos path tolerates TIMESTAMP(NANOS)
    # parquet on any session (see sources/catalog.load_table)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if ts_unit == "nanos":
        schema = _events_schema(StructField("ts", LongType()))
    else:
        from pyspark.sql.types import TimestampNTZType

        schema = _events_schema(StructField("ts", TimestampNTZType()))
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    import os as _os

    if _os.path.isfile(path):
        # pointing at a single parquet FILE (the driver generator's
        # layout): the file stream source force-sets basePath to any
        # NON-GLOB path and then requires it to be a directory, so a
        # plain file path can never stream. Spelling the filename as a
        # {name} Hadoop glob (matches exactly that file) suppresses
        # the auto-basePath, and the explicit parent-dir basePath
        # anchors partition discovery.
        reader = reader.option("basePath", _os.path.dirname(path))
        path = _os.path.join(_os.path.dirname(path), "{" + _os.path.basename(path) + "}")
    raw = reader.parquet(path)
    if ts_unit == "nanos":
        # integer div: ns values exceed double's 2^53 exact range
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def hourly_counts_stream(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Event-time 1-hour tumbling counts per event_type.

    The streaming twin of the batch ``events_tumbling_hourly`` query:
    identical grouping and output columns, plus a watermark bounding
    how late data may arrive (the reference's fixed yesterday+today
    re-fetch window, made explicit). Partial aggregation happens
    map-side before the (window, event_type) shuffle.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:00:00").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def session_stream(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Gap-based sessionization with the built-in ``session_window``
    (30-minute inactivity gap) — the streaming twin of the batch
    ``events_sessionize`` query. State per (user, open session),
    closed by the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", SESSION_GAP), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
        )
        .select("user_id", "n_events", "duration_us")
    )


def upsert_stream_sink(
    stream: DataFrame,
    target_path: str,
    keys: list[str],
    checkpoint: str,
    partition_by: list[str] | None = None,
    order_col: str | None = None,
):
    """Write a streaming DataFrame with merge-upsert semantics: each
    micro-batch is merged into the parquet target keyed by ``keys`` —
    the reference's K3 idempotent upsert (load_sales_data.py:129-134)
    as a streaming sink. Re-delivered or corrected rows update in
    place; the sink is idempotent per key.

    ``order_col`` defines last-writer-wins when one micro-batch can
    carry the same key twice (e.g. a raw CDC feed). When None, the
    stream must be unique per key within each micro-batch (true for
    watermarked aggregations in update mode, whose output is one row
    per group per batch) — otherwise both rows are inserted.
    """
    from etl_job_spark.operators.merge import merge_upsert_path

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_upsert_path(
            batch_df.sparkSession,
            target_path,
            batch_df,
            keys,
            order_col=order_col,
            partition_by=partition_by,
        )

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


def dedup_events_stream(events: DataFrame, watermark: str = "60 days") -> DataFrame:
    """Streaming exactly-once-per-event_id: drop re-delivered events
    inside the watermark horizon (SURVEY.md §2.8 'dropDuplicates
    within watermark' — the reference's exists-probe idempotency as a
    streaming operator). State holds one entry per event_id seen
    within the horizon; the watermark bounds it."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def attribution_join_stream(
    events: DataFrame, lookback: str = "7 days", watermark: str = "60 days"
) -> DataFrame:
    """Stream-stream interval join: each purchase event pairs with every
    view by the same user within ``lookback`` before it — the streaming
    attribution join. Both sides carry watermarks and the join
    condition bounds event-time distance, so state for either side is
    evictable (unbounded joins are rejected by Spark for exactly the
    100 TB reason). The batch twin is the same join on the static
    table; the as-of variant (latest view only) is operators/asof.py.
    """
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", watermark)
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    ).withWatermark("v_ts", watermark)
    cond = F.expr(
        f"p_user = v_user AND v_ts <= p_ts AND v_ts >= p_ts - interval {lookback}"
    )
    return purchases.join(views, cond, "inner").select(
        F.col("p_user").alias("user_id"), "purchase_id", "view_id",
        F.unix_micros("p_ts").alias("p_us"), F.unix_micros("v_ts").alias("v_us"),
    )


USER_TOTALS_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_event string"
_USER_STATE_SCHEMA = "n bigint, total double, last_ts bigint, last_event string"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (count, value-total, latest event_type), re-emitted each
    micro-batch the user appears in.

    This is the escape hatch for state machines the built-in windowed
    aggs can't express (the built-ins cover everything the reference
    needs — this demonstrates the extension point). State is one small
    tuple per user, partitioned by the grouping key; Arrow moves each
    group's rows as pandas batches, never row-at-a-time.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total, last_ts, last_event = (
            state.get if state.exists else (0, 0.0, -1, "")
        )
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            # deterministic "latest": max (ts, event_id) wins across batches
            idx = pdf["ts"].astype("int64").idxmax()
            ts_us = int(pdf["ts"].astype("int64").loc[idx])
            if ts_us > last_ts:
                last_ts, last_event = ts_us, str(pdf["event_type"].loc[idx])
        state.update((n, round(total, 6), last_ts, last_event))
        import pandas as pd

        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 6)],
                "last_event": [last_event],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=USER_TOTALS_SCHEMA,
        stateStructType=_USER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_completion(writer, timeout_s: int = 300) -> None:
    """Start a writeStream with an availableNow trigger and block until
    all currently-available input is processed — batch-equivalent
    semantics used by tests and backfills."""
    q = writer.trigger(availableNow=True).start()
    try:
        q.awaitTermination(timeout_s)
    finally:
        q.stop()


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def enable_rocksdb_state(spark: SparkSession) -> str | None:
    """Switch stateful streaming to the RocksDB state store (ships with
    Spark) and return the previous provider setting (for restore).

    Why at scale: the default HDFS-backed store keeps every key in
    executor heap — a dedup or large-window state of 10⁸ keys OOMs.
    RocksDB spills state to local disk with bounded memory and
    changelog checkpointing, which is the production setting for every
    stateful pipeline in this module.
    """
    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, ROCKSDB_PROVIDER)
    return prev


def read_rate_events_stream(
    spark: SparkSession,
    rows_per_batch: int = 1000,
    start_timestamp_ms: int = 1_700_000_000_000,
    advance_ms_per_batch: int = 60_000,
) -> DataFrame:
    """Non-file streaming source shaped to the events schema, built on
    the deterministic ``rate-micro-batch`` source (fixed rows per
    batch, fixed event-time progression) — the stand-in for a Kafka
    topic in this container: same downstream graph
    (watermark → window/dedup → foreachBatch merge), different source
    line. Event attributes derive arithmetically from the monotonic
    ``value`` counter, so any batch's contents are reproducible.

    The production queue line is ``read_kafka_events_stream``: same
    output columns, so everything downstream — watermarks, windows,
    state store, sinks — swaps sources with one call-site change."""
    raw = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("startTimestamp", start_timestamp_ms)
        .option("advanceMillisPerBatch", advance_ms_per_batch)
        .load()
    )
    types = F.array(F.lit("view"), F.lit("click"), F.lit("purchase"))
    return raw.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 50).alias("user_id"),
        F.element_at(types, (F.col("value") % 3 + 1).cast("int")).alias("event_type"),
        (F.col("value").cast("double") * 1.5).alias("value"),
    )


KAFKA_PACKAGE = "org.apache.spark:spark-sql-kafka-0-10_2.13"


def read_kafka_events_stream(
    spark: SparkSession,
    bootstrap: str,
    topic: str = "events",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int = 100_000,
) -> DataFrame:
    """Kafka topic → the events stream shape (SURVEY.md §2.8; the
    production mapping of the reference's daily re-fetch,
    load_sales_data.py:146-147, onto a queue source).

    The value payload is JSON decoded against ``EVENTS_RAW_SCHEMA``
    (explicit schema — streaming never infers) with the same
    nanos→micros ts normalization as the file source, so the returned
    frame is column-for-column interchangeable with
    ``read_events_stream`` / ``read_rate_events_stream`` and feeds the
    identical downstream graph. ``maxOffsetsPerTrigger`` bounds
    micro-batch size (backpressure); at scale one Kafka partition maps
    to one input partition, so topic partitioning sizes source
    parallelism.

    Requires the ``spark-sql-kafka-0-10`` connector (ships separately
    from pyspark; put ``{KAFKA_PACKAGE}:<spark-version>`` on
    ``spark.jars.packages``). This container has neither the jar nor a
    broker, so the constructor raising ``DATA_SOURCE_NOT_FOUND`` here
    is expected and pinned by tests/test_streaming.py; the graph it
    feeds is exercised through the rate and file sources, which cover
    everything downstream of the reader line.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("maxOffsetsPerTrigger", max_offsets_per_trigger)
        .load()
    )
    decoded = raw.select(
        F.from_json(F.col("value").cast("string"), EVENTS_RAW_SCHEMA).alias("e")
    ).select("e.*")
    return decoded.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def upsert_stream_sink_manifest(
    stream: DataFrame,
    table_path: str,
    keys: list[str],
    checkpoint: str,
    order_col: str | None = None,
    txn_app_id: str | None = None,
    **merge_kw,
):
    """``upsert_stream_sink`` on a ManifestTable backend: each
    micro-batch MERGEs into a manifest-committed table, so downstream
    readers keep a consistent pinned snapshot while batches land, and
    partitioned tables get file-pruned merges. This is the
    concurrent-reader-safe production sink; the parquet-path variant
    remains for simple single-writer local layouts.

    Exactly-once on restart: each merge commits as streaming
    transaction ``(txn_app_id, batch_id)`` — the manifest's per-app
    high-water mark makes a replayed micro-batch (Structured Streaming
    re-runs the last uncommitted batch after a crash) a metadata-only
    no-op, even when batch content is not deterministic. The app id
    defaults to the checkpoint path, the one identity that is stable
    across restarts of the same query (query ids are not).

    ``**merge_kw`` forwards the matched clauses to ``merge`` — the
    CDC-apply shape: a Debezium-style stream carrying a tombstone flag
    passes ``when_matched_delete="_deleted"`` (flagged rows delete
    their target and never insert), a narrow enrichment stream passes
    ``when_matched_update=[cols]``. CDC streams should ALSO pass
    ``order_col`` (the LSN/ts column): without it, a batch carrying
    one key both flagged and unflagged RAISES (ambiguous — see
    ``merge_clauses``), killing the query, and the ambiguity check
    itself costs one extra aggregate per micro-batch; with it, the
    batch dedups to last-writer-wins first and the check never runs."""
    from etl_job_spark.table import ManifestTable

    table = ManifestTable(table_path)
    app_id = txn_app_id or checkpoint.rstrip("/")

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        table.merge(
            batch_df.sparkSession,
            batch_df,
            keys,
            order_col=order_col,
            txn=(app_id, batch_id),
            **merge_kw,
        )

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


def catalog_merge_batch(
    catalog,
    tables: dict[str, dict],
    app_id: str,
    batch_df: DataFrame,
    batch_id: int,
) -> dict[str, int]:
    """Land ONE micro-batch into every listed table of a
    ``TransactionalCatalog`` atomically and exactly once — the batch
    body of ``upsert_stream_sink_catalog``, factored out so tests and
    manual replay drive the identical code path.

    Each table's spec is ``{"keys": [...]}`` plus optional
    ``"transform"`` (callable ``batch_df -> DataFrame``, e.g. the
    staging→mart projection), ``"order_col"``, and ``"merge_kw"``
    (matched clauses forwarded to ``merge`` — the CDC-apply shape,
    e.g. ``{"when_matched_delete": "_deleted"}``). Every merge carries
    the streaming transaction ``(app_id, batch_id)``, so each table's
    manifest ledger marks the batch applied; the whole group commits
    through ONE transaction-log record, so a crash can never leave the
    staging table with a batch the mart lacks. On replay every merge
    sees its ledger mark and stages nothing — the catalog publishes no
    record at all. Returns the committed versions ({} for a fully
    replayed batch)."""
    batch_df = batch_df.persist()
    try:

        def ops(txn) -> None:
            for name, spec in tables.items():
                transform = spec.get("transform") or (lambda d: d)
                txn.merge(
                    name,
                    batch_df.sparkSession,
                    transform(batch_df),
                    list(spec["keys"]),
                    spec.get("order_col"),
                    txn=(app_id, batch_id),
                    **(spec.get("merge_kw") or {}),
                )

        return catalog.commit(ops)
    finally:
        batch_df.unpersist()


def upsert_stream_sink_catalog(
    stream: DataFrame,
    catalog_root: str,
    tables: dict[str, dict],
    checkpoint: str,
    txn_app_id: str | None = None,
):
    """MULTI-table exactly-once streaming sink: each micro-batch lands
    in every listed table of one ``TransactionalCatalog`` through a
    single atomic transaction-log record, with the per-table
    ``(app_id, batch_id)`` ledger making replays metadata-only no-ops.
    This is the reference's E1→E2 pair (staging upsert + mart rebuild,
    load_sales_data.py then kicc_to_tb_sales.py) under a restarted
    stream: Structured Streaming re-runs the last uncommitted batch
    after a crash, and here neither table can double-apply it NOR can
    one table apply it without the other — the two failure modes the
    single-table sink (``upsert_stream_sink_manifest``) cannot rule
    out across tables. Spec shape per table: see
    ``catalog_merge_batch``. The app id defaults to the checkpoint
    path, the one identity stable across restarts of the same query."""
    from etl_job_spark.txn import TransactionalCatalog

    catalog = TransactionalCatalog(catalog_root)
    app_id = txn_app_id or checkpoint.rstrip("/")

    def _land(batch_df: DataFrame, batch_id: int) -> None:
        catalog_merge_batch(catalog, tables, app_id, batch_df, batch_id)

    return (
        stream.writeStream.foreachBatch(_land)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


def dedup_batch_into_catalog(
    catalog,
    app_id: str,
    batch_df: DataFrame,
    batch_id: int,
    corpus_table: str = "corpus",
    store_table: str = "signatures",
    text_col: str = "text",
    num_hashes: int = 12,
    band_size: int = 3,
    n_buckets: int = 64,
) -> dict[str, int]:
    """Land ONE micro-batch of documents deduplicated against
    everything kept so far — the batch body of
    ``incremental_dedup_sink``, factored out so tests and manual
    replay drive the identical code path.

    The batch resolves against the COMMITTED signature store (a
    bucket-pruned ``MinHashStore.dedup_batch`` probe — never a corpus
    rescan) plus itself; then the surviving documents MERGE into
    ``corpus_table`` and their bands MERGE into ``store_table``
    through ONE transaction-log record, both carrying the streaming
    ledger ``(app_id, batch_id)``.

    Exactly-once on replay: after a crash between store commit and
    checkpoint advance, Structured Streaming re-runs the batch — its
    re-probe now sees the batch's OWN bands in the store and resolves
    differently, but that recomputed resolution is discarded: both
    merges find their ledger mark and stage nothing, the catalog
    publishes no record (the same content-independence guarantee
    ``catalog_merge_batch`` documents). Neither table can double-apply
    NOR diverge from the other. Returns committed versions ({} for a
    fully replayed batch)."""
    from etl_job_spark.operators.dedup import MinHashStore

    store = MinHashStore(
        catalog.table(store_table).path,
        num_hashes=num_hashes,
        band_size=band_size,
        n_buckets=n_buckets,
    )
    batch_df = batch_df.persist()
    try:
        spark = batch_df.sparkSession
        res = store.dedup_batch(spark, batch_df, text_col)
        kept = batch_df.join(
            res.filter(F.col("kept") == 1).select("doc_id"), "doc_id", "left_semi"
        ).persist()
        try:
            bands = store.bands_of(kept, text_col)

            def ops(txn) -> None:
                txn.merge(corpus_table, spark, kept, ["doc_id"], txn=(app_id, batch_id))
                txn.merge(
                    store_table, spark, bands, ["doc_id", "band"], txn=(app_id, batch_id)
                )

            return catalog.commit(ops)
        finally:
            kept.unpersist()
    finally:
        store.release()  # per-batch band cache must not accumulate
        batch_df.unpersist()


def incremental_dedup_sink(
    stream: DataFrame,
    catalog_root: str,
    checkpoint: str,
    corpus_table: str = "corpus",
    store_table: str = "signatures",
    text_col: str = "text",
    txn_app_id: str | None = None,
    num_hashes: int = 12,
    band_size: int = 3,
    n_buckets: int = 64,
    compact_every: int | None = None,
    compact_target_rows: int = 1_000_000,
):
    """Streaming corpus ingestion with CROSS-BATCH dedup: each
    micro-batch of documents drops everything near-duplicating any
    previously KEPT document (or a smaller-id batch-mate), then the
    survivors and their MinHash bands land atomically in a
    ``TransactionalCatalog`` — the continuous form of the
    ``MinHashStore`` probe→resolve→absorb cycle, with the same
    exactly-once ledger semantics as ``upsert_stream_sink_catalog``.

    The signature store is created (empty, sig_bucket-partitioned) at
    sink construction so every batch probe gets partition-pruned file
    skipping; per-batch cost is O(batch + matching store partitions),
    never O(corpus). Documents are (doc_id bigint, text string, …) —
    extra columns ride into the corpus table untouched.

    ``compact_every=N`` is the upkeep cadence: every N committed
    batches, BOTH tables run ``compact_small_files`` — each micro-batch
    appends one file set per touched sig_bucket partition, so an
    unattended stream otherwise fragments the store and every probe's
    file-skipping read pays O(batches) footer opens per matching
    partition. Compaction is content-preserving maintenance OUTSIDE the
    ledgered commit: a crash-replayed batch at the cadence boundary
    merely re-runs a bin-pack that finds nothing worth rewriting (the
    call returns the current version when no file is fragmented), so
    exactly-once of the DATA is untouched."""
    from etl_job_spark.operators.dedup import MinHashStore
    from etl_job_spark.txn import TransactionalCatalog

    catalog = TransactionalCatalog(catalog_root)
    app_id = txn_app_id or checkpoint.rstrip("/")
    store = MinHashStore(
        catalog.table(store_table).path,
        num_hashes=num_hashes,
        band_size=band_size,
        n_buckets=n_buckets,
    )
    if not store.exists():
        # zero-file version carrying the bands schema + partition spec
        empty = stream.sparkSession.createDataFrame(
            [], "doc_id bigint, band int, sig string, sig_bucket bigint"
        )
        catalog.table(store_table).overwrite(empty, partition_by=["sig_bucket"])

    if compact_every is not None and (
        not isinstance(compact_every, int) or compact_every < 1
    ):
        raise ValueError(f"compact_every must be a positive integer (got {compact_every!r})")

    def _land(batch_df: DataFrame, batch_id: int) -> None:
        dedup_batch_into_catalog(
            catalog,
            app_id,
            batch_df,
            batch_id,
            corpus_table,
            store_table,
            text_col,
            num_hashes,
            band_size,
            n_buckets,
        )
        if compact_every is not None and (batch_id + 1) % compact_every == 0:
            spark = batch_df.sparkSession

            def upkeep(txn) -> None:
                # through the log, NOT directly on the tables: replay
                # tracks versions purely from the log, so out-of-band
                # commits would abort every later batch's transaction
                for name in (store_table, corpus_table):
                    txn.compact_small_files(
                        name, spark, target_rows_per_file=compact_target_rows
                    )

            catalog.commit(upkeep)

    return (
        stream.writeStream.foreachBatch(_land)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
