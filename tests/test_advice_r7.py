"""Round-7 advisory fixes: NaN partition-prune soundness, non-UTC
timestamp stat-probe gating, calendar-transform arg validation, conf
leak on the derived-column error path, and the txn replay/vacuum race.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from etl_job_spark.table import ManifestTable, _PartitionField


def test_nan_partition_value_never_pruned(spark, tmp_path):
    """Spark orders NaN greater than every double and NaN = NaN as
    TRUE; Python's NaN comparisons are all false. A NaN partition dir
    must never be pruned by range or equality predicates."""
    t = ManifestTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [("a", 0.2), ("b", 1.0), ("c", float("nan"))], "k string, x double"
    )
    t.overwrite(df, partition_by=["x"])

    got = t.snapshot_where(spark, [("x", ">", 0.5)])
    assert sorted(r.k for r in got.collect()) == ["b", "c"]  # NaN > 0.5 in Spark

    got_eq = t.snapshot_where(spark, [("x", "=", float("nan"))])
    assert [r.k for r in got_eq.collect()] == ["c"]  # NaN = NaN is TRUE in Spark

    got_in = t.snapshot_where(spark, [("x", "in", [float("nan"), 0.2])])
    assert sorted(r.k for r in got_in.collect()) == ["a", "c"]


def test_nan_probe_on_int_partition_keeps_file(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame([("a", 1), ("b", 2)], "k string, x int"),
        partition_by=["x"],
    )
    # a NaN probe against an int column: Spark promotes to double,
    # NaN > everything — no file may be pruned (result itself is empty
    # for '=', but the prune must not be the reason)
    got = t.snapshot_where(spark, [("x", "<", float("nan"))])
    assert sorted(r.k for r in got.collect()) == ["a", "b"]


def test_non_utc_session_gates_timestamp_stat_pruning(spark, tmp_path):
    """Under a non-UTC session the pruned read must agree with the
    unpruned filter, whatever the engine's literal interpretation —
    the gate simply disables timestamp probes outside UTC."""
    t = ManifestTable(str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame(
            [("a", dt.datetime(2024, 1, 1, 0, 0))], "k string, ts timestamp"
        )
    )
    tz_key = "spark.sql.session.timeZone"
    prev = spark.conf.get(tz_key)
    try:
        spark.conf.set(tz_key, "Asia/Seoul")
        for probe in (dt.datetime(2024, 1, 1, 5, 0), dt.datetime(2023, 12, 31, 20, 0)):
            got = t.snapshot_where(spark, [("ts", ">=", probe)])
            ref = t.snapshot(spark).filter(F.col("ts") >= F.lit(probe))
            assert got.count() == ref.count()
    finally:
        spark.conf.set(tz_key, prev)


def test_python_local_tz_exact_timestamp_probe(spark, tmp_path):
    """The knob that actually bends naive-datetime literals is the
    PYTHON process's local zone (``TimestampType.toInternal`` via
    mktime — neither session nor JVM zone moves ``F.lit(datetime)``).
    The probe now encodes through the same conversion, so pruning
    stays EXACT under a Seoul process zone — where the old
    wall-as-UTC encode pruned a file whose rows match."""
    import time

    t = ManifestTable(str(tmp_path / "t"))
    # stored instant 2024-01-01T00:00Z
    t.overwrite(
        spark.createDataFrame(
            [("a", dt.datetime(2024, 1, 1, 0, 0))], "k string, ts timestamp"
        )
    )
    prev_tz = os.environ.get("TZ")
    try:
        os.environ["TZ"] = "Asia/Seoul"
        time.tzset()
        # probe wall 05:00 -> Seoul -> 2023-12-31T20:00Z; stored
        # 00:00Z >= that, so the row MATCHES — while the wall-as-UTC
        # encode (05:00Z > file max 00:00Z) would have pruned the file
        probe = dt.datetime(2024, 1, 1, 5, 0)
        got = t.snapshot_where(spark, [("ts", ">=", probe)])
        ref = t.snapshot(spark).filter(F.col("ts") >= F.lit(probe))
        assert got.count() == ref.count() == 1
    finally:
        if prev_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = prev_tz
        time.tzset()


def test_utc_session_timestamp_pruning_still_fires(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame(
            [("a", dt.datetime(2024, 1, 1)), ("b", dt.datetime(2024, 6, 1))],
            "k string, ts timestamp",
        ).repartition(2, "k")
    )
    man = t._read_manifest(t.latest_version())
    kept, pruned = t._prune_by_key_stats(
        man["files"], [("ts", ">=", dt.datetime(2024, 3, 1))],
        schema=t._manifest_schema(man),
    )
    assert len(pruned) >= 1  # the January-only file is provably cold


def test_calendar_transform_rejects_n_argument():
    for spec in ("hours(3, ts)", "days(7, ts)", "months(2, ts)"):
        with pytest.raises(ValueError, match="takes no N"):
            _PartitionField(spec)
    # bucket/truncate keep requiring theirs
    assert _PartitionField("bucket(4, k)").arg == 4
    with pytest.raises(ValueError, match="needs its N"):
        _PartitionField("truncate(k)")


def test_derived_column_clash_does_not_leak_conf(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    ts_key = "spark.sql.parquet.outputTimestampType"
    before = spark.conf.get(ts_key, None)
    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1), "clash")],
        "k string, ts timestamp, ts_day string",
    )
    with pytest.raises(ValueError, match="derives column"):
        t.overwrite(df, partition_by=["days(ts)"])
    assert spark.conf.get(ts_key, None) == before


def test_replay_tolerates_concurrent_vacuum(spark, tmp_path):
    """A racing process can list txn records against an older
    checkpoint, then have vacuum delete them before it reads — replay
    must restart from the new checkpoint instead of crashing."""
    from etl_job_spark.txn import TransactionalCatalog

    cat = TransactionalCatalog(str(tmp_path / "cat"))
    df = spark.createDataFrame([("a", 1)], "k string, v int")
    for i in range(3):
        cat.commit(lambda tx, i=i: tx.overwrite("t1", df))
    cat.checkpoint()

    # a second instance that resolved the (absent) checkpoint BEFORE
    # the first one checkpointed+vacuumed: it lists the records, then
    # finds them deleted mid-replay
    other = TransactionalCatalog(str(tmp_path / "cat"))
    stale_ids = other._txn_ids()
    assert stale_ids  # records still on disk at listing time
    cat.vacuum(grace_seconds=0.0)
    calls = {"n": 0}
    orig_ck = type(other)._latest_checkpoint
    orig_ids = type(other)._txn_ids

    def stale_ck_once(self):
        calls["n"] += 1
        if calls["n"] == 1:
            return 0, {}  # read before the checkpoint landed
        return orig_ck(self)

    def stale_ids_once(self):
        if calls["n"] == 1:
            return stale_ids  # the pre-vacuum listing
        return orig_ids(self)

    other._latest_checkpoint = stale_ck_once.__get__(other)
    other._txn_ids = stale_ids_once.__get__(other)
    state = other.roll_forward()
    assert state["t1"] == 3
    assert calls["n"] >= 2  # the restart actually happened


def test_bound_datetime_probes_encode_tz_independently():
    """r7 review finding: naive-datetime probes inside shipped matcher
    closures encode through the EXECUTOR process's local zone
    (TimestampType().toInternal uses mktime), so a worker running a
    different TZ than the driver would prune against a shifted
    instant. _normalize_predicates now zone-binds naive probes on the
    driver; this pins that the bound (aware) form encodes to the SAME
    micros under any process TZ, while the naive form demonstrably
    does not."""
    import datetime
    import os
    import time

    from etl_job_spark.table import _bind_naive, _normalize_predicates, _stat_probe_encode

    naive = datetime.datetime(2024, 6, 1, 12, 0, 0)
    bound = _bind_naive(naive)
    assert bound.tzinfo is not None
    # the normal form carries the bound value everywhere
    norm = _normalize_predicates([("ts", "between", (naive, naive))])
    assert all(v.tzinfo is not None for _c, _op, v in norm)

    old_tz = os.environ.get("TZ")
    try:
        os.environ["TZ"] = "UTC"
        time.tzset()
        e_utc = _stat_probe_encode(bound, "timestamp")
        naive_utc = _stat_probe_encode(naive, "timestamp")
        os.environ["TZ"] = "America/New_York"
        time.tzset()
        e_ny = _stat_probe_encode(bound, "timestamp")
        naive_ny = _stat_probe_encode(naive, "timestamp")
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        time.tzset()
    assert e_utc == e_ny  # bound probe: location-independent
    assert naive_utc != naive_ny  # the bug the binding removes
