"""Partition-spec evolution (`ManifestTable.alter_partition_spec`):
metadata-only layout changes, mixed-layout reads, pruning through the
spec HISTORY (`_prune_tmap`), merge soundness over legacy-layout files,
bucket-arg conflicts, raw-column layout changes, restore, compaction
migration.

Iceberg's spec-evolution semantics (spec changes apply to new data;
old files keep their layout; planning is per-file) — re-expressed over
the manifest table format.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from etl_job_spark.table import ManifestTable, _PartitionField, _prune_tmap


def _ts_df(spark, lo, hi):
    """Rows id=lo..hi-1, ts spread one per hour from 2024-01-01, v=id*10."""
    return spark.range(lo, hi).select(
        F.col("id").cast("bigint").alias("id"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00")) +
         F.make_interval(hours=F.col("id").cast("int"))).alias("ts"),
        (F.col("id") * 10).cast("bigint").alias("v"),
    )


def test_alter_spec_is_metadata_only_and_reads_mix(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.overwrite(_ts_df(spark, 0, 200), partition_by=["days(ts)"])
    v1 = t.latest_version()
    old_paths = sorted(e["path"] for e in t._read_manifest(v1)["files"])

    v2 = t.alter_partition_spec(["months(ts)"])
    man = t._read_manifest(v2)
    # metadata-only: identical file list, new spec, history recorded
    assert sorted(e["path"] for e in man["files"]) == old_paths
    assert man["partition_by"] == ["months(ts)"]
    assert man["partition_specs"] == [["days(ts)"]]
    assert man["operation"]["op"] == "alter_partition_spec"

    # same spec again is a no-op commit
    assert t.alter_partition_spec(["months(ts)"]) == v2

    # appends land under the NEW layout; reads union both
    t.append(_ts_df(spark, 200, 300))
    man = t._read_manifest(t.latest_version())
    new_entries = [e for e in man["files"] if e["path"] not in old_paths]
    assert new_entries and all("ts_month" in e["partition"] for e in new_entries)
    assert all("ts_day" in e["partition"]
               for e in man["files"] if e["path"] in old_paths)
    got = t.snapshot(spark).orderBy("id").collect()
    assert [r.id for r in got] == list(range(300))
    assert [r.v for r in got] == [i * 10 for i in range(300)]


def test_snapshot_where_prunes_both_layouts(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "p"))
    # 30 days of hourly rows under days(ts), then 30 more under months(ts)
    t.overwrite(_ts_df(spark, 0, 720).repartition(6), partition_by=["days(ts)"])
    t.alter_partition_spec(["months(ts)"])
    t.append(_ts_df(spark, 720, 1440).repartition(6))
    n_files = len(t._read_manifest(t.latest_version())["files"])

    # a one-day window in the OLD half: ts_day dirs must keep pruning
    # through the spec history, not fall back to scanning every old file
    lo = datetime.datetime(2024, 1, 5)
    hi = datetime.datetime(2024, 1, 6)
    df = t.snapshot_where(spark, [("ts", ">=", lo), ("ts", "<", hi)])
    assert df.count() == 24
    plan = t.last_planning
    assert plan["kept"] < n_files
    # old-layout pruning is day-granular: everything outside Jan 5
    # (old half) AND outside... the new half prunes by month dirs
    kept_parts = [
        e["partition"]
        for e in t._read_manifest(t.latest_version())["files"]
    ]
    assert any("ts_day" in p for p in kept_parts)  # sanity: mixed table

    # a window in the NEW half prunes by month dirs + footer stats
    lo2 = datetime.datetime(2024, 2, 10)
    hi2 = datetime.datetime(2024, 2, 11)
    df2 = t.snapshot_where(spark, [("ts", ">=", lo2), ("ts", "<", hi2)])
    assert df2.count() == 24
    assert t.last_planning["kept"] < n_files


def test_prune_tmap_union_and_conflicts():
    # union across history: both transforms of ts usable
    tm = _prune_tmap(["months(ts)"], [["days(ts)"]])
    assert {f.dirname for f in tm["ts"]} == {"ts_day", "ts_month"}
    # conflicting dirname (bucket arg changed) is dropped entirely
    tm2 = _prune_tmap(["bucket(16, k)"], [["bucket(8, k)"]])
    assert "k" not in tm2
    # non-conflicting bucket history keeps the field once
    tm3 = _prune_tmap(["bucket(8, k)"], [["bucket(8, k)"]])
    assert [f.dirname for f in tm3["k"]] == ["k_bucket"]
    # non-UTC sessions get the empty map (transform mirrors assume UTC)
    assert _prune_tmap(["days(ts)"], [["months(ts)"]], utc=False) == {}
    # a RAW partition column literally named like a transform dirname
    # (raw 'k_bucket' in history, bucket(8, k) now) conflicts too: old
    # entries' raw 'k_bucket' dir values must never be probed as
    # bucket-of-k numbers (silent mis-prune)
    tm4 = _prune_tmap(["bucket(8, k)"], [["k_bucket"]])
    assert "k" not in tm4
    # and symmetrically when the raw spec is current
    tm5 = _prune_tmap(["k_bucket"], [["bucket(8, k)"]])
    assert "k" not in tm5
    # an unrelated raw column in history doesn't poison the transform
    tm6 = _prune_tmap(["bucket(8, k)"], [["region"]])
    assert [f.dirname for f in tm6["k"]] == ["k_bucket"]


def test_merge_updates_rows_in_legacy_layout(spark, tmp_path):
    """The soundness pin: after a spec change, a MERGE touching keys
    that live in OLD-layout files must UPDATE them (a partition-value
    split that skipped legacy entries would append duplicates)."""
    t = ManifestTable(str(tmp_path / "m"))
    t.overwrite(_ts_df(spark, 0, 100), partition_by=["days(ts)"])
    t.alter_partition_spec(["months(ts)"])

    src = _ts_df(spark, 50, 60).withColumn("v", F.lit(-1).cast("bigint"))
    t.merge(spark, src, keys=["id"])
    got = t.snapshot(spark).orderBy("id").collect()
    assert len(got) == 100  # no duplicates
    assert all(r.v == -1 for r in got if 50 <= r.id < 60)
    assert all(r.v == r.id * 10 for r in got if not (50 <= r.id < 60))
    # the rewrite migrated the touched legacy files to the new layout
    man = t._read_manifest(t.latest_version())
    rewritten = [e for e in man["files"] if "ts_month" in e["partition"]]
    assert rewritten


def test_merge_prunes_legacy_raw_partitioned_files(spark, tmp_path):
    """After a raw→transform spec evolution, legacy files have NO
    footer stats for the old raw partition key (partitionBy removed
    the column from the files) — the merge range prune must reason
    from their partition CONSTANTS instead, or every legacy file
    rewrites on every narrow merge forever (found at sf1.0: 0/14
    legacy files carried by reference)."""
    t = ManifestTable(str(tmp_path / "lp"))
    df = spark.range(0, 120).select(
        F.col("id").alias("k"),
        F.lpad((F.col("id") % 12).cast("string"), 2, "0").alias("d"),
        (F.col("id") * 10).alias("v"),
    )
    t.overwrite(df.repartition(F.col("d")), partition_by=["d"])
    t.alter_partition_spec(["truncate(1, d)"])
    before = {e["path"] for e in t._read_manifest(t.latest_version())["files"]}
    # narrow source: keys confined to d in {'03','04'}
    src = df.filter(F.col("d").isin("03", "04")).withColumn(
        "v", F.lit(-1).cast("bigint")
    )
    t.merge(spark, src, keys=["k", "d"])
    man = t._read_manifest(t.latest_version())
    after = {e["path"] for e in man["files"]}
    carried = before & after
    # the 10 cold day-partitions' legacy files carried by reference
    assert len(carried) >= 8, (len(before), len(carried))
    got = {r.k: r.v for r in t.snapshot(spark).collect()}
    assert len(got) == 120
    assert all(
        got[k] == (-1 if (k % 12) in (3, 4) else k * 10) for k in range(120)
    )


def test_bucket_arg_change_stays_exact(spark, tmp_path):
    """bucket(4,k) → bucket(16,k): the shared dirname `k_bucket` means
    old dirs CANNOT be probed with the new arg — the conflict exclusion
    must keep point reads exact on both halves."""
    t = ManifestTable(str(tmp_path / "b"))
    df1 = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    t.overwrite(df1.repartition(4), partition_by=["bucket(4, k)"])
    t.alter_partition_spec(["bucket(16, k)"])
    t.append(spark.range(400, 800).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")).repartition(4))

    for probe in (7, 399, 400, 777):  # both halves
        rows = t.snapshot_where(spark, [("k", "=", probe)]).collect()
        assert [(r.k, r.w) for r in rows] == [(probe, probe * 2)]
    # the new half still prunes on its own bucket dirs via stats/dirs;
    # correctness (above) is the gate — mis-pruning would drop rows


def test_raw_partition_layout_change_reconciles_types(spark, tmp_path):
    """Raw bigint partition column: old files carry it only as a hive
    dir (string), new unpartitioned files store it physically — the
    union must reconcile to the committed type, exactly."""
    t = ManifestTable(str(tmp_path / "r"))
    df = spark.range(0, 60).select(
        (F.col("id") % 3).cast("bigint").alias("g"),
        F.col("id").cast("bigint").alias("x"),
    )
    t.overwrite(df, partition_by=["g"])
    t.alter_partition_spec([])  # un-partition future writes
    t.append(spark.range(60, 90).select(
        (F.col("id") % 3).cast("bigint").alias("g"),
        F.col("id").cast("bigint").alias("x"),
    ))
    snap = t.snapshot(spark)
    assert dict(snap.dtypes)["g"] == "bigint"
    got = snap.orderBy("x").collect()
    assert [r.x for r in got] == list(range(90))
    assert [r.g for r in got] == [i % 3 for i in range(90)]
    # and the reverse direction: partition an existing physical column
    t.alter_partition_spec(["g"])
    t.append(spark.range(90, 99).select(
        (F.col("id") % 3).cast("bigint").alias("g"),
        F.col("id").cast("bigint").alias("x"),
    ))
    got2 = t.snapshot(spark).orderBy("x").collect()
    assert [r.g for r in got2] == [i % 3 for i in range(99)]
    # point read on g stays exact across all three layouts
    assert t.snapshot_where(spark, [("g", "=", 1)]).count() == 33


def test_validation_and_errors(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "v"))
    t.overwrite(_ts_df(spark, 0, 10))
    with pytest.raises(ValueError, match="not a table column"):
        t.alter_partition_spec(["days(nope)"])
    with pytest.raises(ValueError, match="supported forms"):
        t.alter_partition_spec(["cube(ts)"])
    with pytest.raises(ValueError, match="duplicate"):
        t.alter_partition_spec(["days(ts)", "days(ts)"])
    # a transform dirname colliding with an existing table column is
    # rejected at alter time (every later write would raise anyway,
    # and a drop-then-write sequence would poison the dirname for
    # pruning across history)
    t2 = ManifestTable(str(tmp_path / "v2"))
    t2.overwrite(
        _ts_df(spark, 0, 10).withColumn("ts_day", F.lit("x"))
    )
    with pytest.raises(ValueError, match="already a table column"):
        t2.alter_partition_spec(["days(ts)"])


def test_restore_rolls_back_spec_and_history(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "rs"))
    t.overwrite(_ts_df(spark, 0, 50), partition_by=["days(ts)"])
    v1 = t.latest_version()
    t.alter_partition_spec(["months(ts)"])
    t.append(_ts_df(spark, 50, 80))
    t.restore(spark, v1)
    man = t._read_manifest(t.latest_version())
    assert man["partition_by"] == ["days(ts)"]
    assert not man.get("partition_specs")  # v1 had no history
    assert t.snapshot(spark).count() == 50


def test_compact_migrates_legacy_small_files(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "c"))
    t.overwrite(_ts_df(spark, 0, 40).repartition(8), partition_by=["days(ts)"])
    t.alter_partition_spec(["months(ts)"])
    t.compact_small_files(spark, target_rows_per_file=100)
    man = t._read_manifest(t.latest_version())
    # every rewritten file landed under the CURRENT spec
    assert all("ts_month" in e["partition"] for e in man["files"])
    got = t.snapshot(spark).orderBy("id").collect()
    assert [r.id for r in got] == list(range(40))


def test_overwrite_clears_history(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "o"))
    t.overwrite(_ts_df(spark, 0, 30), partition_by=["days(ts)"])
    t.alter_partition_spec(["months(ts)"])
    t.overwrite(_ts_df(spark, 0, 30), partition_by=["days(ts)"])
    man = t._read_manifest(t.latest_version())
    assert not man.get("partition_specs")
    assert man["partition_by"] == ["days(ts)"]


def test_rename_then_respec_translates_to_physical(spark, tmp_path):
    """A renamed column used in a NEW spec: the spec stores the
    PHYSICAL name; logical predicates still prune and reads resolve."""
    t = ManifestTable(str(tmp_path / "rn"))
    t.overwrite(_ts_df(spark, 0, 48))
    t.rename_column("ts", "event_ts")
    t.alter_partition_spec(["days(event_ts)"])
    man = t._read_manifest(t.latest_version())
    assert man["partition_by"] == ["days(ts)"]  # physical namespace
    t.append(_ts_df(spark, 48, 96).withColumnRenamed("ts", "event_ts"))
    lo = datetime.datetime(2024, 1, 3)
    df = t.snapshot_where(spark, [("event_ts", ">=", lo)])
    assert df.count() == 96 - 48
    assert "event_ts" in df.columns
