"""Distributed read planning: metadata as data.

The scale ceiling named by the round-6 review: every snapshot_where /
MERGE / DELETE prune ran the per-entry matcher as a serial driver-side
Python loop — O(table files) driver CPU at 10^6 files. These tests pin
the fix: past ``_SPARK_PRUNE_MIN_FILES`` the SAME pure matcher runs as
a mapInPandas job (over the checkpoint's parquet sidecar when the
version resolves from one — the driver never materializes the entry
list), and every tier returns the identical kept set.

Thresholds are monkeypatched small so the suite exercises the
distributed tiers on dozens of files instead of thousands; the
matchers and job shapes are byte-identical to the production path.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import etl_job_spark.table as tablemod
from etl_job_spark.table import ManifestTable


def _mk_table(spark, path, n_rows=3000, n_files=24, bloom=False):
    t = ManifestTable(str(path))
    df = spark.range(0, n_rows).selectExpr(
        "id as k", "cast(id % 7 as int) as v", "concat('u', id) as u"
    )
    t.overwrite(
        df.repartitionByRange(n_files, "k").sortWithinPartitions("k"),
        bloom_cols=["u"] if bloom else None,
    )
    return t


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_files_parquet_sidecar_roundtrip(spark, tmp_path, monkeypatch):
    """Checkpoints past _FILES_PARQUET_MIN land their entry list as a
    parquet sidecar (files_ref) and resolve losslessly."""
    monkeypatch.setattr(tablemod, "_FILES_PARQUET_MIN", 16)
    t = _mk_table(spark, tmp_path / "t", n_files=24)
    raw = t._read_raw_manifest(t.latest_version())
    assert "files" not in raw and raw["n_files"] == 24
    assert os.path.exists(os.path.join(t.manifest_dir, raw["files_ref"]))
    # a cold instance resolves the sidecar to the same snapshot
    t2 = ManifestTable(t.path)
    assert _rows(t2.snapshot(spark)) == _rows(t.snapshot(spark))
    man = t2._read_manifest(t2.latest_version())
    assert len(man["files"]) == 24 and all("stats" in e for e in man["files"])


def test_snapshot_where_distributed_matches_driver(spark, tmp_path, monkeypatch):
    """Tier 'distributed' (driver-resident entries shipped via Arrow):
    same kept set, same rows as the in-memory loop."""
    t = _mk_table(spark, tmp_path / "t", bloom=True)
    preds = [("k", "between", (400, 900)), ("u", "in", ["u500", "u9999"])]
    monkeypatch.setattr(tablemod, "_SPARK_PRUNE_MIN_FILES", 10**9)
    drv = _rows(t.snapshot_where(spark, preds))
    assert t.last_planning["mode"] == "driver"
    drv_kept = t.last_planning["kept"]
    monkeypatch.setattr(tablemod, "_SPARK_PRUNE_MIN_FILES", 4)
    dist = _rows(t.snapshot_where(spark, preds))
    assert t.last_planning["mode"] == "distributed"
    assert t.last_planning["kept"] == drv_kept
    assert dist == drv == _rows(
        t.snapshot(spark).filter("k between 400 and 900 and u in ('u500','u9999')")
    )
    # the prune actually bit: blooms + ranges beat the 24-file scan
    assert drv_kept < 24


def test_snapshot_where_lazy_plans_from_sidecar(spark, tmp_path, monkeypatch):
    """Tier 'distributed-lazy': a cold instance over a sidecar-backed
    checkpoint plans by SCANNING the sidecar — the full entry list is
    never materialized on the driver — and keeps the identical files."""
    monkeypatch.setattr(tablemod, "_FILES_PARQUET_MIN", 16)
    t = _mk_table(spark, tmp_path / "t", n_files=24)
    preds = [("k", "between", (100, 600))]
    monkeypatch.setattr(tablemod, "_SPARK_PRUNE_MIN_FILES", 10**9)
    drv = _rows(t.snapshot_where(spark, preds))
    drv_kept = t.last_planning["kept"]

    monkeypatch.setattr(tablemod, "_SPARK_PRUNE_MIN_FILES", 8)
    t2 = ManifestTable(t.path)
    v = t2.latest_version()
    got = t2.snapshot_where(spark, preds)
    assert t2.last_planning["mode"] == "distributed-lazy"
    assert t2.last_planning["candidates"] == 24
    assert t2.last_planning["kept"] == drv_kept
    # lazy means lazy: planning did not resolve the version's file list
    assert v not in t2._files_cache
    assert _rows(got) == drv


def test_lazy_plan_applies_delta_chain(spark, tmp_path, monkeypatch):
    """Deltas on top of a sidecar checkpoint: removed/replaced paths
    drop executor-side via the skip-set, replacement entries re-plan
    driver-side — snapshot_where stays exact through appends, a
    copy-on-write delete (removes + upserts), and a MOR fully-dead
    file."""
    monkeypatch.setattr(tablemod, "_FILES_PARQUET_MIN", 16)
    monkeypatch.setattr(tablemod, "_SPARK_PRUNE_MIN_FILES", 8)
    t = _mk_table(spark, tmp_path / "t", n_rows=2000, n_files=20)
    # delta 1: append new rows (net-new paths in the chain)
    t.append(spark.range(2000, 2100).selectExpr(
        "id as k", "cast(id % 7 as int) as v", "concat('u', id) as u"
    ))
    # delta 2: copy-on-write delete rewrites one file region
    t.delete_where(spark, "k between 50 and 60")
    # delta 3: MOR delete kills every row of the 2000-2100 append
    t.delete_where(spark, "k >= 2000", mode="merge_on_read")

    preds = [("k", "between", (0, 2100))]
    t2 = ManifestTable(t.path)
    got = _rows(t2.snapshot_where(spark, preds))
    assert t2.last_planning["mode"] == "distributed-lazy"
    monkeypatch.setattr(tablemod, "_SPARK_PRUNE_MIN_FILES", 10**9)
    t3 = ManifestTable(t.path)
    exp = _rows(t3.snapshot_where(spark, preds))
    assert t3.last_planning["mode"] == "driver"
    assert got == exp
    assert got == _rows(t.snapshot(spark).filter("k between 0 and 2100"))
    # and a narrow window still prunes through the lazy tier
    t4 = ManifestTable(t.path)
    monkeypatch.setattr(tablemod, "_SPARK_PRUNE_MIN_FILES", 8)
    narrow = t4.snapshot_where(spark, [("k", "between", (300, 340))])
    assert t4.last_planning["mode"] == "distributed-lazy"
    assert t4.last_planning["kept"] < t3.last_planning["kept"]
    assert _rows(narrow) == _rows(t.snapshot(spark).filter("k between 300 and 340"))


def test_dnf_distributed_matches_brute_or(spark, tmp_path, monkeypatch):
    t = _mk_table(spark, tmp_path / "t")
    any_of = [
        [("k", "between", (100, 200))],
        [("k", "between", (2500, 2600)), ("v", "=", 3)],
    ]
    monkeypatch.setattr(tablemod, "_SPARK_PRUNE_MIN_FILES", 4)
    got = _rows(t.snapshot_where(spark, any_of=any_of))
    assert t.last_planning["mode"] == "distributed"
    exp = _rows(
        t.snapshot(spark).filter(
            "(k between 100 and 200) or (k between 2500 and 2600 and v = 3)"
        )
    )
    assert got == exp


def test_merge_prunes_distributed(spark, tmp_path, monkeypatch):
    """merge's partition/range prune past the threshold runs as
    a planning job; untouched files still carry by reference."""
    t = ManifestTable(str(tmp_path / "t"))
    df = spark.range(0, 2000).selectExpr("id as k", "cast(id as double) as x")
    t.overwrite(df.repartitionByRange(20, "k").sortWithinPartitions("k"))
    before = {e["path"] for e in t._read_manifest(t.latest_version())["files"]}
    monkeypatch.setattr(tablemod, "_SPARK_PRUNE_MIN_FILES", 8)
    src = spark.createDataFrame([(5, -1.0), (7, -2.0)], "k long, x double")
    t.merge(spark, src, keys=["k"])
    assert t.last_planning["mode"] == "distributed"
    assert t.last_planning["op"] == "merge-range"
    after = t._read_manifest(t.latest_version())["files"]
    carried = {e["path"] for e in after} & before
    assert len(carried) == 19  # one file touched, 19 by reference
    got = t.snapshot(spark).filter("k in (5, 7)").select("x")
    assert sorted(r.x for r in got.collect()) == [-2.0, -1.0]


def test_delete_keys_prunes_distributed(spark, tmp_path, monkeypatch):
    t = _mk_table(spark, tmp_path / "t", bloom=True)
    before = {e["path"] for e in t._read_manifest(t.latest_version())["files"]}
    monkeypatch.setattr(tablemod, "_SPARK_PRUNE_MIN_FILES", 8)
    t.delete_keys(spark, "u", ["u42", "u43"])
    assert t.last_planning["mode"] == "distributed"
    assert t.last_planning["op"] == "delete-cow"
    after = t._read_manifest(t.latest_version())["files"]
    assert len({e["path"] for e in after} & before) >= 22
    assert t.snapshot(spark).filter("u in ('u42','u43')").count() == 0
    assert t.snapshot(spark).count() == 2998


def test_distributed_split_on_6k_entries_matches_driver(spark, monkeypatch):
    """The r6 verdict's done-bar: a many-file (>=5k) table plans its
    prune as a distributed job with a split identical to the driver
    loop. Planning consumes only manifest entries, so the 6k-file
    table is synthesized as entries (range-clustered stats, every 7th
    file a hive partition dir, every 13th fully dead) without writing
    6k parquet files. The PRODUCTION threshold sits higher (65_536 —
    measured crossover where the job's ~2 s fixed cost beats the
    driver loop + materialization, see BASELINE.md "Planning tiers"),
    so the gate is lowered here to exercise the distributed tier."""
    monkeypatch.setattr(tablemod, "_SPARK_PRUNE_MIN_FILES", 4096)
    t = ManifestTable("/tmp/_plan_scale_unused")
    entries = []
    for i in range(6000):
        e = {
            "path": f"b/{i:05d}.parquet",
            "partition": {"region": f"r{i % 4}"} if i % 7 == 0 else {},
            "rows": 100,
            "stats": {"k": {"min": i * 100, "max": i * 100 + 99}},
        }
        if i % 13 == 0:
            e["dv_rows"] = 100  # fully dead
        entries.append(e)

    def match(e):
        st = e["stats"]["k"]
        dead = (e.get("dv_rows") or 0) >= e["rows"]
        in_range = not (st["max"] < 150_000 or st["min"] > 250_000)
        in_region = e["partition"].get("region") in (None, "r2")
        return not dead and in_range and in_region

    assert len(entries) >= tablemod._SPARK_PRUNE_MIN_FILES  # default gate
    kept, cold = t._split_candidates(spark, entries, match, "scale-test")
    assert t.last_planning["mode"] == "distributed"
    drv_kept = [e for e in entries if match(e)]
    assert kept == drv_kept  # identical split, manifest order preserved
    assert len(kept) + len(cold) == 6000
    assert 0 < len(kept) < 1100  # the prune actually bit


def test_vacuum_reclaims_orphan_sidecars_keeps_live(spark, tmp_path, monkeypatch):
    """Dropped checkpoints' parquet sidecars are reclaimed (past the
    in-flight grace); the retained checkpoint's sidecar survives and
    the table stays readable."""
    import time

    monkeypatch.setattr(tablemod, "_FILES_PARQUET_MIN", 8)
    t = _mk_table(spark, tmp_path / "t", n_rows=600, n_files=12)
    t.overwrite(  # v2: new checkpoint sidecar, v1's becomes droppable
        spark.range(0, 300).selectExpr(
            "id as k", "cast(id % 7 as int) as v", "concat('u', id) as u"
        ).repartitionByRange(10, "k")
    )
    sidecars = [n for n in os.listdir(t.manifest_dir) if n.startswith("files-")]
    assert len(sidecars) == 1  # v1's checkpoint; v2 is a delta
    # age it past the grace so it becomes eligible once v1 drops
    for n in sidecars:
        p = os.path.join(t.manifest_dir, n)
        os.utime(p, (time.time() - 7200, time.time() - 7200))
    # vacuum materializes v2 (its own fresh sidecar), drops v1's
    # manifest, and reclaims v1's now-orphaned aged sidecar
    t.vacuum(keep_last=1)
    left = [n for n in os.listdir(t.manifest_dir) if n.startswith("files-")]
    assert left == [t._read_raw_manifest(t.latest_version())["files_ref"]]
    assert left != sidecars
    t2 = ManifestTable(t.path)
    assert t2.snapshot(spark).count() == 300
    # a fresh (in-grace) unreferenced sidecar is left alone
    orphan = os.path.join(t.manifest_dir, "files-deadbeef.parquet")
    open(orphan, "wb").write(b"x")
    t.vacuum(keep_last=1)
    assert os.path.exists(orphan)


def test_files_df_and_history_df_metadata_tables(spark, tmp_path, monkeypatch):
    """Iceberg-style metadata tables: files_df is SQL over the
    manifest (sidecar-scanned for checkpoint versions, never
    materialized), history_df is DESCRIBE HISTORY."""
    monkeypatch.setattr(tablemod, "_FILES_PARQUET_MIN", 8)
    t = _mk_table(spark, tmp_path / "t", n_rows=1000, n_files=10)
    t.delete_where(spark, "k in (3, 4)", mode="merge_on_read")

    cold = ManifestTable(t.path)  # cold instance: nothing resolved yet
    fdf = cold.files_df(spark, version=1)  # checkpoint: direct sidecar scan
    assert fdf.count() == 10
    agg = fdf.selectExpr("sum(rows) r", "sum(live_rows) lr").first()
    assert agg.r == 1000 and agg.lr == 1000
    assert 1 not in cold._files_cache  # metadata query didn't materialize

    cur = t.files_df(spark)  # MOR version: rows unchanged, 2 dv'd
    got = cur.selectExpr("sum(rows) r", "sum(dv_rows) d", "sum(live_rows) lr").first()
    assert (got.r, got.d, got.lr) == (1000, 2, 998)
    # stats are reachable with plain SQL over the JSON
    mins = cur.selectExpr(
        "min(cast(get_json_object(stats_json, '$.k.min') as bigint)) m"
    ).first()
    assert mins.m == 0

    h = t.history_df(spark)
    assert [r.op for r in h.orderBy("version").collect()] == ["overwrite", "delete"]
    assert h.filter("version = 2").first().rows == 998


def test_files_df_empty_version_and_lazy_delta_chain(spark, tmp_path, monkeypatch):
    """r7 second-review findings: a zero-file version must yield an
    empty metadata frame (not CANNOT_INFER_EMPTY_SCHEMA), and a DELTA
    version over a sidecar checkpoint must plan files_df from the
    sidecar + patch — never materializing the base list."""
    monkeypatch.setattr(tablemod, "_FILES_PARQUET_MIN", 8)
    t = ManifestTable(str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([], "k long, v string"))
    assert t.files_df(spark).count() == 0  # zero-file version

    t.overwrite(
        spark.range(0, 500).selectExpr("id as k", "concat('v', id) as v")
        .repartitionByRange(10, "k").sortWithinPartitions("k")
    )  # v2: delta listing 10 new files over the empty base... still inline
    t.compact(spark, target_rows_per_file=50)  # v3: delta
    # force a sidecar checkpoint then a delta on top of it
    for i in range(20):
        t.append(spark.createDataFrame([(1000 + i, "x")], "k long, v string"))
        raw = t._read_raw_manifest(t.latest_version())
        if "delta" in raw and "files_ref" in t._read_raw_manifest(raw["base_version"]):
            break
    else:
        raise AssertionError("never reached a delta over a sidecar checkpoint")
    cold = ManifestTable(t.path)
    v = cold.latest_version()
    fdf = cold.files_df(spark, version=v)
    # exact agreement with the resolved list, no driver materialization
    assert v not in cold._files_cache
    exp = {e["path"]: e for e in t._read_manifest(v)["files"]}
    got = {r.path: r for r in fdf.collect()}
    assert set(got) == set(exp)
    assert all(got[p].rows == exp[p]["rows"] for p in exp)


def test_partitions_df_metadata_rollup(spark, tmp_path):
    """Iceberg's .partitions shape: one row per partition value map
    with file/row/DV rollups, NULL partitions included."""
    t = ManifestTable(str(tmp_path / "pt"))
    df = spark.createDataFrame(
        [(i, None if i % 5 == 0 else f"d{i % 2}") for i in range(100)],
        "k long, dy string",
    )
    t.overwrite(df.repartition(F.col("dy")), partition_by=["dy"])
    t.delete_keys(spark, "k", [1, 3, 7], mode="merge_on_read")
    rows = {r.partition_json: r for r in t.partitions_df(spark).collect()}
    assert len(rows) == 3  # d0, d1, NULL
    total = sum(r.rows for r in rows.values())
    assert total == 100
    assert sum(r.dv_rows for r in rows.values()) == 3
    assert sum(r.live_rows for r in rows.values()) == 97
    [null_row] = [
        r for r in rows.values() if "dy" in r.partition and r.partition["dy"] is None
    ]
    assert null_row.rows == 20
    # unpartitioned tables roll up to ONE empty-map row
    t2 = ManifestTable(str(tmp_path / "u"))
    t2.overwrite(spark.range(10).selectExpr("id as k").repartition(3))
    [r] = t2.partitions_df(spark).collect()
    assert r.partition == {} and r.n_files == 3 and r.rows == 10


def test_read_manifest_table_preplans_past_the_plan_worker(spark, tmp_path, monkeypatch):
    """The DS read path's driver-bound planning tier, closed: passing
    `predicates=` to read_manifest_table pre-plans the surviving entry
    list with the library's distributed/sidecar tiers (the wrapper has
    a session; the DS plan worker doesn't) and ships it via a plan
    file — rows equal snapshot()+filter, the tier is distributed, and
    the DS-side matcher sees only the survivors."""
    import etl_job_spark.sources.manifest_source as ms
    from etl_job_spark.sources.manifest_source import read_manifest_table

    monkeypatch.setattr(tablemod, "_FILES_PARQUET_MIN", 16)
    monkeypatch.setattr(tablemod, "_SPARK_PRUNE_MIN_FILES", 8)
    t = _mk_table(spark, tmp_path / "t", n_files=24, bloom=True)
    preds = [("k", "between", (400, 900)), ("u", "in", ["u500", "u9999"])]
    got = _rows(read_manifest_table(spark, t.path, predicates=preds))
    want = _rows(
        t.snapshot(spark).filter("k between 400 and 900 and u in ('u500','u9999')")
    )
    assert got == want and got
    lp = ms.LAST_PREPLAN
    assert lp and lp["mode"] in ("distributed", "distributed-lazy"), lp
    assert lp["candidates"] == 24
    assert lp["kept"] < 24  # the prune actually bit
    # same result and same survivors from a cold sidecar-backed table
    t2 = ManifestTable(t.path)
    assert _rows(read_manifest_table(spark, t2.path, predicates=preds)) == want
    # a concurrent append AFTER planning doesn't shift the pinned read
    df = read_manifest_table(spark, t.path, predicates=[("k", "<", 100)])
    t.append(spark.range(10_000, 10_050).selectExpr(
        "id as k", "cast(id % 7 as int) as v", "concat('u', id) as u"
    ))
    assert sorted(r.k for r in df.collect()) == list(range(100))


def test_preplanned_reads_reuse_content_hashed_plan_files(spark, tmp_path):
    """Repeated identical pre-planned reads reuse ONE plan file
    (content-addressed name) instead of accumulating a new JSON per
    call for the session's lifetime (r9 ADVICE low); a different
    predicate gets its own file."""
    import glob

    from etl_job_spark.scratch import scratch_dir
    from etl_job_spark.sources.manifest_source import read_manifest_table

    t = _mk_table(spark, tmp_path / "ph")
    plan_dir = scratch_dir(spark, "manifest_ds_plans")
    before = set(glob.glob(os.path.join(plan_dir, "plan-*.json")))
    n1 = read_manifest_table(spark, t.path, predicates=[("k", "<", 500)]).count()
    mid = set(glob.glob(os.path.join(plan_dir, "plan-*.json")))
    n2 = read_manifest_table(spark, t.path, predicates=[("k", "<", 500)]).count()
    n3 = read_manifest_table(spark, t.path, predicates=[("k", "<", 500)]).count()
    after = set(glob.glob(os.path.join(plan_dir, "plan-*.json")))
    assert n1 == n2 == n3 == 500
    assert len(mid - before) == 1          # first read created one file
    assert after == mid                    # identical re-reads added none
    read_manifest_table(spark, t.path, predicates=[("k", "<", 800)]).count()
    final = set(glob.glob(os.path.join(plan_dir, "plan-*.json")))
    assert len(final - after) == 1         # a distinct plan gets its own
