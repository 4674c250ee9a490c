"""SHALLOW CLONE (Delta's zero-copy verb): ``clone_to`` creates a new
table whose first commit references the source's files by absolute
base — one metadata write regardless of data size. Reads resolve
through every tier; writes are copy-on-write into the clone's own
directory; the source is never modified. Honest-edge refusals (DV'd
source versions, MoR deletes on clones, occupied destinations) are
pinned here too.
"""

from __future__ import annotations

import os

import pytest

from etl_job_spark.sources.manifest_source import read_manifest_table
from etl_job_spark.sql import execute_dml
from etl_job_spark.table import ManifestTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _src(spark, tmp_path, **kw):
    t = ManifestTable(str(tmp_path / "src"))
    df = spark.createDataFrame(
        [(p, k, k * 10) for p in ("a", "b") for k in range(4)],
        "p string, k int, v int",
    )
    t.overwrite(df, partition_by=["p"], **kw)
    return t


def test_clone_is_metadata_only(spark, tmp_path):
    src = _src(spark, tmp_path)
    t = src.clone_to(str(tmp_path / "dev"))
    assert _rows(t.snapshot(spark)) == _rows(src.snapshot(spark))
    # zero bytes of data under the clone
    assert not os.path.exists(t.data_dir) or not any(os.scandir(t.data_dir))
    man = t._read_manifest(t.latest_version())
    assert all(e.get("base") for e in man["files"])
    assert man["partition_by"] == ["p"]


def test_clone_reads_prune_through_every_tier(spark, tmp_path):
    src = _src(spark, tmp_path, bloom_cols=["k"])
    t = src.clone_to(str(tmp_path / "dev"))
    sub = t.snapshot_where(spark, [("p", "=", "a"), ("k", "=", 2)])
    assert [tuple(r) for r in sub.collect()] == [("a", 2, 20)]
    assert t.last_planning["kept"] < t.last_planning["candidates"]
    # bloom-planned point delete on the clone (probes the source's
    # sidecars through their re-based absolute refs)
    t.delete_keys(spark, "k", [3])
    assert 3 not in {r.k for r in t.snapshot(spark).collect()}
    assert 3 in {r.k for r in src.snapshot(spark).collect()}
    # Data Source path
    df = read_manifest_table(spark, t.path, predicates=[("p", "=", "b")])
    assert {r.p for r in df.collect()} == {"b"}


def test_copy_on_write_divergence(spark, tmp_path):
    src = _src(spark, tmp_path)
    before_src = _rows(src.snapshot(spark))
    t = src.clone_to(str(tmp_path / "dev"))
    t.update_where(spark, {"v": "777"}, [("p", "=", "a"), ("k", "=", 0)])
    s2 = spark.createDataFrame([("b", 1, 99)], "p string, k int, v int")
    t.merge(spark, s2, ["p", "k"], when_matched_update=["v"], insert_unmatched=False)
    t.append(spark.createDataFrame([("c", 8, 80)], "p string, k int, v int"))
    got = {(r.p, r.k): r.v for r in t.snapshot(spark).collect()}
    assert got[("a", 0)] == 777 and got[("b", 1)] == 99 and got[("c", 8)] == 80
    # the source never moved
    assert _rows(src.snapshot(spark)) == before_src
    # untouched partitions still reference the source; touched ones
    # were copied into the clone's own directory
    man = t._read_manifest(t.latest_version())
    assert any(e.get("base") for e in man["files"])
    assert any(not e.get("base") for e in man["files"])
    # the clone's own history time-travels to the clone point
    assert _rows(t.snapshot(spark, 1)) == before_src


def test_vacuum_and_compact_on_clone_spare_the_source(spark, tmp_path):
    src = _src(spark, tmp_path)
    src_files = {
        os.path.join(src.data_dir, e["path"])
        for e in src._read_manifest(src.latest_version())["files"]
    }
    t = src.clone_to(str(tmp_path / "dev"))
    t.update_where(spark, {"v": "1"}, [("p", "=", "a"), ("k", "=", 1)])
    t.vacuum(keep_last=1, grace_seconds=0.0)
    assert all(os.path.exists(p) for p in src_files)
    # compaction localizes everything: no foreign refs remain, rows
    # identical, and the source files still exist untouched
    t.compact_small_files(spark)
    man = t._read_manifest(t.latest_version())
    assert not any(e.get("base") for e in man["files"])
    assert all(os.path.exists(p) for p in src_files)
    got = {(r.p, r.k): r.v for r in t.snapshot(spark).collect()}
    assert got[("a", 1)] == 1 and len(got) == 8


def test_table_properties_carry(spark, tmp_path):
    src = _src(spark, tmp_path, bloom_cols=["k"])
    src.rename_column("v", "amount")
    src.alter_constraints(spark, add={"v_ok": "amount >= 0"})
    t = src.clone_to(str(tmp_path / "dev"))
    assert "amount" in t.snapshot(spark).columns
    with pytest.raises(Exception, match="v_ok"):
        t.append(
            spark.createDataFrame([("c", 9, -5)], "p string, k int, amount int")
        )
    man = t._read_manifest(t.latest_version())
    assert man.get("bloom_cols") == ["k"]
    assert man.get("column_map") == {"amount": "v"}


def test_sql_shallow_clone_version_as_of(spark, tmp_path):
    src = _src(spark, tmp_path)
    src.append(spark.createDataFrame([("c", 9, 90)], "p string, k int, v int"))
    t = ManifestTable(str(tmp_path / "dev2"))
    execute_dml(
        spark, t, f"CREATE TABLE dev2 SHALLOW CLONE {src.path} VERSION AS OF 1"
    )
    assert t.snapshot(spark).count() == 8  # pre-append state
    t3 = ManifestTable(str(tmp_path / "dev3"))
    execute_dml(spark, t3, f"CREATE TABLE dev3 SHALLOW CLONE {src.path}")
    assert t3.snapshot(spark).count() == 9


def test_clone_of_clone_points_at_original_bytes(spark, tmp_path):
    src = _src(spark, tmp_path)
    t = src.clone_to(str(tmp_path / "dev"))
    t2 = t.clone_to(str(tmp_path / "dev2"))
    man = t2._read_manifest(t2.latest_version())
    src_data = os.path.abspath(src.data_dir)
    assert all(e["base"] == src_data for e in man["files"])
    assert _rows(t2.snapshot(spark)) == _rows(src.snapshot(spark))


def test_clone_inside_sql_transaction(spark, tmp_path):
    """CREATE TABLE … SHALLOW CLONE inside execute_dml_txn stages like
    every other verb (the captured instance's _commit is intercepted),
    so clone + divergence land as ONE transaction record and the
    source never moves."""
    from etl_job_spark.sql import execute_dml_txn
    from etl_job_spark.txn import TransactionalCatalog

    src = _src(spark, tmp_path)
    cat = TransactionalCatalog(str(tmp_path / "cat"))
    state = execute_dml_txn(spark, cat, [
        f"CREATE TABLE dev SHALLOW CLONE {src.path}",
        "UPDATE dev SET v = v + 1 WHERE k = 1",
    ])
    dev = cat.table("dev").snapshot(spark, state["dev"])
    got = {(r.p, r.k): r.v for r in dev.collect()}
    assert got[("a", 1)] == 11 and got[("b", 1)] == 11
    assert {(r.p, r.k): r.v for r in src.snapshot(spark).collect()}[("a", 1)] == 10


def test_refusals(spark, tmp_path):
    src = _src(spark, tmp_path)
    t = src.clone_to(str(tmp_path / "dev"))
    # occupied destination
    with pytest.raises(ValueError, match="already has a committed"):
        src.clone_to(str(tmp_path / "dev"))
    # MoR delete on a table holding foreign refs
    with pytest.raises(ValueError, match="foreign-based"):
        t.delete_where(spark, "k = 1", mode="merge_on_read")
    # DV'd source version
    src.delete_where(spark, "k = 2", mode="merge_on_read")
    with pytest.raises(ValueError, match="deletion"):
        src.clone_to(str(tmp_path / "dev4"))
    # ... but an older, DV-free version still clones
    t5 = src.clone_to(str(tmp_path / "dev5"), version=1)
    assert t5.snapshot(spark).count() == 8
