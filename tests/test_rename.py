"""Column RENAME via logical→physical name mapping.

The reference's own history is one giant rename map
(/root/reference/kicc_to_tb_sales.py:71-86 renames every staging
column into the mart). Delta's column-mapping answer: files always
store the PHYSICAL name (the name at first write); a rename is a
metadata-only commit editing the manifest's logical→physical map.
The round-6 verdict's done-bar: old-version time travel reads the old
name, new reads new, stats/bloom pruning still fires on the renamed
column, and MERGE on a renamed key stays green.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import etl_job_spark.table as tablemod
from etl_job_spark.table import ManifestTable


def _mk(spark, path, bloom=False, n=1000, files=8):
    t = ManifestTable(str(path))
    df = spark.range(0, n).selectExpr(
        "id as k", "cast(id % 7 as int) as v", "concat('u', id) as u"
    )
    t.overwrite(
        df.repartitionByRange(files, "k").sortWithinPartitions("k"),
        bloom_cols=["u"] if bloom else None,
    )
    return t


def test_rename_is_metadata_only_and_time_travel_exact(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    v1 = t.latest_version()
    files_before = {e["path"] for e in t._read_manifest(v1)["files"]}
    v2 = t.rename_column("k", "item_key")
    # metadata-only: identical file set
    assert {e["path"] for e in t._read_manifest(v2)["files"]} == files_before
    # new version reads the new name, values intact
    cur = t.snapshot(spark)
    assert cur.columns == ["item_key", "v", "u"]
    assert cur.agg(F.sum("item_key")).first()[0] == sum(range(1000))
    # time travel: the old version still reads the old name
    old = t.snapshot(spark, version=v1)
    assert old.columns == ["k", "v", "u"]
    assert old.agg(F.sum("k")).first()[0] == sum(range(1000))
    # history records the operation
    op = dict(t._read_manifest(v2)["operation"])
    op.pop("metrics", None)  # per-commit operationMetrics ride along
    assert op == {"op": "rename_column", "from": "k", "to": "item_key"}


def test_stats_pruning_fires_on_renamed_column(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.rename_column("k", "item_key")
    got = t.snapshot_where(spark, [("item_key", "between", (100, 220))])
    assert t.last_planning["kept"] < t.last_planning["candidates"]
    exp = t.snapshot(spark).filter("item_key between 100 and 220")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))
    # distributed tier prunes identically on the renamed name
    drv_kept = t.last_planning["kept"]
    import pytest as _  # noqa: F401

    old = tablemod._SPARK_PRUNE_MIN_FILES
    tablemod._SPARK_PRUNE_MIN_FILES = 2
    try:
        got2 = t.snapshot_where(spark, [("item_key", "between", (100, 220))])
        assert t.last_planning["mode"] == "distributed"
        assert t.last_planning["kept"] == drv_kept
        assert sorted(map(tuple, got2.collect())) == sorted(
            map(tuple, exp.collect())
        )
    finally:
        tablemod._SPARK_PRUNE_MIN_FILES = old


def test_bloom_pruning_and_delete_keys_on_renamed_column(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", bloom=True)
    t.rename_column("u", "user_id")
    # bloom-pruned point read on the new name
    got = t.snapshot_where(spark, [("user_id", "in", ["u17", "u888"])])
    assert t.last_planning["kept"] < t.last_planning["candidates"]
    assert sorted(r.user_id for r in got.collect()) == ["u17", "u888"]
    # GDPR-style point delete through the renamed key, bloom-pruned
    before = {e["path"] for e in t._read_manifest(t.latest_version())["files"]}
    t.delete_keys(spark, "user_id", ["u17"])
    assert t.last_planning["op"] == "delete-cow"
    after = {e["path"] for e in t._read_manifest(t.latest_version())["files"]}
    assert len(after & before) >= 6  # most files carried by reference
    assert t.snapshot(spark).filter("user_id = 'u17'").count() == 0
    assert t.row_count() == 999


def test_merge_on_renamed_key(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.rename_column("k", "item_key")
    t.rename_column("v", "val")
    src = spark.createDataFrame(
        [(5, 99, "u5"), (2000, 42, "u2000")], "item_key long, val int, u string"
    )
    t.merge(spark, src, keys=["item_key"])
    assert t.last_planning["op"] in ("merge-range", "merge-bloom")
    snap = t.snapshot(spark)
    assert snap.columns == ["item_key", "val", "u"]
    assert snap.filter("item_key = 5").first().val == 99
    assert snap.filter("item_key = 2000").first().val == 42
    assert snap.count() == 1001
    # new files physically store the ORIGINAL names (column mapping)
    man = t._read_manifest(t.latest_version())
    assert man["column_map"] == {"item_key": "k", "val": "v"}


def test_append_and_evolution_after_rename(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.rename_column("v", "val")
    # append speaks the NEW name; also evolves a genuinely new column
    t.append(
        spark.createDataFrame(
            [(5000, 9, "u5000", "x")], "k long, val int, u string, extra string"
        )
    )
    snap = t.snapshot(spark)
    assert snap.columns == ["k", "val", "u", "extra"]
    assert snap.filter("k = 5000").first().val == 9
    assert snap.filter("k < 5000").filter("extra is not null").count() == 0
    # resurrection guard: a new column named like the in-use PHYSICAL
    # name of the renamed column is rejected
    with pytest.raises(ValueError, match="PHYSICAL"):
        t.append(
            spark.createDataFrame([(1, 1, "u1", "boom")], "k long, val int, u string, v string")
        )


def test_rename_guards(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    df = spark.range(0, 100).selectExpr(
        "id as k", "cast(id % 5 as int) as v", "cast(id % 3 as string) as dy"
    )
    t.overwrite(df, partition_by=["dy"])
    with pytest.raises(ValueError, match="unknown column"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="existing column"):
        t.rename_column("k", "v")
    with pytest.raises(ValueError, match="partition"):
        t.rename_column("dy", "day")
    t.alter_constraints(spark, add={"v_ok": "v >= 0"})
    with pytest.raises(ValueError, match="constraint"):
        t.rename_column("v", "val")
    t.alter_constraints(spark, drop=["v_ok"])
    t.rename_column("v", "val")
    t.alter_schema(df.sparkSession, drop=["val"])
    # dropped tombstone holds the PHYSICAL name: logical 'val' is
    # reusable, physical 'v' is not
    with pytest.raises(ValueError, match="DROPPED"):
        t.append(spark.createDataFrame([(1, "0", 1)], "k long, dy string, v int"))
    t.append(spark.createDataFrame([(500, "0", 1)], "k long, dy string, val int"))
    assert t.snapshot(spark).filter("k = 500").first().val == 1
    # old files' physical v bytes never leak into the re-added val
    assert t.snapshot(spark).filter("k < 100 and val is not null").count() == 0


def test_rename_chain_and_rename_back(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=200, files=2)
    t.rename_column("v", "a")
    t.rename_column("a", "b")
    man = t._read_manifest(t.latest_version())
    assert man["column_map"] == {"b": "v"}
    assert t.snapshot(spark).columns == ["k", "b", "u"]
    # renaming back to the physical name drops the map entry entirely
    t.rename_column("b", "v")
    man = t._read_manifest(t.latest_version())
    assert "column_map" not in man
    assert t.snapshot(spark).columns == ["k", "v", "u"]


def test_overwrite_clears_mapping_and_restore_restores_it(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=100, files=2)
    t.rename_column("k", "item_key")
    v_renamed = t.latest_version()
    t.overwrite(
        spark.range(0, 50).selectExpr("id as item_key", "id * 2 as dbl")
    )
    assert "column_map" not in t._read_manifest(t.latest_version())
    assert t.snapshot(spark).columns == ["item_key", "dbl"]
    # restore back to the renamed version: mapping comes back with it
    t.restore(spark, v_renamed)
    man = t._read_manifest(t.latest_version())
    assert man["column_map"] == {"item_key": "k"}
    snap = t.snapshot(spark)
    assert snap.columns == ["item_key", "v", "u"]
    assert snap.agg(F.sum("item_key")).first()[0] == sum(range(100))


def test_compact_and_diff_after_rename(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=500, files=8)
    t.rename_column("k", "item_key")
    v_before = t.latest_version()
    t.compact(spark, target_rows_per_file=250, cluster_by=["item_key"])
    snap = t.snapshot(spark)
    assert snap.columns == ["item_key", "v", "u"]
    assert snap.count() == 500
    # clustered rewrite preserved values and pruning on the new name
    got = t.snapshot_where(spark, [("item_key", "between", (0, 99))])
    assert t.last_planning["kept"] < t.last_planning["candidates"]
    assert got.count() == 100
    # change feed across the rename speaks the to-version's names
    t.delete_keys(spark, "item_key", [7])
    d = t.diff(spark, v_before, t.latest_version())
    assert "item_key" in d.columns
    assert d.filter("_change = 'delete' and item_key = 7").count() == 1


def test_rename_rejects_reserved_and_invalid_names(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=10, files=1)
    with pytest.raises(ValueError, match="reserved"):
        t.rename_column("v", "__file")
    with pytest.raises(ValueError, match="invalid"):
        t.rename_column("v", "bad name")
    with pytest.raises(ValueError, match="invalid"):
        t.rename_column("v", "a=b")
    # '.' and '`' break F.col resolution AFTER the commit — refused
    with pytest.raises(ValueError, match="resolution"):
        t.rename_column("v", "a.b")
    with pytest.raises(ValueError, match="resolution"):
        t.rename_column("v", "a`b")
