"""Metadata-only ADD COLUMN (VERDICT r10 next-round #2): the schema
gains a field in one commit that rewrites NO data file; existing rows
read as NULL through ``_align`` (the same machinery additive append
evolution reads through); time travel is exact; the DDL grammar routes
``ALTER TABLE t ADD COLUMN[S] ...``."""

from __future__ import annotations

import pytest

from etl_job_spark.sql import execute_dml
from etl_job_spark.table import ManifestTable


def _files(t, version):
    return sorted(e["path"] for e in t._read_manifest(version)["files"])


def test_add_column_metadata_only(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "ac"))
    v1 = t.overwrite(
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    )
    v2 = t.alter_schema(spark, add={"score": "double"})
    assert v2 == v1 + 1
    # METADATA-ONLY: the exact same data files, carried by reference
    assert _files(t, v2) == _files(t, v1)
    snap = t.snapshot(spark)
    assert snap.schema["score"].dataType.simpleString() == "double"
    assert snap.schema["score"].nullable
    got = {r.k: (r.v, r.score) for r in snap.collect()}
    assert got == {1: (10, None), 2: (20, None)}
    # time travel: the old version does NOT have the column
    old = t.snapshot(spark, v1)
    assert "score" not in old.columns


def test_add_column_then_write_and_update(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "acw"))
    t.overwrite(spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"))
    t.alter_schema(spark, add={"score": "double"})
    # post-add appends carry real values; pre-add rows stay NULL
    t.append(spark.createDataFrame([(3, 30, 0.5)], "k long, v long, score double"))
    got = {r.k: r.score for r in t.snapshot(spark).collect()}
    assert got == {1: None, 2: None, 3: 0.5}
    # an append WITHOUT the column still lands (NULL-filled, additive)
    t.append(spark.createDataFrame([(4, 40)], "k long, v long"))
    assert {r.k: r.score for r in t.snapshot(spark).collect()}[4] is None
    # row-level UPDATE can backfill the added column
    t.update_where(spark, {"score": "v / 10.0"}, "score IS NULL")
    got2 = {r.k: r.score for r in t.snapshot(spark).collect()}
    assert got2 == {1: 1.0, 2: 2.0, 3: 0.5, 4: 4.0}


def test_add_column_refusals(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "acr"))
    t.overwrite(
        spark.createDataFrame([(1, 10, "a")], "k long, v long, s string")
    )
    # live name, case-insensitively
    with pytest.raises(ValueError, match="already exists"):
        t.alter_schema(spark, add={"V": "long"})
    # tombstoned name (dropped column's bytes still in old files)
    t.alter_schema(spark, drop=["s"])
    with pytest.raises(ValueError, match="resurrect"):
        t.alter_schema(spark, add={"s": "string"})
    # drop + re-add in ONE call is the same resurrection
    with pytest.raises(ValueError, match="resurrect"):
        t.alter_schema(spark, drop=["v"], add={"v": "long"})
    # physical name of a renamed column
    t.rename_column("v", "val")
    with pytest.raises(ValueError, match="resurrect"):
        t.alter_schema(spark, add={"v": "long"})
    # bad type, reserved prefix, no-op call
    with pytest.raises(ValueError, match="cannot parse type"):
        t.alter_schema(spark, add={"x": "notatype"})
    with pytest.raises(ValueError, match="reserved"):
        t.alter_schema(spark, add={"__x": "long"})
    with pytest.raises(ValueError, match="drop=.*add="):
        t.alter_schema(spark)


def test_add_and_drop_one_commit(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "acd"))
    v1 = t.overwrite(
        spark.createDataFrame([(1, 10, "a")], "k long, v long, s string")
    )
    v2 = t.alter_schema(spark, drop=["s"], add={"score": "double"})
    assert v2 == v1 + 1
    snap = t.snapshot(spark)
    assert snap.columns == ["k", "v", "score"]
    assert _files(t, v2) == _files(t, v1)


def test_add_column_sql_ddl(spark, tmp_path):
    """ALTER TABLE t ADD COLUMN[S] routed through execute_dml; types
    with internal commas (decimal(10,2), map<string,int>) parse."""
    t = ManifestTable(str(tmp_path / "acddl"))
    t.overwrite(spark.createDataFrame([(1, 10)], "k long, v long"))
    execute_dml(spark, t, "ALTER TABLE acddl ADD COLUMN score double")
    execute_dml(
        spark, t,
        "ALTER TABLE acddl ADD COLUMNS tags array<string>, "
        "price decimal(10,2), attrs map<string,int>",
    )
    sch = {f.name: f.dataType.simpleString() for f in t.snapshot(spark).schema}
    assert sch == {
        "k": "bigint", "v": "bigint", "score": "double",
        "tags": "array<string>", "price": "decimal(10,2)",
        "attrs": "map<string,int>",
    }
    with pytest.raises(ValueError, match="expected\n?\\s*<name> <type>|expected"):
        execute_dml(spark, t, "ALTER TABLE acddl ADD COLUMN nonsense")


def test_delete_predicates_over_added_column(spark, tmp_path):
    """Both DELETE modes resolve predicates over a metadata-only added
    column (the discovery scans NULL-fill fields the files predate —
    the round-11 fix the kicc_mart_add_column oracle caught for
    UPDATE; pinned here for CoW and MoR deletes too)."""
    t = ManifestTable(str(tmp_path / "delac"))
    t.overwrite(spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k long, v long"))
    t.alter_schema(spark, add={"flag": "boolean"})
    t.append(spark.createDataFrame([(4, 40, True)], "k long, v long, flag boolean"))
    # CoW: NULL flag rows match "flag IS NULL"; only old-file rows drop
    t.delete_where(spark, "flag IS NULL AND k = 1")
    assert {r.k for r in t.snapshot(spark).collect()} == {2, 3, 4}
    # MoR: DV delete over the added column
    t.delete_where(spark, "flag = true", mode="merge_on_read")
    assert {r.k for r in t.snapshot(spark).collect()} == {2, 3}
