"""Metadata-only TYPE WIDENING (Delta 4 / Iceberg v3 shape):
``alter_schema(widen={col: type})`` / ``ALTER TABLE … ALTER COLUMN …
TYPE`` moves a column up a lossless lattice (integer chain,
float→double, decimal precision) in a commit that carries every file by
reference. Old files keep their narrow physical type; the library read
path reconciles batches to the widest type, the Data Source path casts
per Arrow batch, and every prune tier stays sound (integer stats,
blooms, and partition-dir spellings are width-independent).
"""

from __future__ import annotations

import decimal

import pytest

from etl_job_spark.sources.manifest_source import read_manifest_table
from etl_job_spark.sql import execute_dml
from etl_job_spark.table import ManifestTable, _is_widening


def _wide_table(spark, tmp_path, bloom=False):
    t = ManifestTable(str(tmp_path / "wt"))
    t.overwrite(
        spark.createDataFrame(
            [(1, 1.5, 10), (2, 2.5, 20)], "k int, x float, v int"
        ),
        bloom_cols=["k"] if bloom else None,
    )
    t.alter_schema(spark, widen={"k": "bigint", "x": "double"})
    return t


def test_lattice():
    assert _is_widening("int", "bigint")
    assert _is_widening("tinyint", "int")
    assert _is_widening("float", "double")
    assert _is_widening("decimal(5,2)", "decimal(14,2)")
    assert not _is_widening("bigint", "int")          # narrowing
    assert not _is_widening("int", "int")             # no-op
    assert not _is_widening("int", "double")          # lossy past 2^53
    assert not _is_widening("decimal(5,2)", "decimal(14,4)")  # scale change
    assert not _is_widening("int", "string")          # cross-family
    assert not _is_widening("date", "timestamp")      # stat encoding family


def test_widen_is_metadata_only_and_reads_promote(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([(1, 1.5, 10)], "k int, x float, v int"))
    before = {e["path"] for e in t._read_manifest(t.latest_version())["files"]}
    t.alter_schema(spark, widen={"k": "bigint", "x": "double"})
    man = t._read_manifest(t.latest_version())
    assert {e["path"] for e in man["files"]} == before
    df = t.snapshot(spark)
    assert dict(df.dtypes) == {"k": "bigint", "x": "double", "v": "int"}
    assert [tuple(r) for r in df.collect()] == [(1, 1.5, 10)]
    # time travel reads the ORIGINAL narrow schema
    assert dict(t.snapshot(spark, 1).dtypes)["k"] == "int"


def test_mixed_width_files_union_and_prune(spark, tmp_path):
    t = _wide_table(spark, tmp_path, bloom=True)
    # wide append (beyond int32) AND a still-narrow writer's append
    t.append(spark.createDataFrame([(2**40, 9.25, 30)], "k bigint, x double, v int"))
    t.append(spark.createDataFrame([(7, 3.5, 40)], "k int, x float, v int"))
    rows = sorted((r.k, r.x, r.v) for r in t.snapshot(spark).collect())
    assert rows == [(1, 1.5, 10), (2, 2.5, 20), (7, 3.5, 40), (2**40, 9.25, 30)]
    # stats prune with a probe no int32 file can hold: narrow files skip
    sub = t.snapshot_where(spark, [("k", ">", 2**35)])
    assert [r.k for r in sub.collect()] == [2**40]
    assert t.last_planning["kept"] == 1
    # bloom-planned point delete on the widened key
    t.delete_keys(spark, "k", [2**40])
    assert sorted(r.k for r in t.snapshot(spark).collect()) == [1, 2, 7]


def test_data_source_path_promotes(spark, tmp_path):
    t = _wide_table(spark, tmp_path)
    t.append(spark.createDataFrame([(2**40, 9.25, 30)], "k bigint, x double, v int"))
    df = read_manifest_table(spark, t.path)
    assert dict(df.dtypes)["k"] == "bigint"
    assert sorted(r.k for r in df.collect()) == [1, 2, 2**40]
    pruned = read_manifest_table(spark, t.path, predicates=[("k", ">", 2**35)])
    assert [r.k for r in pruned.collect()] == [2**40]


def test_merge_and_meta_agg_on_widened_key(spark, tmp_path):
    t = _wide_table(spark, tmp_path)
    t.append(spark.createDataFrame([(2**40, 9.25, 30)], "k bigint, x double, v int"))
    src = spark.createDataFrame([(1, -1), (2**41, 5)], "k bigint, v int")
    t.merge(spark, src, ["k"])
    got = {r.k: r.v for r in t.snapshot(spark).collect()}
    assert got[1] == -1 and got[2**41] == 5
    agg = t.meta_agg(spark, ["k"])
    assert agg["columns"]["k"]["min"] == 1
    assert agg["columns"]["k"]["max"] == 2**41


def test_sql_alter_column_type(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "wt"))
    t.overwrite(spark.createDataFrame([(1, 10)], "k int, v int"))
    execute_dml(spark, t, "ALTER TABLE wt ALTER COLUMN k TYPE bigint")
    assert dict(t.snapshot(spark).dtypes)["k"] == "bigint"
    with pytest.raises(ValueError, match="lossless"):
        execute_dml(spark, t, "ALTER TABLE wt ALTER COLUMN v TYPE string")
    with pytest.raises(ValueError, match="lossless"):
        execute_dml(spark, t, "ALTER TABLE wt ALTER COLUMN k TYPE int")


def test_decimal_widening_stats_stay_exact(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame(
            [(decimal.Decimal("1.25"), 1), (decimal.Decimal("7.50"), 2)],
            "m decimal(5,2), v int",
        )
    )
    t.alter_schema(spark, widen={"m": "decimal(14,2)"})
    assert dict(t.snapshot(spark).dtypes)["m"] == "decimal(14,2)"
    sub = t.snapshot_where(spark, [("m", ">", decimal.Decimal("5"))])
    assert [r.v for r in sub.collect()] == [2]
    with pytest.raises(ValueError, match="lossless"):
        t.alter_schema(spark, widen={"m": "decimal(14,4)"})


def test_float_partition_source_refuses(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame([(1.5, 1)], "fx float, v int"), partition_by=["fx"]
    )
    with pytest.raises(ValueError, match="partition/transform source"):
        t.alter_schema(spark, widen={"fx": "double"})


def test_int_partition_source_widens(spark, tmp_path):
    # integer dir spellings are width-independent: widening a raw
    # partition source is safe, and new wide writes land/prune right
    t = ManifestTable(str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame([(1, 10), (2, 20)], "p int, v int"),
        partition_by=["p"],
    )
    t.alter_schema(spark, widen={"p": "bigint"})
    t.append(spark.createDataFrame([(2**40, 30)], "p bigint, v int"))
    sub = t.snapshot_where(spark, [("p", "=", 2**40)])
    assert [r.v for r in sub.collect()] == [30]
    assert t.last_planning["kept"] == 1
    assert sorted(r.v for r in t.snapshot(spark).collect()) == [10, 20, 30]


def test_guarded_table_widening(spark, tmp_path):
    # CHECK constraints keep enforcing across widths (numeric compare),
    # blooms keep building on narrow task batches
    t = ManifestTable(str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame([(1, 10)], "k int, v int"), bloom_cols=["k"]
    )
    t.alter_constraints(spark, add={"v_pos": "v > 0"})
    t.alter_schema(spark, widen={"k": "bigint"})
    t.append(spark.createDataFrame([(2**40, 5)], "k bigint, v int"))
    with pytest.raises(ValueError, match="v_pos"):
        t.append(spark.createDataFrame([(3, -1)], "k int, v int"))
    assert sorted(r.k for r in t.snapshot(spark).collect()) == [1, 2**40]


def test_widen_unknown_or_renamed_columns(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([(1, 10)], "k int, v int"))
    with pytest.raises(ValueError, match="unknown column"):
        t.alter_schema(spark, widen={"zzz": "bigint"})
    # widening follows a RENAME: the logical name widens, files keep
    # storing the narrow physical column
    t.rename_column("v", "amount")
    t.alter_schema(spark, widen={"amount": "bigint"})
    t.append(spark.createDataFrame([(2, 2**40)], "k int, amount bigint"))
    got = {r.k: r.amount for r in t.snapshot(spark).collect()}
    assert got == {1: 10, 2: 2**40}
