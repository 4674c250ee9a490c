"""MERGE schema evolution (Delta's ``WITH SCHEMA EVOLUTION``): clause
merges extend the table schema with the source columns the statement
ASSIGNS — a metadata change (untouched files carried by reference, NULL
fill on read), opt-in via ``schema_evolution=True`` / the SQL prefix.
Merge metadata (order_col, CDC flag) never evolves in; type changes and
tombstone resurrection still refuse.
"""

from __future__ import annotations

import pytest

from etl_job_spark.sql import execute_dml, statement_table
from etl_job_spark.table import ManifestTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _base(spark, tmp_path, name="t"):
    t = ManifestTable(str(tmp_path / name))
    t.append(spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k int, v int"))
    return t


def _src(spark):
    return spark.createDataFrame(
        [(1, 11, "x"), (4, 44, "y")], "k int, v int, tag string"
    )


def test_identity_list_evolves_new_column(spark, tmp_path):
    t = _base(spark, tmp_path)
    t.merge(
        spark, _src(spark), ["k"],
        when_matched_update=["v", "tag"], schema_evolution=True,
    )
    assert _rows(t.snapshot(spark)) == sorted(
        [(1, 11, "x"), (2, 20, None), (3, 30, None), (4, 44, "y")]
    )
    # pre-evolution version still reads the old width (time travel)
    assert "tag" not in t.snapshot(spark, 1).columns


def test_without_flag_new_column_refuses(spark, tmp_path):
    t = _base(spark, tmp_path)
    with pytest.raises(ValueError, match="non-key target columns"):
        t.merge(spark, _src(spark), ["k"], when_matched_update=["v", "tag"])


def test_untouched_files_carry_by_reference(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(p, k, k) for p in ("a", "b") for k in range(3)], "p string, k int, v int"
    )
    t.overwrite(df, partition_by=["p"])
    before = {e["path"] for e in t._read_manifest(t.latest_version())["files"]}
    src = spark.createDataFrame([("a", 1, "x")], "p string, k int, tag string")
    t.merge(
        spark, src, ["p", "k"],
        when_matched_update=["tag"], schema_evolution=True,
    )
    man = t._read_manifest(t.latest_version())
    carried = {e["path"] for e in man["files"]} & before
    # partition b never rewrites: the evolution is metadata for it
    assert {p for p in before if "p=b" in p} <= carried
    got = {(r.p, r.k): r.tag for r in t.snapshot(spark).collect()}
    assert got[("a", 1)] == "x" and got[("b", 1)] is None


def test_expression_set_sources_new_column(spark, tmp_path):
    t = _base(spark, tmp_path)
    t.merge(
        spark, _src(spark), ["k"],
        when_matched_update={"tag": "upper(source.tag)"},
        insert_unmatched=False, schema_evolution=True,
    )
    got = {r.k: r.tag for r in t.snapshot(spark).collect()}
    assert got == {1: "X", 2: None, 3: None}


def test_expression_set_absent_everywhere_refuses(spark, tmp_path):
    # 'zzz' exists in neither the table nor the source: no type to
    # derive — refuses even under schema_evolution
    t = _base(spark, tmp_path)
    with pytest.raises(ValueError, match="non-key target columns"):
        t.merge(
            spark, _src(spark), ["k"],
            when_matched_update={"zzz": "v + 1"},
            insert_unmatched=False, schema_evolution=True,
        )


def test_insert_star_evolves_all_source_columns(spark, tmp_path):
    t = _base(spark, tmp_path)
    t.merge(
        spark, _src(spark), ["k"],
        when_matched_update=["v"], schema_evolution=True,
    )
    assert _rows(t.snapshot(spark)) == sorted(
        [(1, 11, None), (2, 20, None), (3, 30, None), (4, 44, "y")]
    )


def test_merge_metadata_never_evolves(spark, tmp_path):
    # order_col and the CDC flag column are merge metadata: whole-row
    # INSERT * under evolution must not bake them into the schema
    t = _base(spark, tmp_path)
    src = spark.createDataFrame(
        [(4, 44, "y", False, 1), (5, 55, "z", True, 2)],
        "k int, v int, tag string, _del boolean, seq int",
    )
    t.merge(
        spark, src, ["k"],
        when_matched_update=["v"], when_matched_delete="_del",
        order_col="seq", schema_evolution=True,
    )
    cols = t.snapshot(spark).columns
    assert "tag" in cols and "_del" not in cols and "seq" not in cols


def test_shared_column_type_change_still_refuses(spark, tmp_path):
    t = _base(spark, tmp_path)
    src = spark.createDataFrame([(1, "big", "x")], "k int, v string, tag string")
    with pytest.raises(ValueError, match="cannot change column"):
        t.merge(
            spark, src, ["k"],
            when_matched_update=["v", "tag"], schema_evolution=True,
        )


def test_dropped_column_resurrection_refuses(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame([(1, 10, "a")], "k int, v int, tag string")
    )
    t.alter_schema(spark, drop=["tag"])
    with pytest.raises(ValueError, match="DROPPED"):
        t.merge(
            spark, _src(spark), ["k"],
            when_matched_update=["v", "tag"], schema_evolution=True,
        )


def test_ordered_clauses_evolution(spark, tmp_path):
    t = _base(spark, tmp_path)
    t.merge(
        spark, _src(spark), ["k"],
        clauses=[
            ("update", "source.v > 100", ["v"]),
            ("update", None, {"tag": "source.tag"}),
            ("insert", None, ["k", "v", "tag"]),
        ],
        schema_evolution=True,
    )
    assert _rows(t.snapshot(spark)) == sorted(
        [(1, 10, "x"), (2, 20, None), (3, 30, None), (4, 44, "y")]
    )


def test_sql_with_schema_evolution_both_routes(spark, tmp_path):
    # flat route (single clause)
    t = ManifestTable(str(tmp_path / "tbl_a"))
    t.append(spark.createDataFrame([(1, 10)], "k int, v int"))
    _src(spark).createOrReplaceTempView("s_ev_sql")
    execute_dml(spark, t, """
        MERGE WITH SCHEMA EVOLUTION INTO tbl_a a USING s_ev_sql b
        ON a.k = b.k WHEN MATCHED THEN UPDATE SET a.tag = b.tag
    """)
    assert _rows(t.snapshot(spark)) == [(1, 10, "x")]
    # ordered route (multi-clause + INSERT *)
    t2 = ManifestTable(str(tmp_path / "tbl_b"))
    t2.append(spark.createDataFrame([(1, 10), (2, 20)], "k int, v int"))
    execute_dml(spark, t2, """
        MERGE WITH SCHEMA EVOLUTION INTO tbl_b a USING s_ev_sql b
        ON a.k = b.k
        WHEN MATCHED AND b.v > 100 THEN UPDATE SET a.v = b.v
        WHEN MATCHED THEN UPDATE SET a.tag = b.tag
        WHEN NOT MATCHED THEN INSERT *
    """)
    assert _rows(t2.snapshot(spark)) == sorted(
        [(1, 10, "x"), (2, 20, None), (4, 44, "y")]
    )
    # without the prefix the same statements refuse on the new column
    t3 = ManifestTable(str(tmp_path / "tbl_c"))
    t3.append(spark.createDataFrame([(1, 10)], "k int, v int"))
    with pytest.raises(ValueError, match="non-key target columns"):
        execute_dml(spark, t3, """
            MERGE INTO tbl_c a USING s_ev_sql b ON a.k = b.k
            WHEN MATCHED THEN UPDATE SET a.tag = b.tag
        """)


def test_statement_table_parses_evolution_prefix(spark):
    assert statement_table(
        "MERGE WITH SCHEMA EVOLUTION INTO mart t USING s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET t.v = s.v"
    ) == "mart"
