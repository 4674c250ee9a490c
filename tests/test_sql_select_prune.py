"""File skipping from routed SELECT (VERDICT r13 task 4): a SELECT
whose WHERE is a simple top-level conjunction on ONE resolved table
plans its view through ``snapshot_where``'s pruned file list — stats,
partition values, and blooms skip cold files before the scan exists —
with results hash-identical to the unpruned route. Anything richer
(OR, joins, CTEs, subqueries, set ops, foreign columns) falls back to
the plain snapshot view."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_job_spark.sql import execute_dml, execute_sql
from etl_job_spark.table import ManifestTable
from etl_job_spark.txn import TransactionalCatalog


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def clustered(spark, tmp_path):
    """8 files range-clustered by k — narrow k-predicates prune."""
    t = ManifestTable(str(tmp_path / "sales"))
    df = spark.range(0, 8000).select(
        F.col("id").alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    t.overwrite(df.repartitionByRange(8, "k"))
    return t


def test_simple_where_prunes_files(spark, clustered):
    t = clustered
    out = execute_dml(
        spark, t, "SELECT k, v FROM sales WHERE k BETWEEN 100 AND 200"
    )
    want = _rows(t.snapshot(spark).filter("k BETWEEN 100 AND 200"))
    assert _rows(out) == want  # hash-identical to the unpruned route
    plan = t.last_planning
    assert plan is not None and plan["kept"] < plan["candidates"]
    assert plan["kept"] == 1 and plan["candidates"] == 8


def test_alias_qualified_where_prunes(spark, clustered):
    t = clustered
    out = execute_dml(
        spark, t, "SELECT s.k FROM sales s WHERE s.k = 150 AND s.v >= 0"
    )
    assert _rows(out) == [(150,)]
    assert t.last_planning["kept"] == 1


def test_bloom_point_lookup_prunes(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "pts"))
    # scattered key values: ranges never prune, blooms do
    df = spark.range(0, 4000).select(
        ((F.col("id") * 2654435761) % 100000).alias("k"),
        F.col("id").alias("payload"),
    )
    t.overwrite(df.repartition(8), bloom_cols=["k"])
    probe = t.snapshot(spark).first().k
    out = execute_dml(spark, t, f"SELECT payload FROM pts WHERE k = {probe}")
    want = _rows(t.snapshot(spark).filter(F.col("k") == probe).select("payload"))
    assert _rows(out) == want
    assert t.last_planning["kept"] < t.last_planning["candidates"]


def test_time_travel_select_prunes_pinned_version(spark, clustered):
    t = clustered
    t.append(
        spark.range(8000, 9000).select(
            F.col("id").alias("k"), F.lit(0.0).alias("v")
        )
    )
    out = execute_dml(
        spark, t, "SELECT k FROM sales VERSION AS OF 1 WHERE k >= 7900"
    )
    assert len(out.collect()) == 100  # v1 stops at 7999
    assert t.last_planning["version"] == 1
    assert t.last_planning["kept"] < t.last_planning["candidates"]


def test_top_level_or_prunes_via_any_of(spark, clustered):
    """A disjunction of spec-parseable conjunctions plans DNF file
    skipping: each disjunct prunes independently, a file survives when
    ANY might match — the multi-window read from SQL."""
    t = clustered
    df = execute_dml(
        spark, t,
        "SELECT k FROM sales WHERE (k BETWEEN 10 AND 20) OR k >= 7990",
    )
    want = _rows(
        t.snapshot(spark).filter("(k BETWEEN 10 AND 20) OR k >= 7990").select("k")
    )
    assert _rows(df) == want and len(want) == 21
    plan = t.last_planning
    assert plan is not None and plan["kept"] == 2 and plan["candidates"] == 8
    # a disjunct richer than the spec grammar falls back whole
    t.last_planning = None
    df2 = execute_dml(
        spark, t, "SELECT k FROM sales WHERE k = 1 OR k + 0 = 2"
    )
    assert _rows(df2) == [(1,), (2,)]
    assert t.last_planning is None


@pytest.mark.parametrize(
    "stmt",
    [
        # OR with a parenthesized MIXED conjunct (inner OR inside an
        # AND) is not a flat DNF of spec conjunctions
        "SELECT k FROM sales WHERE k = 1 AND (v > 2 OR v < 0)",
        # CTE: the outer WHERE may reference computed columns
        "WITH a AS (SELECT k + 1 AS k FROM sales) SELECT k FROM a WHERE k = 5",
        # derived table
        "SELECT k FROM (SELECT k FROM sales) WHERE k = 5",
        # set op: two SELECTs share no WHERE
        "SELECT k FROM sales WHERE k = 1 UNION ALL SELECT k FROM sales WHERE k = 2",
    ],
)
def test_richer_shapes_fall_back_to_plain_snapshot(spark, clustered, stmt):
    t = clustered
    t.last_planning = None
    df = execute_dml(spark, t, stmt)
    df.collect()
    assert t.last_planning is None  # snapshot_where never engaged


def test_join_with_view_falls_back_but_is_correct(spark, clustered):
    t = clustered
    spark.createDataFrame([(150, "x")], "k int, tag string").createOrReplaceTempView(
        "sales_tags"
    )
    t.last_planning = None
    df = execute_dml(
        spark, t,
        "SELECT s.k, g.tag FROM sales s JOIN sales_tags g ON s.k = g.k "
        "WHERE s.k = 150",
    )
    assert _rows(df) == [(150, "x")]
    assert t.last_planning is None


def test_foreign_bare_column_falls_back(spark, clustered):
    """A bare WHERE column that is NOT a committed column of the table
    must never plan a residual — the shape falls back."""
    t = clustered
    spark.createDataFrame([(9,)], "zz int").createOrReplaceTempView(
        "zz_side"
    )
    t.last_planning = None
    # comma cross join keeps pending==1 (zz_side is a view); zz is not
    # a sales column so the spec is rejected
    df = execute_dml(
        spark, t, "SELECT sales.k FROM sales, zz_side WHERE zz = 9 AND k = 1"
    )
    assert _rows(df) == [(1,)]
    assert t.last_planning is None


def test_literal_containing_alias_dot_is_never_dequalified(spark, tmp_path):
    """The qualifier strip must run on masked text: a string literal
    containing '<alias>.' comes through byte-exact — mangling it would
    plan a spec with a WRONG literal value and silently drop rows."""
    t = ManifestTable(str(tmp_path / "notes"))
    t.overwrite(
        spark.createDataFrame(
            [(1, "s.abc"), (2, "abc")], "k int, note string"
        ).repartitionByRange(2, "k")
    )
    df = execute_dml(
        spark, t, "SELECT s.k FROM notes s WHERE s.note = 's.abc'"
    )
    assert _rows(df) == [(1,)]  # the literal survived the strip
    # and the prune DID engage on the correct spec
    assert t.last_planning is not None


def test_catalog_select_prunes_and_matches(spark, tmp_path):
    cat = TransactionalCatalog(str(tmp_path))
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("g")
    )
    cat.commit(lambda txn: txn.overwrite("t", df.repartitionByRange(4, "k")))
    out = execute_sql(spark, cat, "SELECT k FROM t WHERE k < 100")
    assert len(out.collect()) == 100
