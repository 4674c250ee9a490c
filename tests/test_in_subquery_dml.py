"""IN-subquery DELETE/UPDATE (round 14, VERDICT r13 Missing #5):
``DELETE FROM t WHERE k [NOT] IN (SELECT …)`` routes through the
statement-body resolver into a keyed merge — file pruning from the
subquery's key envelope for IN, SQL's three-valued NOT IN semantics
honored, correlated forms refused loudly."""

from __future__ import annotations

import pytest

from etl_job_spark.sql import execute_dml, execute_sql
from etl_job_spark.table import ManifestTable
from etl_job_spark.txn import TransactionalCatalog


@pytest.fixture()
def cat(spark, tmp_path):
    c = TransactionalCatalog(str(tmp_path / "cat"))
    stg = c.table("staging")
    stg.overwrite(
        spark.range(0, 2000)
        .selectExpr("id as k", "id * 1.0 as v")
        .repartitionByRange(8, "k")
    )
    mart = c.table("mart")
    mart.overwrite(spark.range(100, 150).selectExpr("id as k"))
    return c


def test_in_subquery_delete_prunes_from_key_envelope(spark, cat):
    execute_sql(
        spark, cat,
        "DELETE FROM staging WHERE k IN (SELECT k FROM mart WHERE k < 120)",
    )
    t = cat.table("staging")
    got = sorted(r.k for r in t.snapshot(spark).collect())
    assert got == [k for k in range(2000) if not (100 <= k < 120)]
    # the subquery's key envelope pruned the merge to ONE of 8
    # range-clustered files (commit metrics record the physical work)
    m = [
        h for h in t.history()
        if h.get("operation", {}).get("op") == "merge"
    ][-1]
    met = m["operation"]["metrics"]
    assert met["files_removed"] == 1 and met["live_rows_delta"] == -20, met


def test_in_subquery_update(spark, cat):
    execute_sql(
        spark, cat,
        "UPDATE staging SET v = v + 1000 "
        "WHERE k IN (SELECT k FROM mart WHERE k >= 120)",
    )
    rows = {
        r.k: r.v
        for r in cat.table("staging")
        .snapshot(spark)
        .filter("k between 118 and 152")
        .collect()
    }
    assert rows[121] == 1121.0 and rows[149] == 1149.0
    assert rows[118] == 118.0 and rows[151] == 151.0  # outside: untouched


def test_not_in_with_null_in_subquery_is_a_noop(spark, cat):
    s2 = cat.table("s2")
    s2.overwrite(spark.createDataFrame([(1, 1.0), (2, 2.0)], "k int, v double"))
    nulls = cat.table("nulls")
    nulls.overwrite(
        spark.sql("SELECT cast(null as int) AS k UNION ALL SELECT 1")
    )
    v = s2.latest_version()
    execute_sql(spark, cat, "DELETE FROM s2 WHERE k NOT IN (SELECT k FROM nulls)")
    assert cat.table("s2").latest_version() == v  # SQL: matches no row
    # without NULLs the complement deletes (NULL target keys untouched)
    execute_sql(
        spark, cat,
        "DELETE FROM s2 WHERE k NOT IN "
        "(SELECT k FROM nulls WHERE k IS NOT NULL)",
    )
    assert [r.k for r in cat.table("s2").snapshot(spark).collect()] == [1]


def test_not_in_update_guards_null_target_keys(spark, cat):
    s3 = cat.table("s3")
    s3.overwrite(
        spark.sql(
            "SELECT * FROM VALUES (1, 1.0), (2, 2.0), (cast(null as int), 9.0)"
            " AS t(k, v)"
        )
    )
    execute_sql(
        spark, cat,
        "UPDATE s3 SET v = 0 WHERE k NOT IN (SELECT k FROM mart WHERE k = 101)",
    )
    got = sorted(
        (r.k, r.v) for r in cat.table("s3").snapshot(spark).collect()
        if r.k is not None
    )
    assert got == [(1, 0.0), (2, 0.0)]
    # the NULL-key row is UNKNOWN under NOT IN — never updated
    nulls = [r.v for r in cat.table("s3").snapshot(spark).collect() if r.k is None]
    assert nulls == [9.0]


def test_correlated_subquery_refuses_loudly(spark, cat):
    with pytest.raises(ValueError, match="correlated"):
        execute_sql(
            spark, cat,
            "DELETE FROM staging WHERE k IN "
            "(SELECT k FROM mart WHERE mart.k = staging.k)",
        )


def test_in_subquery_multi_column_refuses(spark, cat):
    with pytest.raises(ValueError, match="exactly ONE column"):
        execute_sql(
            spark, cat,
            "DELETE FROM staging WHERE k IN (SELECT k, k FROM mart)",
        )


def test_literal_containing_in_select_is_not_routed(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame(
            [(1, "k IN (SELECT trap)"), (2, "b")], "k int, v string"
        )
    )
    execute_dml(spark, t, "DELETE FROM t WHERE v = 'k IN (SELECT trap)'")
    assert [r.k for r in t.snapshot(spark).collect()] == [2]


def test_in_subquery_via_direct_table_surface(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.overwrite(spark.range(0, 10).selectExpr("id as k"))
    spark.range(3, 6).selectExpr("id as k").createOrReplaceTempView(
        "subq_keys_r14"
    )
    execute_dml(
        spark, t, "DELETE FROM t WHERE k IN (SELECT k FROM subq_keys_r14)"
    )
    assert sorted(r.k for r in t.snapshot(spark).collect()) == [
        0, 1, 2, 6, 7, 8, 9,
    ]


def test_in_subquery_dml_inside_txn_bracket(spark, tmp_path):
    """IN-subquery DELETE/UPDATE inside BEGIN…COMMIT ride the same
    keyed-merge route under ONE transaction record — the subquery
    resolves through the catalog like every statement body."""
    c = TransactionalCatalog(str(tmp_path / "cat"))
    stg = c.table("stg")
    stg.overwrite(spark.range(0, 100).selectExpr("id as k", "id * 1.0 as v"))
    m = c.table("m")
    m.overwrite(spark.range(10, 20).selectExpr("id as k"))
    from etl_job_spark.sql import execute_sql_script

    n_records_before = len(c._txn_ids())
    execute_sql_script(
        spark, c,
        """
        BEGIN;
        DELETE FROM stg WHERE k IN (SELECT k FROM m);
        UPDATE stg SET v = -1 WHERE k IN (SELECT k + 50 FROM m);
        COMMIT
        """,
    )
    rows = {r.k: r.v for r in c.table("stg").snapshot(spark).collect()}
    assert all(k not in rows for k in range(10, 20))
    assert all(rows[k] == -1.0 for k in range(60, 70))
    assert rows[5] == 5.0 and rows[99] == 99.0
    assert len(c._txn_ids()) == n_records_before + 1  # ONE record
