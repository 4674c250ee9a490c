"""Catalog table names resolve INSIDE DML statement bodies (VERDICT
r13 task 2): ``INSERT INTO … SELECT`` bodies, CTAS bodies, ``INSERT
OVERWRITE``/``REPLACE WHERE`` bodies, and ``MERGE … USING <name>``
sources all route through the same resolver as a top-level SELECT —
CTE shadowing, time-travel suffixes, and transaction-chained staged
state included. The lifecycle drive writes a mart from a staging
MANIFEST table by name with ZERO manual view registration,
DuckDB-oracled."""

from __future__ import annotations

import duckdb
import pytest

from etl_job_spark.sql import execute_dml, execute_sql, execute_sql_script
from etl_job_spark.table import ManifestTable
from etl_job_spark.txn import TransactionalCatalog


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def cat(spark, tmp_path):
    c = TransactionalCatalog(str(tmp_path))
    c.commit(
        lambda txn: txn.overwrite(
            "staging",
            spark.createDataFrame(
                [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
                "k int, grp string, v double",
            ),
        )
    )
    return c


def test_insert_select_body_resolves_catalog_name(spark, cat):
    execute_sql(spark, cat, "CREATE TABLE mart (k int, v double)")
    execute_sql(
        spark, cat,
        "INSERT INTO mart SELECT k, v FROM staging WHERE grp = 'a'",
    )
    assert _rows(execute_sql(spark, cat, "SELECT k, v FROM mart")) == [
        (1, 10.0), (3, 30.0),
    ]


def test_ctas_body_resolves_catalog_name(spark, cat):
    execute_sql(
        spark, cat,
        "CREATE TABLE mart AS SELECT grp, sum(v) AS total FROM staging "
        "GROUP BY grp",
    )
    assert _rows(execute_sql(spark, cat, "SELECT grp, total FROM mart")) == [
        ("a", 40.0), ("b", 20.0),
    ]


def test_insert_overwrite_and_replace_where_bodies_resolve(spark, cat):
    execute_sql(spark, cat, "CREATE TABLE mart AS SELECT k, v FROM staging")
    execute_sql(
        spark, cat, "INSERT OVERWRITE mart SELECT k, v * 2 AS v FROM staging"
    )
    assert _rows(execute_sql(spark, cat, "SELECT v FROM mart")) == [
        (20.0,), (40.0,), (60.0,),
    ]
    execute_sql(
        spark, cat,
        "INSERT INTO mart REPLACE WHERE k = 1 "
        "SELECT k, v FROM staging WHERE k = 1",
    )
    assert _rows(execute_sql(spark, cat, "SELECT v FROM mart")) == [
        (10.0,), (40.0,), (60.0,),
    ]


def test_merge_using_catalog_name_and_version_as_of(spark, cat):
    execute_sql(spark, cat, "CREATE TABLE mart AS SELECT k, v FROM staging")
    execute_sql(spark, cat, "UPDATE staging SET v = 999.0 WHERE k = 1")
    execute_sql(
        spark, cat,
        "MERGE INTO mart a USING staging b ON a.k = b.k "
        "WHEN MATCHED THEN UPDATE SET a.v = b.v",
    )
    assert _rows(execute_sql(spark, cat, "SELECT k, v FROM mart")) == [
        (1, 999.0), (2, 20.0), (3, 30.0),
    ]
    # CDC replay: merge the PRE-update staging state back in
    execute_sql(
        spark, cat,
        "MERGE INTO mart a USING staging VERSION AS OF 1 b ON a.k = b.k "
        "WHEN MATCHED THEN UPDATE SET a.v = b.v",
    )
    assert _rows(execute_sql(spark, cat, "SELECT k, v FROM mart")) == [
        (1, 10.0), (2, 20.0), (3, 30.0),
    ]


def test_merge_time_travel_on_unresolvable_source_refuses(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "m"))
    t.overwrite(spark.createDataFrame([(1, 1.0)], "k int, v double"))
    spark.createDataFrame([(1, 2.0)], "k int, v double").createOrReplaceTempView(
        "plain_view"
    )
    with pytest.raises(ValueError, match="time travel on MERGE source"):
        execute_dml(
            spark, t,
            "MERGE INTO m a USING plain_view VERSION AS OF 1 b ON a.k = b.k "
            "WHEN MATCHED THEN UPDATE SET a.v = b.v",
        )


def test_cte_shadows_catalog_table_inside_body(spark, cat):
    # a CTE named like the catalog table wins per SQL scoping — the
    # body's `staging` is the CTE, not the enrolled table
    execute_sql(
        spark, cat,
        "CREATE TABLE mart AS WITH staging AS (SELECT 99 AS k) "
        "SELECT k FROM staging",
    )
    assert _rows(execute_sql(spark, cat, "SELECT k FROM mart")) == [(99,)]


def test_self_referencing_insert_body(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([(1,), (2,)], "k int"))
    execute_dml(spark, t, "INSERT INTO t SELECT k + 10 FROM t")
    assert _rows(t.snapshot(spark)) == [(1,), (2,), (11,), (12,)]


def test_txn_body_sees_chained_staged_state(spark, cat):
    """Inside ONE transaction, a later statement's body reading a
    table an earlier statement wrote sees the STAGED state — the same
    chaining contract single-table statement lists have."""
    execute_sql(spark, cat, "CREATE TABLE mart (k int, v double)")
    execute_sql_script(
        spark, cat,
        """
        BEGIN;
        UPDATE staging SET v = 777.0 WHERE k = 2;
        INSERT INTO mart SELECT k, v FROM staging WHERE k = 2;
        COMMIT;
        """,
    )
    assert _rows(execute_sql(spark, cat, "SELECT k, v FROM mart")) == [
        (2, 777.0),
    ]


def test_unresolved_body_names_pass_through_to_views(spark, cat):
    spark.createDataFrame([(42, 1.0)], "k int, v double").createOrReplaceTempView(
        "loose_view"
    )
    execute_sql(spark, cat, "CREATE TABLE mart AS SELECT k, v FROM loose_view")
    assert _rows(execute_sql(spark, cat, "SELECT k FROM mart")) == [(42,)]


def test_lifecycle_drive_staging_to_mart_oracled(spark, tmp_path, sf_dir):
    """The full lifecycle with zero manual view registration, on real
    testdata: land orders as a staging MANIFEST table, build the mart
    from it BY NAME (CTAS + MERGE USING), oracle the result against
    DuckDB computing the same pipeline from the parquet."""
    cat = TransactionalCatalog(str(tmp_path))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cat.commit(lambda txn: txn.overwrite("orders_staging", orders))
    execute_sql_script(
        spark, cat,
        """
        CREATE TABLE order_mart AS
          SELECT o_custkey AS cust, sum(o_totalprice) AS total,
                 count(*) AS n
          FROM orders_staging GROUP BY o_custkey;
        MERGE INTO order_mart t USING order_mart s ON t.cust = s.cust
          WHEN MATCHED AND s.n > 10 THEN DELETE;
        """,
    )
    got = execute_sql(
        spark, cat, "SELECT cust, total, n FROM order_mart"
    ).toPandas().sort_values("cust").reset_index(drop=True)
    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT o_custkey AS cust, sum(o_totalprice) AS total, count(*) AS n
        FROM read_parquet('{sf_dir}/orders.parquet')
        GROUP BY o_custkey HAVING count(*) <= 10 ORDER BY cust
        """
    ).df().reset_index(drop=True)
    assert len(got) == len(want) and len(got) > 0
    assert (got["cust"].to_numpy() == want["cust"].to_numpy()).all()
    assert abs(got["total"].to_numpy() - want["total"].to_numpy()).max() < 1e-6
