"""CREATE [TEMP] VIEW through the SQL surface (VERDICT r13 task 7):
temp views register the routed SELECT's DataFrame in the session;
persistent views store the statement text in the catalog and
re-resolve at every read — they survive sessions (a NEW catalog
instance over the same root reads them), always see the current
committed table state, compose (views over views, views inside DML
bodies), and refuse cycles and table-name collisions."""

from __future__ import annotations

import duckdb
import pytest

from etl_job_spark.sql import execute_sql, execute_sql_script
from etl_job_spark.txn import TransactionalCatalog


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def cat(spark, tmp_path):
    c = TransactionalCatalog(str(tmp_path))
    c.commit(
        lambda txn: txn.overwrite(
            "sales",
            spark.createDataFrame(
                [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
                "k int, grp string, v double",
            ),
        )
    )
    return c


def test_temp_view_registers_and_replaces(spark, cat):
    execute_sql(
        spark, cat,
        "CREATE TEMP VIEW hot_rows AS SELECT k, v FROM sales WHERE v > 15",
    )
    assert _rows(spark.table("hot_rows")) == [(2, 20.0), (3, 30.0)]
    with pytest.raises(ValueError, match="already exists"):
        execute_sql(
            spark, cat, "CREATE TEMP VIEW hot_rows AS SELECT k FROM sales"
        )
    execute_sql(
        spark, cat,
        "CREATE OR REPLACE TEMP VIEW hot_rows AS SELECT k FROM sales WHERE k = 1",
    )
    assert _rows(spark.table("hot_rows")) == [(1,)]
    spark.catalog.dropTempView("hot_rows")


def test_persistent_view_survives_new_catalog_instance(spark, cat, tmp_path):
    execute_sql(
        spark, cat,
        "CREATE VIEW grp_totals AS "
        "SELECT grp, sum(v) AS total FROM sales GROUP BY grp",
    )
    # a NEW catalog over the same root — the "new session" shape
    cat2 = TransactionalCatalog(str(tmp_path))
    got = _rows(execute_sql(spark, cat2, "SELECT grp, total FROM grp_totals"))
    assert got == [("a", 40.0), ("b", 20.0)]
    # the view re-resolves: it sees NEW committed state, not a freeze
    execute_sql(spark, cat2, "UPDATE sales SET v = 100.0 WHERE k = 1")
    got2 = _rows(execute_sql(spark, cat2, "SELECT grp, total FROM grp_totals"))
    assert got2 == [("a", 130.0), ("b", 20.0)]


def test_persistent_view_oracled_on_testdata(spark, tmp_path, sf_dir):
    cat = TransactionalCatalog(str(tmp_path))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cat.commit(lambda txn: txn.overwrite("orders_t", orders))
    execute_sql(
        spark, cat,
        "CREATE VIEW big_orders AS SELECT o_custkey AS cust, "
        "sum(o_totalprice) AS total FROM orders_t "
        "WHERE o_totalprice > 100000 GROUP BY o_custkey",
    )
    got = (
        execute_sql(spark, cat, "SELECT cust, total FROM big_orders")
        .toPandas().sort_values("cust").reset_index(drop=True)
    )
    want = duckdb.connect().execute(
        f"""
        SELECT o_custkey AS cust, sum(o_totalprice) AS total
        FROM read_parquet('{sf_dir}/orders.parquet')
        WHERE o_totalprice > 100000 GROUP BY o_custkey ORDER BY cust
        """
    ).df().reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert (got["cust"].to_numpy() == want["cust"].to_numpy()).all()
    assert abs(got["total"].to_numpy() - want["total"].to_numpy()).max() < 1e-6


def test_view_over_view_composes(spark, cat):
    execute_sql_script(
        spark, cat,
        "CREATE VIEW v1 AS SELECT k, v FROM sales WHERE v > 15;"
        "CREATE VIEW v2 AS SELECT sum(v) AS s FROM v1;",
    )
    assert _rows(execute_sql(spark, cat, "SELECT s FROM v2")) == [(50.0,)]


def test_view_cycle_refuses(spark, cat):
    # create v_a referencing v_b before v_b exists? creation plans the
    # body, so forward references refuse at create — build the cycle
    # by replacing: v_a -> v_b -> v_a
    execute_sql(spark, cat, "CREATE VIEW v_a AS SELECT k FROM sales")
    execute_sql(spark, cat, "CREATE VIEW v_b AS SELECT k FROM v_a")
    execute_sql(spark, cat, "CREATE OR REPLACE VIEW v_a AS SELECT k FROM v_b")
    with pytest.raises(ValueError, match="cycle"):
        execute_sql(spark, cat, "SELECT k FROM v_a").collect()


def test_view_name_colliding_with_table_refuses(spark, cat):
    with pytest.raises(ValueError, match="enrolled TABLE"):
        execute_sql(spark, cat, "CREATE VIEW sales AS SELECT 1 AS x")


def test_drop_and_show_views(spark, cat):
    execute_sql(spark, cat, "CREATE VIEW v1 AS SELECT k FROM sales")
    execute_sql(spark, cat, "CREATE VIEW v2 AS SELECT v FROM sales")
    assert _rows(execute_sql(spark, cat, "SHOW VIEWS")) == [("v1",), ("v2",)]
    execute_sql(spark, cat, "DROP VIEW v1")
    assert _rows(execute_sql(spark, cat, "SHOW VIEWS")) == [("v2",)]
    with pytest.raises(ValueError, match="does not exist"):
        execute_sql(spark, cat, "DROP VIEW v1")
    execute_sql(spark, cat, "DROP VIEW IF EXISTS v1")  # no-op


def test_view_resolves_inside_dml_body(spark, cat):
    execute_sql(
        spark, cat,
        "CREATE VIEW cheap AS SELECT k, v FROM sales WHERE v < 25",
    )
    execute_sql(spark, cat, "CREATE TABLE mart AS SELECT k, v FROM cheap")
    assert _rows(execute_sql(spark, cat, "SELECT k, v FROM mart")) == [
        (1, 10.0), (2, 20.0),
    ]


def test_time_travel_on_view_refuses(spark, cat):
    execute_sql(spark, cat, "CREATE VIEW v1 AS SELECT k FROM sales")
    with pytest.raises(ValueError, match="VIEW"):
        execute_sql(spark, cat, "SELECT k FROM v1 VERSION AS OF 1")


def test_create_view_with_bad_body_refuses_at_create(spark, cat):
    with pytest.raises(Exception):
        execute_sql(
            spark, cat, "CREATE VIEW broken AS SELECT nope FROM sales"
        )
    assert _rows(execute_sql(spark, cat, "SHOW VIEWS")) == []


def test_introspection_statements_answer_with_rows_via_catalog(spark, cat):
    """DESCRIBE HISTORY / SHOW PARTITIONS / SHOW COLUMNS IN /
    SHOW TBLPROPERTIES are read-only and must return their DataFrames
    through the catalog surface — not vanish into a transaction record
    (r13 review finding: DESCRIBE HISTORY via a catalog returned {})."""
    hist = execute_sql(spark, cat, "DESCRIBE HISTORY sales")
    assert hasattr(hist, "collect") and hist.count() >= 1
    cols = execute_sql(spark, cat, "SHOW COLUMNS IN sales")
    got = {r[0] for r in cols.collect()}
    assert {"k", "grp", "v"} <= got
    det = execute_sql(spark, cat, "DESCRIBE DETAIL sales")
    assert det.count() == 1
    # and inside a script they hit the select_handler like any SELECT
    seen = []
    execute_sql_script(
        spark, cat,
        "DESCRIBE HISTORY sales; SELECT k FROM sales WHERE k = 1;",
        select_handler=lambda stmt, df: seen.append(stmt.split()[0]),
    )
    assert seen == ["DESCRIBE", "SELECT"]


def test_merge_using_view_source(spark, cat):
    """MERGE INTO … USING <view-name>: the view's re-resolved body is
    the merge source (r13 review finding — the resolver handed the
    DataFrame to the table-shaped time-travel path and crashed)."""
    execute_sql(
        spark, cat,
        "CREATE VIEW hot AS SELECT k, v + 1.0 AS v FROM sales WHERE v >= 20",
    )
    execute_sql(
        spark, cat,
        "MERGE INTO sales a USING hot b ON a.k = b.k "
        "WHEN MATCHED THEN UPDATE SET a.v = b.v",
    )
    assert _rows(execute_sql(spark, cat, "SELECT k, v FROM sales")) == [
        (1, 10.0), (2, 21.0), (3, 31.0),
    ]
    with pytest.raises(ValueError, match="VIEW"):
        execute_sql(
            spark, cat,
            "MERGE INTO sales a USING hot VERSION AS OF 1 b ON a.k = b.k "
            "WHEN MATCHED THEN UPDATE SET a.v = b.v",
        )


def test_table_changes_tvf(spark, cat, tmp_path):
    """Delta's table_changes('t', start[, end]) TVF on the SQL
    surface: the batch change feed over a closed version range,
    through the same classify-per-version planner as the stream."""
    execute_sql(spark, cat, "UPDATE sales SET v = 99.0 WHERE k = 2")
    execute_sql_script(
        spark, cat, "DELETE FROM sales WHERE k = 3;",
    )
    df = execute_sql(
        spark, cat,
        "SELECT k, _change, _commit_version FROM table_changes('sales', 2)",
    )
    got = sorted(tuple(r) for r in df.collect())
    # v2 rewrites k=2's file (carried rows surface as delete+insert of
    # themselves — raw feed), v3 deletes k=3
    assert (2, "delete", 2) in got and (2, "insert", 2) in got
    assert (3, "delete", 3) in got
    # bounded range + alias + WHERE over the feed
    n = execute_sql(
        spark, cat,
        "SELECT count(*) AS n FROM table_changes('sales', 3, 3) c "
        "WHERE c._change = 'delete'",
    ).first().n
    assert n == 1
    # an unresolvable name refuses loudly
    with pytest.raises(ValueError, match="does not resolve"):
        execute_sql(spark, cat, "SELECT * FROM table_changes('nope', 1)")
    # a VIEW has no change feed
    execute_sql(spark, cat, "CREATE VIEW sv AS SELECT k FROM sales")
    with pytest.raises(ValueError, match="does not resolve"):
        execute_sql(spark, cat, "SELECT * FROM table_changes('sv', 1)")


def test_explain_statement_returns_plan_rows(spark, cat):
    df = execute_sql(
        spark, cat, "EXPLAIN SELECT grp, sum(v) AS t FROM sales GROUP BY grp"
    )
    plan = df.first().plan
    assert "Physical Plan" in plan or "AdaptiveSparkPlan" in plan
    df2 = execute_sql(spark, cat, "EXPLAIN EXTENDED SELECT k FROM sales")
    assert "Analyzed Logical Plan" in df2.first().plan


def test_show_create_table_round_trips(spark, cat, tmp_path):
    """SHOW CREATE TABLE emits exactly the DDL this engine's own
    CREATE TABLE (col defs) grammar parses back — markers included."""
    execute_sql(
        spark, cat,
        "CREATE TABLE typed (k int NOT NULL, label string DEFAULT 'n/a', "
        "v double) PARTITIONED BY (k)",
    )
    stmt = execute_sql(spark, cat, "SHOW CREATE TABLE typed").first().createtab_stmt
    assert stmt == (
        "CREATE TABLE `typed` (k int NOT NULL, label string DEFAULT 'n/a', "
        "v double) PARTITIONED BY (k)"
    )
    # round trip: replay the emitted DDL into a fresh catalog
    cat2 = TransactionalCatalog(str(tmp_path / "rt"))
    execute_sql(spark, cat2, stmt)
    man = cat2.table("typed")._read_manifest(1)
    assert man["constraints"] == {"not_null_k": "k IS NOT NULL"}
    assert man["defaults"] == {"label": "n/a"}
    assert man["partition_by"] == ["k"]


def test_view_pushdown_prunes_base_files(spark, tmp_path):
    """Round 14 (VERDICT r13 Missing #1): a narrow WHERE over a
    catalog view of a range-clustered table plans the BASE read
    through snapshot_where — kept < candidates in last_planning,
    results hash-identical to the unpruned route."""
    from etl_job_spark.sql import _routed_select, _view_resolver
    from etl_job_spark.table import ManifestTable

    held = ManifestTable(str(tmp_path / "fact"))
    df = spark.range(0, 8000).selectExpr(
        "id as k", "id % 7 as g", "id * 2.0 as v"
    )
    held.overwrite(df.repartitionByRange(8, "k"))

    bodies = {
        "vw": "SELECT k, v FROM fact WHERE g = 3",
        "vw_star": "SELECT * FROM fact",
        "vw_join": "SELECT a.k FROM fact a JOIN fact b ON a.k = b.k",
    }
    resolve = _view_resolver(
        spark, lambda n: held if n == "fact" else None, bodies.get
    )

    # body WHERE composes with the outer conjunction
    out = _routed_select(
        spark, "SELECT k, v FROM vw WHERE k BETWEEN 100 AND 200", resolve
    )
    rows = sorted((r.k, r.v) for r in out.collect())
    lp = held.last_planning
    assert lp is not None and lp["kept"] < lp["candidates"], lp
    assert rows == sorted(
        (i, i * 2.0) for i in range(100, 201) if i % 7 == 3
    )

    # SELECT * body + OR-disjunction outer → DNF skipping on the base
    out2 = _routed_select(
        spark, "SELECT k FROM vw_star WHERE k < 50 OR k >= 7950", resolve
    )
    assert sorted(r.k for r in out2.collect()) == (
        list(range(0, 50)) + list(range(7950, 8000))
    )
    assert held.last_planning["kept"] < held.last_planning["candidates"]

    # alias-qualified outer WHERE composes too
    out3 = _routed_select(
        spark, "SELECT s.k FROM vw s WHERE s.k BETWEEN 10 AND 20", resolve
    )
    assert sorted(r.k for r in out3.collect()) == [
        i for i in range(10, 21) if i % 7 == 3
    ]
    assert held.last_planning["kept"] < held.last_planning["candidates"]

    # a join-body view falls back to the plain route, results correct
    held.last_planning = None
    out4 = _routed_select(
        spark, "SELECT k FROM vw_join WHERE k = 77", resolve
    )
    assert [r.k for r in out4.collect()] == [77]

    # a BACKTICKED body table name (scratch basenames carry hyphens)
    # resolves through the restored span and still prunes
    bt_resolve = _view_resolver(
        spark,
        lambda n: held if n == "fact" else None,
        lambda n: "SELECT k, v FROM `fact`" if n == "vw_bt" else None,
    )
    held.last_planning = None
    out5 = _routed_select(
        spark, "SELECT k FROM vw_bt WHERE k BETWEEN 5 AND 9", bt_resolve
    )
    assert sorted(r.k for r in out5.collect()) == [5, 6, 7, 8, 9]
    assert held.last_planning["kept"] < held.last_planning["candidates"]


def test_view_pushdown_through_catalog_sql(spark, tmp_path):
    """End to end on the one surface: CREATE VIEW then a pruned SELECT
    through execute_sql — hash-identical to reading the base table."""
    from etl_job_spark.sql import execute_sql
    from etl_job_spark.txn import TransactionalCatalog

    cat = TransactionalCatalog(str(tmp_path / "cat"))
    t = cat.table("sales")
    t.overwrite(
        spark.range(0, 4000)
        .selectExpr("id as sale_id", "date_add('2024-01-01', cast(id % 365 as int)) as sale_date", "id * 1.5 as amt")
        .repartitionByRange(8, "sale_date")
    )
    execute_sql(
        spark, cat,
        "CREATE VIEW recent AS SELECT sale_id, sale_date, amt FROM sales",
    )
    got = execute_sql(
        spark, cat,
        "SELECT sale_id, amt FROM recent "
        "WHERE sale_date BETWEEN '2024-02-01' AND '2024-02-07'",
    )
    base = execute_sql(
        spark, cat,
        "SELECT sale_id, amt FROM sales "
        "WHERE sale_date BETWEEN '2024-02-01' AND '2024-02-07'",
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, base.collect())
    )
    assert got.count() > 0
