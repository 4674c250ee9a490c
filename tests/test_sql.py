"""SQL-interface tests: Spark SQL over the registered views must agree
with the DataFrame formulation of the same query (same engine, same
catalog — this checks the views wire to the identical data)."""

from __future__ import annotations

from etl_job_spark.plans.registry import QUERIES
from etl_job_spark.sql import run_sql

SPARK_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def _rows(df, cols):
    return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())


def test_sql_view_matches_dataframe(spark, sf_dir):
    got = run_sql(spark, sf_dir, SPARK_Q1)
    want = QUERIES["pricing_summary"](spark, sf_dir)
    cols = ["l_returnflag", "l_linestatus", "sum_qty", "count_order"]
    assert _rows(got, cols) == _rows(want, cols)


def test_sql_events_view_normalized(spark, sf_dir):
    df = run_sql(spark, sf_dir, "SELECT count(*) AS n, min(ts) AS lo FROM events")
    row = df.first()
    assert row.n > 0
    assert str(row.lo).startswith("2024-")  # nanos column arrived as timestamp


def test_execute_dml_update_and_delete(spark, tmp_path):
    """Row-level SQL DML routed to the table verbs — the reference's
    literal UPDATE statements (kicc_to_tb_sales.py:109-134) run
    verbatim against a ManifestTable."""
    from etl_job_spark.sql import execute_dml
    from etl_job_spark.table import ManifestTable

    path = str(tmp_path / "dml")
    t = ManifestTable(path)
    t.overwrite(
        spark.createDataFrame(
            [(i, i % 3, i * 10, f"s{i}") for i in range(30)],
            "k long, g long, v long, s string",
        )
    )
    # commas inside function calls, keywords inside string literals,
    # multi-assignment, nested parens in the predicate
    v = execute_dml(
        spark,
        path,
        "UPDATE tbl SET v = coalesce(v, 0) + 1, s = concat(s, ' where set')"
        " WHERE (g = 1 AND k < 20) OR k = 29;",
    )
    assert v == 2
    got = {r.k: (r.v, r.s) for r in t.snapshot(spark).collect()}
    hit = {k for k in range(30) if (k % 3 == 1 and k < 20) or k == 29}
    for k in range(30):
        want = (k * 10 + 1, f"s{k} where set") if k in hit else (k * 10, f"s{k}")
        assert got[k] == want, k
    # DELETE
    v = execute_dml(spark, t, "DELETE FROM tbl WHERE g = 0")
    assert v == 3
    assert {r.k for r in t.snapshot(spark).collect()} == {
        k for k in range(30) if k % 3 != 0
    }
    # unsupported / malformed shapes fail loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="MERGE"):
        execute_dml(spark, t, "MERGE INTO tbl USING src ON tbl.k = src.k")
    with _pytest.raises(ValueError, match="supported form"):
        execute_dml(spark, t, "UPDATE tbl SET v = 1")  # no WHERE
    with _pytest.raises(ValueError, match="col = expr"):
        execute_dml(spark, t, "UPDATE tbl SET nonsense WHERE k = 1")


def test_execute_dml_merge_into(spark, tmp_path):
    """Constrained MERGE INTO: the Delta clause surface the engine's
    merge implements, as a literal SQL statement."""
    from etl_job_spark.sql import execute_dml
    from etl_job_spark.table import ManifestTable

    path = str(tmp_path / "mi")
    t = ManifestTable(path)
    t.overwrite(
        spark.createDataFrame(
            [(1, 10, "a"), (2, 20, "b"), (3, 30, "c"), (4, 40, "d")],
            "k long, v long, s string",
        )
    )
    spark.createDataFrame(
        [(2, 99, "B", False), (3, 0, "", True), (9, 90, "new", False)],
        "k long, v long, s string, _deleted boolean",
    ).createOrReplaceTempView("changes")

    v = execute_dml(
        spark,
        path,
        """
        MERGE INTO tbl AS t USING changes AS c
        ON t.k = c.k
        WHEN MATCHED AND c._deleted THEN DELETE
        WHEN MATCHED THEN UPDATE SET t.v = c.v
        WHEN NOT MATCHED THEN INSERT *
        """,
    )
    assert v == 2
    got = {r.k: (r.v, r.s) for r in t.snapshot(spark).collect()}
    assert got == {
        1: (10, "a"),   # untouched
        2: (99, "b"),   # matched update: v only, s keeps target value
        4: (40, "d"),   # untouched
        9: (90, "new"),  # unmatched insert (whole row, _deleted dropped)
    }
    assert "_deleted" not in t.snapshot(spark).columns

    # full-sync: NOT MATCHED BY SOURCE THEN DELETE (predicated)
    spark.createDataFrame([(2,), (9,)], "k long").createOrReplaceTempView("keep")
    v = execute_dml(
        spark,
        t,
        "MERGE INTO tbl t USING keep s ON t.k = s.k "
        "WHEN NOT MATCHED BY SOURCE AND t.v < 50 THEN DELETE",
    )
    got = {r.k for r in t.snapshot(spark).collect()}
    assert got == {2, 9}  # k=1 (v=10) and k=4 (v=40) deleted, matched kept

    # refusals name the constraint
    import pytest as _pytest

    with _pytest.raises(ValueError, match="identity assignments"):
        execute_dml(spark, t, "MERGE INTO tbl t USING changes c ON t.k = c.k "
                              "WHEN MATCHED THEN UPDATE SET t.v = c.v + 1")
    with _pytest.raises(ValueError, match="same-named equi-keys"):
        execute_dml(spark, t, "MERGE INTO tbl t USING changes c ON t.k = c.v "
                              "WHEN NOT MATCHED THEN INSERT *")
    with _pytest.raises(ValueError, match="INSERT \\*"):
        execute_dml(spark, t, "MERGE INTO tbl t USING changes c ON t.k = c.k "
                              "WHEN NOT MATCHED THEN INSERT (k) VALUES (c.k)")
    with _pytest.raises(ValueError, match="WHEN clause"):
        execute_dml(spark, t, "MERGE INTO tbl t USING changes c ON t.k = c.k")
