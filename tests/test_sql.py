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
