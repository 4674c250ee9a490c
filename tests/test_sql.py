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
