"""JDBC source/sink against embedded Derby (the jar ships with Spark).

Pins the three behaviors the reference's MySQL boundary needs:
round-trip fidelity, predicate pushdown into the JDBCRelation scan,
range-partitioned parallel reads, and the staged server-side MERGE
replacing the per-row exists-probe/UPDATE/INSERT loop.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from etl_job_spark.sources import jdbc

COLTYPES = "sp_code VARCHAR(16), sale_date VARCHAR(8), amt DOUBLE"


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    return jdbc.derby_embedded(str(tmp_path_factory.mktemp("derby") / "db"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "sp_code string, sale_date string, amt double")


def _sorted(df):
    return sorted(tuple(r) for r in df.select("sp_code", "sale_date", "amt").collect())


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_roundtrip_and_pushdown(spark, cfg):
    rows = [("s1", "20240101", 10.0), ("s1", "20240102", 20.0), ("s2", "20240101", 30.0)]
    jdbc.write_table(_df(spark, rows), cfg, "sales", mode="overwrite", column_types=COLTYPES)
    back = jdbc.read_table(spark, cfg, "sales")
    assert _sorted(back) == sorted(rows)

    filtered = back.filter(
        (F.col("sp_code") == "s1") & (F.col("sale_date") >= "20240102")
    ).select("amt")
    plan = _explain(filtered)
    assert "JDBCRelation" in plan
    # both predicates reach the database, and only `amt` + filter cols
    # are in ReadSchema — the daily extract reads a day, not the table
    assert "PushedFilters" in plan and "sp_code" in plan.split("PushedFilters", 1)[1]
    assert [r.amt for r in filtered.collect()] == [20.0]


def test_partitioned_read_with_auto_bounds(spark, cfg):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).cast("double").alias("v")
    )
    jdbc.write_table(df, cfg, "big", mode="overwrite")
    got = jdbc.read_table(spark, cfg, "big", partition_column="k", num_partitions=4)
    assert got.rdd.getNumPartitions() == 4
    agg = got.agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").cast("long").alias("s")
    ).collect()[0]
    assert (agg.n, agg.s) == (1000, 999 * 1000)


def test_predicates_read_one_partition_per_clause(spark, cfg):
    rows = [("s1", "20240101", 1.0), ("s1", "20240102", 2.0), ("s1", "20240103", 3.0)]
    jdbc.write_table(_df(spark, rows), cfg, "sales_p", mode="overwrite", column_types=COLTYPES)
    got = jdbc.read_table(
        spark,
        cfg,
        "sales_p",
        predicates=['"sale_date" = \'20240101\'', '"sale_date" = \'20240102\''],
    )
    assert got.rdd.getNumPartitions() == 2
    assert _sorted(got) == sorted(rows[:2])


def test_merge_upsert_jdbc_update_insert_lww(spark, cfg):
    target = [("s1", "20240101", 1.0), ("s2", "20240101", 2.0)]
    jdbc.write_table(_df(spark, target), cfg, "mart", mode="overwrite", column_types=COLTYPES)

    source = spark.createDataFrame(
        [
            ("s1", "20240101", 50.0, 1),  # update (overridden by seq 2)
            ("s1", "20240101", 100.0, 2),  # update (wins)
            ("s3", "20240101", 30.0, 1),  # insert
        ],
        "sp_code string, sale_date string, amt double, seq int",
    )
    jdbc.merge_upsert_jdbc(
        spark,
        cfg,
        "mart",
        source,
        keys=["sp_code", "sale_date"],
        order_col="seq",
        column_types=COLTYPES,
    )
    assert _sorted(jdbc.read_table(spark, cfg, "mart")) == [
        ("s1", "20240101", 100.0),
        ("s2", "20240101", 2.0),
        ("s3", "20240101", 30.0),
    ]
    # idempotency: re-merging the same batch changes nothing
    jdbc.merge_upsert_jdbc(
        spark, cfg, "mart", source, keys=["sp_code", "sale_date"], order_col="seq"
    )
    assert _sorted(jdbc.read_table(spark, cfg, "mart")) == [
        ("s1", "20240101", 100.0),
        ("s2", "20240101", 2.0),
        ("s3", "20240101", 30.0),
    ]


def test_read_query_pushes_aggregate(spark, cfg):
    jdbc.write_table(
        _df(spark, [("s1", "d", 1.0), ("s1", "d2", 2.0)]),
        cfg,
        "aggsrc",
        mode="overwrite",
        column_types=COLTYPES,
    )
    row = jdbc.read_query(
        spark,
        cfg,
        'SELECT "sp_code", SUM("amt") AS "total" FROM aggsrc GROUP BY "sp_code"',
    ).collect()
    assert [(r[0], float(r[1])) for r in row] == [("s1", 3.0)]
