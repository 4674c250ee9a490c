"""Sketch-aggregate accuracy bounds: the guarantee a sketch gives is a
relative-error envelope vs the exact answer — test exactly that."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_job_spark.functions.sketches import approx_distinct, approx_quantiles
from etl_job_spark.plans.registry import ORACLE, QUERIES
from etl_job_spark.sources import load_table


def test_hll_within_rsd(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        approx_distinct("l_orderkey", rsd=0.05).alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.15  # 3×rsd envelope


def test_quantile_sketch_brackets_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents")
    )
    approx = li.agg(approx_quantiles("cents", [0.5]).alias("q")).first().q[0]
    exact = li.agg(F.expr("percentile(cents, 0.5)").alias("q")).first().q
    assert abs(approx - exact) / exact < 0.02


def test_sketch_query_registered_rows_only():
    assert "sketch_cardinalities" in QUERIES
    assert "sketch_cardinalities" not in ORACLE  # rows-only by design


def test_sketch_query_runs(spark, sf_dir):
    row = QUERIES["sketch_cardinalities"](spark, sf_dir).first()
    assert row.orders_rel_err < 0.15 and row.parts_rel_err < 0.15
