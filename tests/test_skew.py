"""salted_join equivalence: salting is a physical rewrite — results
must match the plain join exactly, including on heavily skewed keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_job_spark.operators.skew import salted_join


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_salted_join_equivalence_on_skew(spark):
    # 90% of fact rows share one hot key — the head-office shape
    fact = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 != 0, F.lit("HOT")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 50).cast("string"))
        ).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.createDataFrame(
        [("HOT", "hot-dim")] + [(f"k{i}", f"d{i}") for i in range(50)], "k string, d string"
    )
    plain = fact.join(dim, "k", "inner").select("k", "v", "d")
    salted = salted_join(fact, dim, ["k"], "inner", salt=8).select("k", "v", "d")
    assert _rows(plain) == _rows(salted)


def test_salted_left_join_keeps_unmatched(spark):
    fact = spark.createDataFrame([("a", 1), ("a", 2), ("zz", 3)], "k string, v int")
    dim = spark.createDataFrame([("a", "x")], "k string, d string")
    plain = fact.join(dim, "k", "left").select("k", "v", "d")
    salted = salted_join(fact, dim, ["k"], "left", salt=4).select("k", "v", "d")
    assert _rows(plain) == _rows(salted)


def test_salted_anti_join_equivalence(spark):
    fact = spark.createDataFrame([("a", 1), ("b", 2), ("zz", 3)], "k string, v int")
    dim = spark.createDataFrame([("a", "x"), ("b", "y")], "k string, d string")
    plain = fact.join(dim, "k", "left_anti").select("k", "v")
    salted = salted_join(fact, dim, ["k"], "left_anti", salt=4).select("k", "v")
    assert _rows(plain) == _rows(salted)


def test_salted_join_rejects_outer_preserving_other_side(spark):
    """right/full outer would emit unmatched dim rows once per salt
    replica — salted_join must refuse rather than silently duplicate."""
    import pytest

    fact = spark.createDataFrame([("a", 1)], "k string, v int")
    dim = spark.createDataFrame([("a", "x"), ("lonely", "y")], "k string, d string")
    for how in ("right", "right_outer", "full", "full_outer", "outer", "cross"):
        with pytest.raises(ValueError, match="not equivalence-safe"):
            salted_join(fact, dim, ["k"], how, salt=4)
