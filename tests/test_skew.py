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
