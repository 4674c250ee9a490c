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


def test_exact_group_percentiles_matches_builtin(spark):
    """The frequency-map rewrite must equal Spark's holistic
    percentile() bit-for-bit on integer inputs — including a hot key
    holding most of the rows, ties, a single-value group, and a
    one-row group (interpolation edge: rank k+1 doesn't exist)."""
    import random

    from etl_job_spark.operators.skew import exact_group_percentiles

    rng = random.Random(7)
    rows = [("hot", rng.randint(0, 50)) for _ in range(20_000)]
    rows += [("cold", rng.randint(0, 10)) for _ in range(37)]
    rows += [("const", 5)] * 11
    rows += [("one", 42)]
    df = spark.createDataFrame(rows, "k string, v long").repartition(16)

    ps = [(0.5, "p50"), (0.9, "p90"), (0.99, "p99"), (0.0, "p0"), (1.0, "p100")]
    got = {
        r.k: (r.p50, r.p90, r.p99, r.p0, r.p100)
        for r in exact_group_percentiles(df, ["k"], "v", ps).collect()
    }
    want = {
        r.k: (r.p50, r.p90, r.p99, r.p0, r.p100)
        for r in df.groupBy("k")
        .agg(
            *[
                F.expr(f"percentile(v, {p})").alias(a)
                for p, a in ps
            ]
        )
        .collect()
    }
    assert got == want


def test_salted_collect_list_equivalent_and_two_stage(spark):
    from etl_job_spark.operators.skew import salted_collect_list

    rows = [("hot", i % 97) for i in range(5000)] + [("cold", i) for i in range(5)]
    df = spark.createDataFrame(rows, "k string, v long").repartition(8)
    got = {r.k: r.vs for r in salted_collect_list(df, ["k"], "v", salt=8).collect()}
    want = {
        r.k: sorted(r.vs)
        for r in df.groupBy("k").agg(F.collect_list("v").alias("vs")).collect()
    }
    assert got == want
