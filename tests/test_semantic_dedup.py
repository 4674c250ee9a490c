"""SemDeDup resolution policy (similarity.semantic_dedup).

Pins the greedy min-id keep rule on controlled geometry: identical
vectors dedup to the smallest id, near-but-below-threshold vectors
survive, and different-bucket duplicates are deterministic ANN misses
(both engines agree — the registered oracle hash-checks that at SF).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_job_spark.operators.similarity import semantic_dedup


def _vecs(spark, rows):
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    return df.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("embedding")
    )


def test_identical_vectors_keep_min_id(spark):
    v = [1.0, 2.0, 3.0, 4.0]
    out = semantic_dedup(_vecs(spark, [(7, v), (3, v), (9, v)]), 0.95)
    got = {r.vec_id: r for r in out.collect()}
    assert got[3].kept == 1 and got[3].dedup_to == 3
    assert got[7].kept == 0 and got[7].dedup_to == 3
    assert got[9].kept == 0 and got[9].dedup_to == 3


def test_scaled_copy_is_semantic_duplicate(spark):
    # cosine is scale-invariant: 2x the vector still dedups
    out = semantic_dedup(
        _vecs(spark, [(1, [1.0, 1.0, 0.0]), (2, [2.0, 2.0, 0.0])]), 0.95
    )
    got = {r.vec_id: r for r in out.collect()}
    assert got[1].kept == 1
    assert got[2].kept == 0 and got[2].dedup_to == 1


def test_orthogonal_vectors_all_survive(spark):
    out = semantic_dedup(
        _vecs(spark, [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0]), (3, [0.0, 0.0, 1.0])]),
        0.95,
    )
    assert [r.kept for r in out.collect()] == [1, 1, 1]


def test_every_input_row_reported_once(spark):
    rows = [(i, [float(i % 3 + 1), 1.0, 0.5]) for i in range(12)]
    out = semantic_dedup(_vecs(spark, rows), 0.999)
    assert out.count() == 12
    assert out.select("vec_id").distinct().count() == 12
    # kept rows always point at themselves
    assert out.filter((F.col("kept") == 1) & (F.col("dedup_to") != F.col("vec_id"))).count() == 0
    # removed rows always point at a smaller id
    assert out.filter((F.col("kept") == 0) & (F.col("dedup_to") >= F.col("vec_id"))).count() == 0
