"""Training-mix sampling: the stability invariants that make hash-based
selection the right tool (and RNG sampling the wrong one)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_job_spark.operators.sampling import cap_per_group, deterministic_split


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("source"),
    )


def test_split_stable_under_growth_and_partitioning(spark):
    """A document's split depends only on its id: growing the corpus
    or repartitioning never moves existing assignments."""
    small = deterministic_split(_docs(spark, 100), "doc_id")
    big = deterministic_split(_docs(spark, 1000).repartition(13), "doc_id")
    s = {r.doc_id: r.split for r in small.collect()}
    b = {r.doc_id: r.split for r in big.collect()}
    assert all(b[k] == v for k, v in s.items())


def test_split_proportions_and_validation(spark):
    out = deterministic_split(_docs(spark, 1000), "doc_id", {"train": 80, "val": 20})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val"}
    assert 700 <= counts["train"] <= 880  # ~80% of 1000, hash-uniform
    with pytest.raises(ValueError, match="sum to 100"):
        deterministic_split(_docs(spark), "doc_id", {"train": 50})


def test_cap_per_group_bounds_and_determinism(spark):
    docs = _docs(spark, 500)  # ~71 docs per source
    capped = cap_per_group(docs, ["source"], 20)
    per = {r.source: r.n for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert all(n == 20 for n in per.values())
    # under-cap groups pass through whole
    assert cap_per_group(_docs(spark, 10), ["source"], 20).count() == 10
    # deterministic across partitionings
    a = sorted(r.doc_id for r in capped.collect())
    b = sorted(r.doc_id for r in cap_per_group(docs.repartition(17), ["source"], 20).collect())
    assert a == b
    # selection is hash-ordered, not the K smallest ids
    assert a != sorted(r.doc_id for r in docs.orderBy("doc_id").limit(140).collect())
