"""Large-star/small-star CC: equivalence with min-label propagation,
and logarithmic rounds on long-diameter (chain) graphs where the
propagation loop degrades linearly."""

from __future__ import annotations

import pytest

from etl_job_spark.operators import dedup


def _labels(df):
    return sorted((r.doc_id, r.cluster_id) for r in df.collect())


def _fixture(spark):
    """Two multi-doc clusters, one pair, singletons — typical dedup shape."""
    nodes = spark.createDataFrame([(i,) for i in range(20)], ["doc_id"])
    pairs = spark.createDataFrame(
        # cluster {0,1,2,3} as a triangle+tail, cluster {10,11,12}, pair {15,16}
        [(0, 1), (1, 2), (0, 2), (2, 3), (10, 11), (11, 12), (15, 16)],
        ["doc_a", "doc_b"],
    )
    return nodes, pairs


def test_star_equals_propagation_on_clusters(spark):
    nodes, pairs = _fixture(spark)
    prop = _labels(dedup.connected_components(nodes, pairs))
    star = _labels(dedup.connected_components_star(nodes, pairs))
    assert star == prop
    by_cluster = {}
    for doc, c in star:
        by_cluster.setdefault(c, []).append(doc)
    assert by_cluster[0] == [0, 1, 2, 3]
    assert by_cluster[10] == [10, 11, 12]
    assert by_cluster[15] == [15, 16]


def test_star_converges_logarithmically_on_chain(spark):
    """Diameter-64 chain: propagation needs ~64 rounds (max_iter=12
    raises); star contracts it within a handful of rounds."""
    n = 64
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    chain = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["doc_a", "doc_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(nodes, chain, max_iter=12)
    labels = dedup.connected_components_star(nodes, chain, max_rounds=12)
    assert {r.cluster_id for r in labels.collect()} == {0}
    assert labels.count() == n


def test_star_handles_reversed_and_duplicate_edges(spark):
    nodes = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    pairs = spark.createDataFrame(
        [(4, 3), (3, 4), (3, 2), (2, 3), (5, 5), (0, 1)], ["doc_a", "doc_b"]
    )
    got = _labels(dedup.connected_components_star(nodes, pairs))
    assert got == [(0, 0), (1, 0), (2, 2), (3, 2), (4, 2), (5, 5)]


def test_resolve_duplicates_keeps_min_id_and_counts(spark):
    from etl_job_spark.operators import dedup

    corpus = spark.createDataFrame(
        [("a", "xx"), ("b", "yy"), ("c", "zz"), ("d", "solo")],
        "doc_id string, text string",
    )
    clusters = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("d", "d")],
        "doc_id string, cluster_id string",
    )
    got = sorted(
        map(tuple, dedup.resolve_duplicates(corpus, clusters).collect())
    )
    # one min-id survivor per cluster, displaced count attached,
    # corpus columns carried through
    assert got == [("a", "xx", 2), ("d", "solo", 0)]
