"""Hot-shingle fan-out cap (VERDICT r1 "What's wrong" #2).

A boilerplate shingle shared by F documents contributes F·(F−1)/2
candidate pairs to the all-pairs self-join while carrying no near-dup
signal. ``max_shingle_freq`` must bound that fan-out, and — because the
registered query mirrors the cap in its oracle SQL — must not change
results when every shingle is under the cap.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_job_spark.operators import dedup


def _corpus(spark, n_hot: int = 40):
    """n_hot docs sharing one boilerplate sentence + 2 true near-dups.

    Every hot doc is 'unsubscribe from this mailing list here <uniq>':
    all trigrams except the doc-unique tail are shared by all n_hot.
    """
    hot = [
        (i, f"unsubscribe from this mailing list here token{i} tail{i} x{i} y{i}")
        for i in range(n_hot)
    ]
    dup = [
        (1000, "the quick brown fox jumps over the lazy dog today"),
        (1001, "the quick brown fox jumps over the lazy dog tonight"),
    ]
    return spark.createDataFrame(hot + dup, ["doc_id", "text"])


def test_cap_bounds_candidate_fanout(spark):
    sh = dedup.shingles(_corpus(spark)).persist()
    try:
        uncapped = dedup.jaccard_pairs(sh, threshold=0.0)
        capped = dedup.jaccard_pairs(sh, threshold=0.0, max_shingle_freq=8)
        n_un, n_cap = uncapped.count(), capped.count()
        # uncapped: every hot pair is a candidate → quadratic in n_hot
        assert n_un >= 40 * 39 // 2
        # capped: boilerplate shingles (freq 40 > 8) are dropped, so hot
        # docs never pair with each other; only the true near-dups pair
        assert n_cap < 40
        pairs = {(r.doc_a, r.doc_b) for r in capped.collect()}
        assert (1000, 1001) in pairs
    finally:
        sh.unpersist()


def test_cap_above_max_freq_is_identity(spark):
    sh = dedup.shingles(_corpus(spark, n_hot=5)).persist()
    try:
        base = dedup.jaccard_pairs(sh, threshold=0.3)
        capped = dedup.jaccard_pairs(sh, threshold=0.3, max_shingle_freq=1000)
        b = {(r.doc_a, r.doc_b, round(r.jaccard, 9)) for r in base.collect()}
        c = {(r.doc_a, r.doc_b, round(r.jaccard, 9)) for r in capped.collect()}
        assert b == c and b
    finally:
        sh.unpersist()


def test_capped_sizes_use_capped_universe(spark):
    """Jaccard after capping is computed over surviving shingles only
    (both the engine and the oracle SQL define sizes post-filter)."""
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g i"),
        (3, "a b c z z2 z3 z4 z5"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = dedup.shingles(df)
    # 'a b c' appears in all 3 docs; cap at 2 removes it everywhere
    got = dedup.jaccard_pairs(sh, threshold=0.0, max_shingle_freq=2).collect()
    for r in got:
        assert 0.0 <= r.jaccard <= 1.0
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in got}
    # docs 1,2 share shingles 'b c d','c d e','d e f','e f g' (freq 2,
    # kept): inter=4, sizes are 5 each after dropping 'a b c' → 4/6
    assert abs(pairs[(1, 2)] - 4 / 6) < 1e-9


def test_connected_components_raises_on_nonconvergence(spark):
    """A path graph of diameter D needs ~D label rounds; exhausting
    max_iter with labels still moving must be loud, not silent."""
    import pytest

    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    path_edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["doc_a", "doc_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(nodes, path_edges, max_iter=2)
    # and with enough rounds it converges to one cluster rooted at 0
    labels = dedup.connected_components(nodes, path_edges, max_iter=n + 1)
    assert {r.cluster_id for r in labels.collect()} == {0}


def test_simhash_bits_guard():
    """The bit-parallel SimHash hashes the first 8 md5 hex chars (32
    bits); bits > 32 would index negative bit positions and emit
    garbage signatures silently. The guard fires before any plan is
    built, so no session is needed."""
    import pytest

    from etl_job_spark.operators.dedup import simhash_signatures

    with pytest.raises(ValueError, match="1..32"):
        simhash_signatures(None, bits=64)
    with pytest.raises(ValueError, match="1..32"):
        simhash_signatures(None, bits=0)
