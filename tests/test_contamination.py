"""Unit tests for benchmark decontamination, repetition scores, and
the shard-packing / source-mixture operators (oracle parity for the
registered queries lives in tests/test_oracle_diff.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etl_job_spark.operators.contamination import contamination_hits, decontaminate
from etl_job_spark.operators.dedup import shingles
from etl_job_spark.operators.packing import mix_to_token_budget, pack_token_shards
from etl_job_spark.operators.text import repetition_scores


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_flags_exactly_the_leaked_docs(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "one two three four five six seven eight nine ten"),
            # doc 3 contains doc 1's tokens 2..9 as a contiguous span
            (3, "pre beta gamma delta epsilon zeta eta theta iota post"),
        ],
    )
    bench = spark.createDataFrame(
        [(100, "beta gamma delta epsilon zeta eta theta iota")],
        "bench_id long, text string",
    )
    hits = {r["doc_id"]: r for r in contamination_hits(docs, bench, k=8).collect()}
    assert set(hits) == {1, 3}
    assert hits[1]["n_hit_ngrams"] == 1 and hits[1]["n_bench_items"] == 1
    assert hits[3]["n_hit_ngrams"] == 1

    clean = decontaminate(docs, bench, k=8)
    assert sorted(r["doc_id"] for r in clean.collect()) == [2]


def test_shingles_short_doc_yields_no_rows_not_an_error(spark):
    # regression: sequence(1, 0) in Spark is DESCENDING [1, 0] — the
    # pre-guard expression fed element_at an index 0 and crashed on
    # any document shorter than k tokens
    docs = _docs(spark, [(1, "only three tokens"), (2, "a b c d e f g h")])
    out = shingles(docs, k=8).collect()
    assert [r["doc_id"] for r in out] == [2]
    assert out[0]["shingle"] == "a b c d e f g h"


def test_repetition_scores_flag_degenerate_doc(spark):
    docs = _docs(
        spark,
        [
            (1, "spam spam spam spam spam spam"),
            (2, "all tokens here are fully distinct words"),
        ],
    )
    rows = {r["doc_id"]: r for r in repetition_scores(docs).collect()}
    assert rows[1]["repetitive"] == 1
    assert rows[1]["dup_2gram_frac"] == pytest.approx(4 / 5)
    assert rows[1]["top_2gram_frac"] == 1.0
    assert rows[2]["repetitive"] == 0
    assert rows[2]["dup_2gram_frac"] == 0.0


def test_pack_token_shards_matches_global_window_any_partitioning(spark):
    from pyspark.sql import Window

    # ids deliberately sparse/unsorted; weights vary
    rows = [(i * 7 + (i % 3), (i * 37) % 90 + 10) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w long")
    budget = 500
    got = pack_token_shards(df.repartition(13), "w", "id", budget)
    naive = df.withColumn(
        "shard_id",
        F.expr(f"(sum(w) over (order by id rows unbounded preceding) - w) div {budget}"),
    )
    assert sorted(map(tuple, got.select("id", "w", "shard_id").collect())) == sorted(
        map(tuple, naive.select("id", "w", "shard_id").collect())
    )
    # shards are contiguous runs of the order column
    by_id = sorted(map(tuple, got.select("id", "shard_id").collect()))
    shard_seq = [s for _, s in by_id]
    assert shard_seq == sorted(shard_seq)


def test_pack_token_shards_empty_and_bad_budget(spark):
    df = spark.createDataFrame([], "id long, w long")
    assert pack_token_shards(df, "w", "id", 100).count() == 0
    with pytest.raises(ValueError):
        pack_token_shards(df, "w", "id", 0)


def test_mix_membership_is_a_row_property(spark):
    rows = [(i, f"s{i % 4}", 10 + i % 7, 1 + i % 3) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long, wt int")
    kept = set(
        r["doc_id"]
        for r in mix_to_token_budget(
            df, "source", "wt", "n_tok", "__total_tok div 2"
        ).collect()
    )
    # repartitioning never moves membership
    kept2 = set(
        r["doc_id"]
        for r in mix_to_token_budget(
            df.repartition(17), "source", "wt", "n_tok", "__total_tok div 2"
        ).collect()
    )
    assert kept == kept2
    # every source is downsampled, none dropped entirely
    srcs = {f"s{i}" for i in range(4)}
    kept_srcs = {f"s{d % 4}" for d in kept}
    assert kept_srcs == srcs
    assert 0 < len(kept) < 400

def test_repetition_top2gram_linear_on_degenerate_doc(spark):
    """The top-2-gram share must be computed in O(n log n) per document
    (sort + longest-equal-run), not O(|distinct| x n): a planted
    50k-token document with ~25k distinct 2-grams must finish within a
    small factor of a short doc, and the values must stay exact."""
    import time

    # worst case for the old quadratic form: a long cycle = many
    # distinct 2-grams, each scanned against the full array
    cycle = " ".join(f"w{i % 12500} w{(i * 7) % 12500}" for i in range(25_000))
    docs = _docs(spark, [(1, cycle), (2, "spam spam spam spam")])
    t0 = time.monotonic()
    rows = {r["doc_id"]: r for r in repetition_scores(docs).collect()}
    elapsed = time.monotonic() - t0
    assert elapsed < 60, f"degenerate doc took {elapsed:.1f}s - quadratic regression?"
    # short doc: 3 identical 2-grams out of 3 -> top share 1.0
    assert rows[2]["top_2gram_frac"] == 1.0
    # planted doc: brute-force the expected max 2-gram frequency in python
    toks = cycle.split()
    from collections import Counter

    g2 = Counter(" ".join(toks[i : i + 2]) for i in range(len(toks) - 1))
    expect = max(g2.values()) / (len(toks) - 1)
    assert rows[1]["top_2gram_frac"] == pytest.approx(expect, abs=1e-6)


def test_remove_repeated_lines_semantics(spark):
    from etl_job_spark.operators.text import remove_repeated_lines

    banner = "click here to subscribe"
    rows = [
        (1, f"unique one\n{banner}\nunique two"),
        (2, f"{banner}\nreal content"),
        (3, banner),  # pure boilerplate: the whole document drops
        (4, f"dup line\ndup line\n{banner}"),  # within-doc dup stays
        (5, f"{banner}\ntail text"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text"] for r in
           remove_repeated_lines(docs, min_docs=4).collect()}
    assert out == {
        1: "unique one\nunique two",
        2: "real content",
        4: "dup line\ndup line",
        5: "tail text",
    }
