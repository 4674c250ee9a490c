"""Exact substring (span) deduplication — Lee et al. 2022 semantics.

Position-coverage contract: a token position is REMOVED iff some
k-token window covering it occurs more than once in the corpus
(within-document repeats count); everything else reassembles in
original order. The registered query's DuckDB oracle replays the same
semantics relationally; these tests pin the engine's interval-merge
reassembly on adversarial shapes the corpus fixture can't guarantee:
overlapping spans, within-document repeats, full-document erasure,
short documents, and the reconstruction invariant.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_job_spark.operators.dedup import positional_shingles, remove_duplicate_spans

K = 8


def _run(spark, rows, k=K):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = remove_duplicate_spans(df, k=k)
    return {r.doc_id: r for r in out.collect()}


def test_cross_document_span_removed_overlap_merges(spark):
    # doc 2 embeds doc 1's tokens a..j shifted by one: windows a..h and
    # b..i are each duplicated; their coverage [0,8) ∪ [1,9) must MERGE
    # to [0,9), leaving exactly the uncovered tail/edges.
    got = _run(
        spark,
        [
            (1, "a b c d e f g h i j"),
            (2, "x a b c d e f g h i y"),
        ],
    )
    assert got[1].kept_text == "j" and got[1].n_removed == 9
    assert got[2].kept_text == "x y" and got[2].n_removed == 9


def test_within_document_repeat_erases_whole_doc(spark):
    # the same 8 tokens twice: both windows at start 0 and 8 are the
    # same text → duplicated → the document vanishes entirely
    got = _run(spark, [(4, "p q r s t u v w p q r s t u v w")])
    assert got[4].n_tokens == 16
    assert got[4].n_removed == 16
    assert got[4].kept_text == ""


def test_short_and_unique_docs_untouched(spark):
    got = _run(
        spark,
        [
            (3, "unique words only here none"),  # < k tokens: no windows
            (5, "k l m n o p q r s t"),  # windows exist, none duplicated
        ],
    )
    assert got[3].n_removed == 0 and got[3].kept_text == "unique words only here none"
    assert got[5].n_removed == 0 and got[5].kept_text == "k l m n o p q r s t"


def test_positional_shingles_every_window_with_repeats(spark):
    df = spark.createDataFrame([(1, "a b a b a b")], ["doc_id", "text"])
    sh = positional_shingles(df, k=2).orderBy("start").collect()
    assert [(r.start, r.g) for r in sh] == [
        (0, "a b"),
        (1, "b a"),
        (2, "a b"),
        (3, "b a"),
        (4, "a b"),
    ]


def test_reconstruction_invariant(spark):
    # n_tokens == n_removed + tokens(kept_text) on every row, and kept
    # tokens are a subsequence of the original (order preserved)
    rows = [
        (1, "a b c d e f g h i j"),
        (2, "x a b c d e f g h i y"),
        (4, "p q r s t u v w p q r s t u v w"),
        (6, "m n o p q r s t u v a b c d e f g h w z"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = remove_duplicate_spans(df, k=K)
    bad = out.filter(
        F.col("n_tokens")
        != F.col("n_removed")
        + F.when(F.col("kept_text") == "", 0).otherwise(
            F.size(F.split("kept_text", r"\s+"))
        )
    )
    assert bad.count() == 0
    originals = {r[0]: r[1].split() for r in rows}
    for r in out.collect():
        kept = r.kept_text.split()
        it = iter(originals[r.doc_id])
        assert all(tok in it for tok in kept), (r.doc_id, kept)


def test_small_k_overlapping_coverage(spark):
    # k=2, 'a b' duplicated across docs; coverage in doc 1 is positions
    # {0,1} only — 'c' survives
    got = _run(spark, [(1, "a b c"), (2, "z a b z2")], k=2)
    assert got[1].kept_text == "c"
    assert got[2].kept_text == "z z2"
