"""Bigram-LM quality scoring (text.bigram_lm_scores)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_job_spark.operators.text import bigram_lm_scores


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_hand_computed_nll(spark):
    # LM corpus: "a b a b a c" → bigrams: ab, ba, ab, ba, ac
    # c(a,b)=2 c(b,a)=2 c(a,c)=1; c(a·)=3 c(b·)=2; V=3 (a,b,c)
    lm = _docs(spark, [(1, "a b a b a c")])
    out = {
        r.doc_id: r
        for r in bigram_lm_scores(_docs(spark, [(10, "a b"), (11, "z z")]), lm).collect()
    }
    exp_ab = round(-math.log(3 / 6) * 1e6)  # (2+1)/(3+3)
    assert out[10].n_bigrams == 1 and out[10].nll_micro == exp_ab
    exp_zz = round(-math.log(1 / 3) * 1e6)  # unseen: (0+1)/(0+3)
    assert out[11].n_bigrams == 1 and out[11].nll_micro == exp_zz


def test_reference_like_text_scores_lower(spark):
    lm = _docs(spark, [(i, "the cat sat on the mat and the dog ran") for i in range(3)])
    out = {
        r.doc_id: r
        for r in bigram_lm_scores(
            _docs(spark, [(10, "the cat sat on the mat"), (11, "qq ww ee rr tt yy")]), lm
        ).collect()
    }
    # per-bigram average NLL must be lower for the in-domain doc
    assert out[10].nll_micro / out[10].n_bigrams < out[11].nll_micro / out[11].n_bigrams


def test_short_docs_score_zero(spark):
    lm = _docs(spark, [(1, "a b c")])
    out = bigram_lm_scores(_docs(spark, [(10, "solo"), (11, "")]), lm).collect()
    assert sorted((r.doc_id, r.n_bigrams, r.nll_micro) for r in out) == [
        (10, 0, 0),
        (11, 0, 0),
    ]


def test_partitioning_invariance(spark):
    lm = _docs(spark, [(i, f"w{i} w{i+1} w{i+2} w{i} w{i+1}") for i in range(10)])
    docs = _docs(spark, [(100 + i, f"w{i} w{i+1} w{i+3}") for i in range(10)])
    a = sorted(map(tuple, bigram_lm_scores(docs, lm).collect()))
    b = sorted(map(tuple, bigram_lm_scores(docs.repartition(7), lm.repartition(5)).collect()))
    assert a == b
