"""Context-window chunking (text.chunk_documents)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_job_spark.operators.text import chunk_documents


def _doc(spark, text):
    return spark.createDataFrame([(1, text)], ["doc_id", "text"])


def test_short_doc_is_one_chunk(spark):
    out = chunk_documents(_doc(spark, "a b c"), max_tokens=8, overlap=2).collect()
    assert len(out) == 1
    assert out[0].chunk_id == 0 and out[0].n_chunk_tokens == 3 and out[0].chunk == "a b c"


def test_windows_overlap_and_cover(spark):
    toks = [f"t{i}" for i in range(10)]
    out = sorted(
        chunk_documents(_doc(spark, " ".join(toks)), max_tokens=4, overlap=1).collect(),
        key=lambda r: r.chunk_id,
    )
    # step 3: starts 0,3,6,9 — ceil((10-4)/3)+1 = 3 windows? (10-4+2)//3=2 → ids 0..2...
    chunks = [r.chunk.split(" ") for r in out]
    # each window starts step tokens after the previous and repeats one token
    for a, b in zip(chunks, chunks[1:]):
        assert b[0] == a[3]  # overlap of 1: next window starts at the last token
    # full coverage in order
    merged = chunks[0] + [t for c in chunks[1:] for t in c[1:]]
    assert merged == toks
    assert all(r.n_chunk_tokens == len(r.chunk.split(" ")) for r in out)


def test_exact_multiple_boundary(spark):
    # n == max_tokens: exactly one window, no empty trailing chunk
    toks = " ".join(f"t{i}" for i in range(6))
    out = chunk_documents(_doc(spark, toks), max_tokens=6, overlap=2).collect()
    assert len(out) == 1 and out[0].chunk == toks


def test_overlap_must_be_smaller(spark):
    with pytest.raises(ValueError):
        chunk_documents(_doc(spark, "a b"), max_tokens=4, overlap=4)


def test_no_shuffle_plan(spark):
    df = chunk_documents(_doc(spark, "a b c d e f g"), max_tokens=4, overlap=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # chunking is within-row
