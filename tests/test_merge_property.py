"""Hypothesis property tests for merge_upsert (SURVEY.md §5 item 3):
for arbitrary batches, merging twice ≡ merging once (idempotency), and
the merged table's key set is the union of target and source keys."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_job_spark.operators.merge import merge_upsert

KEYS = ["k1", "k2"]
key_st = st.tuples(st.integers(0, 5), st.sampled_from(["a", "b", "c"]))
row_st = st.tuples(key_st, st.integers(-1000, 1000))
batch_st = st.lists(row_st, min_size=0, max_size=12)


def _df(spark, rows, with_seq=False):
    data = [
        (k[0], k[1], v, i) if with_seq else (k[0], k[1], v)
        for i, (k, v) in enumerate(rows)
    ]
    schema = "k1 int, k2 string, v int" + (", seq int" if with_seq else "")
    return spark.createDataFrame(data, schema) if data else spark.createDataFrame([], schema)


def _rows(df):
    return sorted(tuple(r) for r in df.select("k1", "k2", "v").collect())


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(target=batch_st, source=batch_st)
def test_merge_idempotent_and_key_union(spark, target, source):
    # target must be key-unique (it's a table); last writer wins there too
    tgt = _df(spark, {k: (k, v) for k, v in target}.values())
    src = _df(spark, source, with_seq=True)

    once = merge_upsert(tgt, src, KEYS, order_col="seq")
    twice = merge_upsert(once, src, KEYS, order_col="seq")
    assert _rows(once) == _rows(twice)

    got_keys = {(r.k1, r.k2) for r in once.select("k1", "k2").collect()}
    want_keys = {k for k, _ in target} | {k for k, _ in source}
    assert got_keys == want_keys

    # last-writer-wins: every source key carries its LAST batch value
    last = {}
    for k, v in source:
        last[k] = v
    vals = {(r.k1, r.k2): r.v for r in once.collect()}
    for k, v in last.items():
        assert vals[k] == v
