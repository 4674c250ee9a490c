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


# ---------------------------------------------------------------------
# round-10: clause-merge semantics vs a brute-force Python model —
# matched UPDATE (plain/gated), CDC delete, column-list insert, and
# the by-source clauses, over arbitrary batches
# ---------------------------------------------------------------------

clause_row_st = st.tuples(
    st.integers(0, 6),                      # key
    st.integers(-100, 100),                 # v
    st.integers(-100, 100),                 # w
    st.booleans(),                          # _del flag
)
clause_batch_st = st.lists(clause_row_st, min_size=0, max_size=10)


def _model_merge(target_rows, source_rows, gate, nmbs_delete):
    """Brute-force Python model of merge_clauses(update_cols=["v"],
    delete_pred="_del", update_pred=gate, insert_cols=["k","v"],
    not_matched_by_source_delete=nmbs_delete) with a key-unique,
    per-key-single-branch source."""
    tgt = {k: (v, w) for k, v, w in target_rows}
    src = {k: (v, w, d) for k, v, w, d in source_rows}
    out = {}
    for k, (v, w) in tgt.items():
        s = src.get(k)
        if s is None:
            if not nmbs_delete:
                out[k] = (v, w)
            continue
        sv, sw, sd = s
        if sd:
            continue  # matched CDC delete
        out[k] = (sv if gate(v, sv) else v, w)  # gated UPDATE SET v
    for k, (sv, sw, sd) in src.items():
        if k not in tgt and not sd:
            out[k] = (sv, None)  # column-list insert: w lands NULL
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(target=clause_batch_st, source=clause_batch_st, nmbs=st.booleans())
def test_merge_clauses_model_equivalence(spark, target, source, nmbs):
    from etl_job_spark.operators.merge import merge_clauses

    tgt_rows = list({k: (k, v, w) for k, v, w, _ in target}.values())
    # per-key-unique source (the no-order_col contract)
    src_rows = list({k: (k, v, w, d) for k, v, w, d in source}.values())
    tgt = spark.createDataFrame(tgt_rows, "k int, v int, w int") if tgt_rows \
        else spark.createDataFrame([], "k int, v int, w int")
    src = spark.createDataFrame(src_rows, "k int, v int, w int, _del boolean") \
        if src_rows else spark.createDataFrame([], "k int, v int, w int, _del boolean")

    out = merge_clauses(
        tgt, src, ["k"],
        update_cols=["v"],
        delete_pred="_del",
        update_pred="source.v > v",
        insert_cols=["k", "v"],
        not_matched_by_source_delete=nmbs,
    ).collect()
    got = {r.k: (r.v, r.w) for r in out}
    want = _model_merge(
        [(k, v, w) for k, v, w in tgt_rows],
        [(k, v, w, d) for k, v, w, d in src_rows],
        gate=lambda tv, sv: sv > tv,
        nmbs_delete=nmbs,
    )
    assert got == want


# ---------------------------------------------------------------------
# round-11: the gated insert (WHEN NOT MATCHED AND cond THEN INSERT)
# and Delta delete scope, against the same brute-force model style
# ---------------------------------------------------------------------


def _model_merge_r11(target_rows, source_rows, ins_gate, delta_scope):
    """Model of merge_clauses(update_cols=["v"], delete_pred="_del",
    insert_pred=ins_gate, delete_scope=...) with a key-unique,
    per-key-single-branch source and whole-row inserts."""
    tgt = {k: (v, w) for k, v, w in target_rows}
    src = {k: (v, w, d) for k, v, w, d in source_rows}
    out = {}
    for k, (v, w) in tgt.items():
        s = src.get(k)
        if s is None:
            out[k] = (v, w)
            continue
        sv, sw, sd = s
        if sd:
            continue  # matched delete (same in both scopes)
        out[k] = (sv, w)  # UPDATE SET v
    for k, (sv, sw, sd) in src.items():
        if k in tgt:
            continue
        if sd and not delta_scope:
            continue  # CDC: a flagged row never inserts
        if ins_gate(sv):
            out[k] = (sv, sw)
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(target=clause_batch_st, source=clause_batch_st, delta=st.booleans())
def test_merge_clauses_gated_insert_model(spark, target, source, delta):
    from etl_job_spark.operators.merge import merge_clauses

    tgt_rows = list({k: (k, v, w) for k, v, w, _ in target}.values())
    src_rows = list({k: (k, v, w, d) for k, v, w, d in source}.values())
    tgt = spark.createDataFrame(tgt_rows, "k int, v int, w int") if tgt_rows \
        else spark.createDataFrame([], "k int, v int, w int")
    src = spark.createDataFrame(src_rows, "k int, v int, w int, _del boolean") \
        if src_rows else spark.createDataFrame([], "k int, v int, w int, _del boolean")

    out = merge_clauses(
        tgt, src, ["k"],
        update_cols=["v"],
        delete_pred="_del",
        insert_pred="v >= 0",
        delete_scope="matched" if delta else "source",
    ).collect()
    got = {r.k: (r.v, r.w) for r in out}
    want = _model_merge_r11(
        [(k, v, w) for k, v, w in tgt_rows],
        [(k, v, w, d) for k, v, w, d in src_rows],
        ins_gate=lambda sv: sv >= 0,
        delta_scope=delta,
    )
    assert got == want
