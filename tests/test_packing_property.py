"""Hypothesis property tests for the distributed prefix-sum shard
packer and the bloom-filter primitives.

pack_token_shards claims BIT-EQUALITY with the single-task global
window at any id distribution (sparse, clustered, constant-weight)
and any input partitioning; blooms claim zero false NEGATIVES ever
(a false negative silently loses a delete) and a usable positive
rate. Both claims are exactly the kind hypothesis breaks fastest."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_job_spark.operators.packing import pack_token_shards
from etl_job_spark.table import _bloom_build, _bloom_excludes

ids_st = st.lists(
    st.integers(0, 10_000), min_size=1, max_size=60, unique=True
)
weights_st = st.lists(st.integers(0, 500), min_size=60, max_size=60)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(ids=ids_st, weights=weights_st, budget=st.integers(1, 2000), nparts=st.integers(1, 7))
def test_pack_equals_global_window(spark, ids, weights, budget, nparts):
    rows = list(zip(ids, weights))
    df = spark.createDataFrame(rows, "id long, w long")
    got = pack_token_shards(df.repartition(nparts), "w", "id", budget, n_buckets=8)
    naive = df.withColumn(
        "shard_id",
        F.expr(f"(sum(w) over (order by id rows unbounded preceding) - w) div {budget}"),
    )
    assert sorted(map(tuple, got.select("id", "w", "shard_id").collect())) == sorted(
        map(tuple, naive.collect())
    )


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ints=st.lists(st.integers(-(10**12), 10**12), min_size=0, max_size=120),
    strs=st.lists(st.text(max_size=20), min_size=0, max_size=120),
    absent=st.lists(st.integers(2 * 10**12, 3 * 10**12), min_size=1, max_size=20),
)
def test_bloom_never_false_negative(ints, strs, absent):
    ib = _bloom_build(ints, len(ints), "i")
    sb = _bloom_build(strs, len(strs), "s")
    # every present value must test possibly-present — including when
    # the caller probes an int column with an equal-valued float
    for v in ints:
        assert not _bloom_excludes(ib, [v])
        if abs(v) < 2**52:  # exactly float-representable
            assert not _bloom_excludes(ib, [float(v)])
    for v in strs:
        assert not _bloom_excludes(sb, [v])
    # excludes([vs]) is False whenever ANY value is present, and a
    # probe the bloom can't soundly canonicalize never prunes
    if ints:
        assert not _bloom_excludes(ib, list(absent) + [ints[0]])
        assert not _bloom_excludes(ib, ["not-an-int"])


def test_bloom_positive_rate_is_usable():
    # 10 bits/row sizing: absent probes on a realistic file should
    # almost always be excluded (that's the entire point)
    values = list(range(5000))
    bloom = _bloom_build(values, len(values), "i")
    misses = sum(1 for v in range(10_000_000, 10_002_000) if _bloom_excludes(bloom, [v]))
    assert misses >= 1900  # <5% false-positive rate at 2000 probes


def test_pack_materializes_input_once(spark):
    """The packer's offsets AND its returned rows must come from ONE
    materialization of the input (r5 advice: an expensive upstream ran
    twice, and a nondeterministic one silently broke the bit-equality
    claim). The accumulator counts upstream row production."""
    acc = spark.sparkContext.accumulator(0)
    base = spark.range(0, 1000).selectExpr("id", "id % 7 as w")

    def count_rows(batches):
        for b in batches:
            acc.add(len(b))
            yield b

    upstream = base.mapInPandas(count_rows, "id long, w long")
    out = pack_token_shards(upstream, "w", "id", 100, n_buckets=8)
    assert out.count() == 1000
    assert acc.value == 1000  # upstream computed exactly once


# -- snapshot_where equivalence (read-path data skipping) ---------------

import pytest as _pytest

pred_values = st.one_of(st.integers(-50, 150), st.none())


@st.composite
def _pred_specs(draw):
    preds = []
    # int probes may arrive as integral STRINGS ('07'): Spark coerces
    # them numerically, and the planner must refuse to prune on the
    # cross-type spelling (bucket('07') != bucket(7))
    k_probe = st.one_of(pred_values, st.sampled_from(["3", "07", "100"]))
    for _ in range(draw(st.integers(1, 3))):
        col = draw(st.sampled_from(["k", "g"]))
        op = draw(
            st.sampled_from(
                ["=", "in", "between", "<", "<=", ">", ">=", "is_null", "not_null"]
            )
        )
        if op in ("is_null", "not_null"):
            # both accepted spellings: value-less 2-tuple and padded
            preds.append((col, op) if draw(st.booleans()) else (col, op, None))
            continue
        if col == "g":
            v = draw(st.sampled_from(["a", "b", "zz", None]))
            if op == "in":
                v = draw(st.lists(st.sampled_from(["a", "b", "zz"]), min_size=1, max_size=3))
            elif op == "between":
                v = ("a", draw(st.sampled_from(["b", "zz"])))
        else:
            if op == "in":
                v = draw(st.lists(k_probe, min_size=1, max_size=4))
            elif op == "between":
                lo = draw(st.integers(-50, 150))
                v = (lo, lo + draw(st.integers(0, 80)))
            else:
                v = draw(k_probe)
        preds.append((col, op, v))
    return preds


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 100),
            st.one_of(st.sampled_from(["a", "b", "zz"]), st.none()),
        ),
        min_size=1,
        max_size=40,
    ),
    preds=_pred_specs(),
    layout=st.sampled_from(["clustered", "raw_partition", "bucket", "truncate"]),
)
def test_snapshot_where_equals_brute_filter(spark, tmp_path_factory, rows, preds, layout):
    """The headline read-path contract, property-tested: for ANY small
    table (nullable partition values included; clustered,
    hive-partitioned, or TRANSFORM-partitioned layout), ANY
    conjunctive predicate spec — cross-type integral-string probes
    included — the pruned read returns exactly filter()'s rows."""
    from etl_job_spark.table import ManifestTable, predicate_column

    t = ManifestTable(str(tmp_path_factory.mktemp("swprop") / "t"))
    df = spark.createDataFrame([(k, g, float(k)) for k, g in rows], "k long, g string, v double")
    if layout == "raw_partition":
        t.overwrite(df.repartition(F.col("g")), partition_by=["g"])
    elif layout == "bucket":
        t.overwrite(df, partition_by=["bucket(4, k)"])
    elif layout == "truncate":
        t.overwrite(df.repartition(F.col("g")), partition_by=["truncate(1, g)"])
    else:
        t.overwrite(df.repartitionByRange(3, "k"))
    key = lambda r: tuple((x is None, x) for x in r)  # noqa: E731
    got = sorted(map(tuple, t.snapshot_where(spark, preds).collect()), key=key)
    exp = sorted(
        map(tuple, t.snapshot(spark).filter(predicate_column(preds)).collect()),
        key=key,
    )
    assert got == exp, (preds, got, exp)
    # count_where's metadata-interior split must agree row-for-row
    assert t.count_where(spark, preds) == len(exp), preds


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 100),
            st.one_of(st.sampled_from(["a", "b", "zz"]), st.none()),
        ),
        min_size=1,
        max_size=30,
    ),
    disjuncts=st.lists(_pred_specs(), min_size=1, max_size=3),
)
def test_snapshot_where_any_of_equals_brute_or(spark, tmp_path_factory, rows, disjuncts):
    """DNF reads: for ANY set of conjunctive disjuncts, the unioned
    pruned read equals the brute OR filter."""
    from etl_job_spark.table import ManifestTable, predicate_column

    t = ManifestTable(str(tmp_path_factory.mktemp("dnfprop") / "t"))
    df = spark.createDataFrame(
        [(k, g, float(k)) for k, g in rows], "k long, g string, v double"
    )
    t.overwrite(df.repartitionByRange(3, "k"))
    key = lambda r: tuple((x is None, x) for x in r)  # noqa: E731
    got = sorted(
        map(tuple, t.snapshot_where(spark, any_of=disjuncts).collect()), key=key
    )
    pred = predicate_column(disjuncts[0])
    for s in disjuncts[1:]:
        pred = pred | predicate_column(s)
    exp = sorted(map(tuple, t.snapshot(spark).filter(pred).collect()), key=key)
    assert got == exp, (disjuncts, got, exp)
    assert t.count_where(spark, any_of=disjuncts) == len(exp), disjuncts


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 100),
            st.one_of(st.sampled_from(["a", "b", "zz"]), st.none()),
        ),
        min_size=1,
        max_size=40,
    ),
    preds=_pred_specs(),
    distributed=st.booleans(),
)
def test_snapshot_where_equals_brute_filter_after_rename(
    spark, tmp_path_factory, rows, preds, distributed
):
    """Column-mapping soundness, property-tested: after renaming every
    column, ANY conjunctive spec spoken in the NEW names prunes (at
    the driver tier or the distributed tier) to exactly filter()'s
    rows — the stats recorded under physical names must neither
    over-prune nor leak through the mapping."""
    import etl_job_spark.table as tablemod
    from etl_job_spark.table import ManifestTable, predicate_column

    t = ManifestTable(str(tmp_path_factory.mktemp("swren") / "t"))
    df = spark.createDataFrame(
        [(k, g, float(k)) for k, g in rows], "k long, g string, v double"
    )
    t.overwrite(df.repartitionByRange(3, "k"))
    t.rename_column("k", "kk")
    t.rename_column("g", "gg")
    names = dict(k="kk", g="gg")
    ren = [
        (names[p[0]], *p[1:])  # 2-tuple nullness specs keep their arity
        for p in preds
    ]
    key = lambda r: tuple((x is None, x) for x in r)  # noqa: E731
    old_thr = tablemod._SPARK_PRUNE_MIN_FILES
    tablemod._SPARK_PRUNE_MIN_FILES = 1 if distributed else old_thr
    try:
        got = sorted(map(tuple, t.snapshot_where(spark, ren).collect()), key=key)
        if distributed:
            assert t.last_planning["mode"] == "distributed"
    finally:
        tablemod._SPARK_PRUNE_MIN_FILES = old_thr
    exp = sorted(
        map(tuple, t.snapshot(spark).filter(predicate_column(ren)).collect()),
        key=key,
    )
    assert got == exp, (ren, got, exp)
