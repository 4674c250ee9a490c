"""Property tests for z-order clustering (r4 VERDICT #10).

The two pinned scenarios in test_table.py show z-ordering helps on a
friendly distribution; these drive RANDOM distributions — skewed
(pareto), constant columns, null-heavy — through both layouts and
assert the z-order contract: per-file ranges on the SECOND clustered
dimension are at least as tight (within tolerance) as lexicographic
clustering, which concentrates only the leading column. Quantile
bucketing is what makes this hold under skew — equal-width buckets
would collapse a pareto-distributed column into one bucket.

Spans are measured from the manifest's own footer-derived stats, so
the property tested is exactly the one MERGE pruning consumes.
"""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_job_spark.table import ManifestTable


def _median_span(entries, col) -> float | None:
    # median, not mean: under pareto skew one outlier file's span
    # dominates a mean and makes the z-vs-lex ratio a coin flip.
    # Entries may carry nulls-only stats ({"nulls": N}, no min/max)
    # for files where the column is entirely NULL — skip them, the
    # same guard every production min/max consumer applies.
    spans = []
    for e in entries:
        st_ = (e.get("stats") or {}).get(col)
        if st_ is not None and "min" in st_ and "max" in st_:
            spans.append(st_["max"] - st_["min"])
    return float(np.median(spans)) if spans else None


def _make_rows(rng: np.random.Generator, dist: str, n: int = 2000):
    if dist == "skewed":
        a = (rng.pareto(1.2, n) * 100).astype(int)
        b = (rng.pareto(1.2, n) * 100).astype(int)
    elif dist == "constant_first":
        a = np.zeros(n, dtype=int)
        b = rng.integers(0, 10_000, n)
    else:  # uniform / null_heavy share the uniform base
        a = rng.integers(0, 10_000, n)
        b = rng.integers(0, 10_000, n)
    rows = []
    null_p = 0.4 if dist == "null_heavy" else 0.0
    for i in range(n):
        av = None if rng.random() < null_p else int(a[i])
        bv = None if rng.random() < null_p else int(b[i])
        rows.append((av, bv, float(i)))
    return rows


def _compact_spans(spark, rows, zorder: bool):
    path = tempfile.mkdtemp(prefix="zprop_")
    try:
        t = ManifestTable(path + "/t")
        df = spark.createDataFrame(rows, "a bigint, b bigint, v double")
        t.overwrite(df.repartition(8))
        v = t.compact(
            spark, target_rows_per_file=250, cluster_by=["a", "b"], zorder=zorder
        )
        entries = t._read_manifest(v)["files"]
        total = sum(e["rows"] for e in entries)
        return _median_span(entries, "b"), total
    finally:
        shutil.rmtree(path, ignore_errors=True)


@pytest.mark.parametrize("dist", ["skewed", "constant_first", "null_heavy", "uniform"])
@given(seed=st.integers(min_value=0, max_value=2**32 - 1))
@settings(
    max_examples=2,
    deadline=None,
    derandomize=True,  # the strict z-vs-lex ratio is statistical; a
    # fixed example set keeps the gate deterministic across runs
    suppress_health_check=[HealthCheck.too_slow],
)
def test_zorder_second_dimension_no_looser_than_lexicographic(spark, dist, seed):
    rng = np.random.default_rng(seed)
    rows = _make_rows(rng, dist)
    span_z, n_z = _compact_spans(spark, rows, zorder=True)
    span_lex, n_lex = _compact_spans(spark, rows, zorder=False)
    assert n_z == n_lex == len(rows)  # no rows lost by either layout
    if span_lex is None or span_z is None:
        return  # an all-null column records no stats — nothing to compare
    global_span = max((r[1] for r in rows if r[1] is not None), default=0) - min(
        (r[1] for r in rows if r[1] is not None), default=0
    )
    # z-order must be no looser than lexicographic on the SECOND
    # dimension (lexicographic concentrates only the first): small
    # multiplicative + additive slack absorbs bucket granularity in
    # the degenerate cases where both layouts are already tight
    assert span_z <= 1.3 * span_lex + 0.02 * global_span + 2, (
        f"dist={dist} seed={seed}: z mean b-span {span_z:.1f} vs "
        f"lex {span_lex:.1f} (global {global_span})"
    )
    if dist in ("skewed", "uniform"):
        # where the leading column has real cardinality, z-order must
        # be STRICTLY better, not merely not-worse: lexicographic
        # files each span nearly the whole b domain
        assert span_z < 0.8 * span_lex, (
            f"dist={dist} seed={seed}: z {span_z:.1f} not tighter than lex {span_lex:.1f}"
        )
