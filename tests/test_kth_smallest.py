"""Exact distributed k-th smallest (skew.kth_smallest)."""

from __future__ import annotations

import random

import pytest

from etl_job_spark.operators.skew import kth_smallest


def _df(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], "v bigint")


def test_matches_sorted_reference(spark):
    rng = random.Random(7)
    vals = [rng.randint(-(10**12), 10**12) for _ in range(500)] + [42] * 20
    df = _df(spark, vals).persist()
    ref = sorted(vals)
    for k in (1, 2, 173, 260, len(vals)):
        assert kth_smallest(df, "v", k) == ref[k - 1], k


def test_narrow_range_single_pass(spark):
    vals = [5, 5, 5, 7, 9, 9]
    df = _df(spark, vals)
    assert [kth_smallest(df, "v", k) for k in range(1, 7)] == sorted(vals)


def test_duplicates_counted(spark):
    df = _df(spark, [1, 1, 1, 10**15])
    assert kth_smallest(df, "v", 3) == 1
    assert kth_smallest(df, "v", 4) == 10**15


def test_k_out_of_range(spark):
    df = _df(spark, [1, 2])
    with pytest.raises(ValueError):
        kth_smallest(df, "v", 0)
    with pytest.raises(ValueError):
        kth_smallest(df, "v", 3)
