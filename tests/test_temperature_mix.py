"""Temperature-based source mixing (sampling.temperature_caps)."""

from __future__ import annotations

import math

from etl_job_spark.operators.sampling import temperature_caps


def _docs(spark, sizes: dict[str, int]):
    rows, i = [], 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, ["doc_id", "source"])


def test_quotas_follow_sqrt_weights(spark):
    sizes = {"big": 400, "mid": 100, "small": 25}
    out = temperature_caps(_docs(spark, sizes), budget=90).collect()
    got = {}
    for r in out:
        got[r.source] = got.get(r.source, 0) + 1
    w = {s: math.isqrt(n) for s, n in sizes.items()}  # 20, 10, 5
    tot = sum(w.values())
    assert got == {s: (90 * w[s]) // tot for s in sizes}  # 51, 25, 12
    # sqrt temperature upsamples the small source: 12/90 ≈ 13% of the
    # mix from a source that is only 25/525 ≈ 5% of the corpus
    assert got["small"] / 90 > sizes["small"] / sum(sizes.values())


def test_quota_caps_at_source_size(spark):
    sizes = {"a": 4, "b": 10000}
    out = temperature_caps(_docs(spark, sizes), budget=5000).collect()
    got = {}
    for r in out:
        got[r.source] = got.get(r.source, 0) + 1
    assert got["a"] == 4  # quota would exceed the source; capped


def test_selection_is_stable_under_repartition(spark):
    docs = _docs(spark, {"x": 50, "y": 200})
    a = sorted(r.doc_id for r in temperature_caps(docs, 60).collect())
    b = sorted(r.doc_id for r in temperature_caps(docs.repartition(13), 60).collect())
    assert a == b
