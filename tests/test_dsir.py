"""DSIR importance resampling (sampling.dsir_weights / dsir_resample).

Pins the semantics the registered oracle hash-checks at SF: target-like
documents outscore off-target ones, scores are exact integers invariant
to partitioning, and resampling is a deterministic top-k by Gumbel key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_job_spark.operators.sampling import dsir_resample, dsir_weights


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


TARGETY = [(i, "the quick brown fox jumps over the lazy dog") for i in range(10)]
OFFY = [(100 + i, "zzz qqq xxx vvv kkk jjj www uuu yyy nnn") for i in range(10)]


def test_target_like_docs_outscore_off_target(spark):
    raw = _docs(spark, TARGETY + OFFY)
    target = _docs(spark, [(1000 + i, t) for i, (_, t) in enumerate(TARGETY)])
    w = dsir_weights(raw, target).collect()
    scores = {r.doc_id: r.score_micro for r in w}
    assert min(scores[i] for i in range(10)) > max(scores[100 + i] for i in range(10))


def test_scores_invariant_to_partitioning(spark):
    raw = _docs(spark, TARGETY + OFFY)
    target = _docs(spark, TARGETY[:5])
    a = sorted(map(tuple, dsir_weights(raw, target).collect()))
    b = sorted(map(tuple, dsir_weights(raw.repartition(7), target.repartition(3)).collect()))
    assert a == b


def test_resample_is_top_k_by_gumbel_key(spark):
    raw = _docs(spark, TARGETY + OFFY)
    target = _docs(spark, TARGETY[:5])
    w = dsir_weights(raw, target)
    picked = dsir_resample(w, 6).collect()
    assert len(picked) == 6
    all_rows = sorted(w.collect(), key=lambda r: (-r.key_micro, r.doc_id))
    assert sorted(r.doc_id for r in picked) == sorted(r.doc_id for r in all_rows[:6])


def test_every_raw_doc_scored_once(spark):
    raw = _docs(spark, TARGETY + OFFY + [(999, "")])  # empty text still scores
    target = _docs(spark, TARGETY[:3])
    w = dsir_weights(raw, target)
    assert w.count() == 21
    assert w.select("doc_id").distinct().count() == 21
    # integer exactness: all columns bigint
    assert dict(w.dtypes) == {"doc_id": "bigint", "score_micro": "bigint", "key_micro": "bigint"}


def test_temperature_flattens_exactly(spark):
    raw = _docs(spark, TARGETY + OFFY)
    target = _docs(spark, TARGETY[:5])
    base = {r.doc_id: r for r in dsir_weights(raw, target).collect()}
    hot = {r.doc_id: r for r in dsir_weights(raw, target, temperature=1000).collect()}
    for did, r in hot.items():
        # untempered score is reported unchanged; the key uses score div T
        assert r.score_micro == base[did].score_micro
        gumbel = base[did].key_micro - base[did].score_micro
        # Python // floors like Spark's div for these magnitudes only when
        # signs agree; mirror div's truncate-toward-zero exactly
        q = abs(r.score_micro) // 1000
        tempered = q if r.score_micro >= 0 else -q
        assert r.key_micro == tempered + gumbel
    import pytest

    with pytest.raises(ValueError):
        dsir_weights(raw, target, temperature=0)
    with pytest.raises(ValueError):
        dsir_weights(raw, target, temperature=2.5)  # type: ignore[arg-type]


def test_plan_shape(spark):
    raw = _docs(spark, TARGETY + OFFY)
    target = _docs(spark, TARGETY[:5])
    out = dsir_resample(dsir_weights(raw, target), 4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # never a global sort
    assert "BroadcastHashJoin" in plan  # ratio table broadcasts
    assert "Python" not in plan  # pure column expressions
