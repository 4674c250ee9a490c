"""Streaming cross-batch dedup (pipeline.dedup_batch_into_catalog /
incremental_dedup_sink): each micro-batch drops near-duplicates of
anything previously kept, survivors + bands commit atomically with
exactly-once replay semantics.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from etl_job_spark.streaming.pipeline import (
    dedup_batch_into_catalog,
    incremental_dedup_sink,
)
from etl_job_spark.txn import TransactionalCatalog

LONG_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
LONG_B = "one two three four five six seven eight nine ten eleven"
LONG_C = "red orange yellow green blue indigo violet cyan magenta white"


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _init_store(spark, cat, name="signatures"):
    empty = spark.createDataFrame([], "doc_id bigint, band int, sig string, sig_bucket bigint")
    cat.table(name).overwrite(empty, partition_by=["sig_bucket"])


def test_cross_batch_dedup_and_atomic_commit(spark, tmp_path):
    cat = TransactionalCatalog(str(tmp_path / "cat"))
    _init_store(spark, cat)
    app = "app1"
    v0 = dedup_batch_into_catalog(
        cat, app, _docs(spark, [(1, LONG_A), (2, LONG_A), (3, LONG_B)]), 0, n_buckets=8
    )
    assert set(v0) == {"corpus", "signatures"}
    corpus = cat.table("corpus").snapshot(spark)
    assert sorted(r.doc_id for r in corpus.collect()) == [1, 3]  # 2 dups 1 within-batch
    # batch 1: 10 duplicates kept doc 1, 11 is new
    dedup_batch_into_catalog(
        cat, app, _docs(spark, [(10, LONG_A), (11, LONG_C)]), 1, n_buckets=8
    )
    corpus = cat.table("corpus").snapshot(spark)
    assert sorted(r.doc_id for r in corpus.collect()) == [1, 3, 11]
    # store holds bands only for kept docs
    sigs = cat.table("signatures").snapshot(spark)
    assert set(r.doc_id for r in sigs.collect()) == {1, 3, 11}


def test_replayed_batch_is_metadata_noop(spark, tmp_path):
    cat = TransactionalCatalog(str(tmp_path / "cat"))
    _init_store(spark, cat)
    app = "app1"
    b0 = _docs(spark, [(1, LONG_A), (2, LONG_B)])
    assert dedup_batch_into_catalog(cat, app, b0, 0, n_buckets=8) != {}
    v_corpus = cat.table("corpus").latest_version()
    v_store = cat.table("signatures").latest_version()
    # replay (crash before checkpoint advance): same batch_id re-runs —
    # the probe now SEES batch 0's own bands, but both ledgered merges
    # no-op and nothing publishes
    assert dedup_batch_into_catalog(cat, app, b0, 0, n_buckets=8) == {}
    assert cat.table("corpus").latest_version() == v_corpus
    assert cat.table("signatures").latest_version() == v_store
    assert sorted(
        r.doc_id for r in cat.table("corpus").snapshot(spark).collect()
    ) == [1, 2]


def test_sink_auto_compaction_cadence(spark, tmp_path):
    # two micro-batches (maxFilesPerTrigger=1) land overlapping
    # sig_bucket partitions; compact_every=1 bin-packs after each, so
    # the store ends with ONE file per touched partition instead of
    # one file set per batch — and the data is byte-identical
    src = str(tmp_path / "src")
    _docs(spark, [(1, LONG_A), (2, LONG_B)]).coalesce(1).write.json(src)
    _docs(spark, [(3, LONG_A), (4, LONG_C)]).coalesce(1).write.mode("append").json(src)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    w = incremental_dedup_sink(
        stream,
        str(tmp_path / "cat"),
        str(tmp_path / "ck"),
        n_buckets=8,
        compact_every=1,
    )
    q = w.trigger(availableNow=True).start()
    q.awaitTermination(120)
    cat = TransactionalCatalog(str(tmp_path / "cat"))
    sig = cat.table("signatures")
    # compaction commits happened (cadence fired per batch)
    ops = [r.op for r in sig.history_df(spark).collect()]
    assert "compact_small_files" in ops
    # every partition holds exactly one live file
    per_part = {}
    for f in sig.snapshot(spark).inputFiles():
        key = f.split("sig_bucket=")[1].split("/")[0]
        per_part.setdefault(key, set()).add(f)
    assert per_part and all(len(v) == 1 for v in per_part.values())
    # content unchanged by upkeep: doc 3 deduped against batch-0's doc 1
    kept = sorted(
        r.doc_id for r in cat.table("corpus").snapshot(spark).collect()
    )
    assert kept == [1, 2, 4]
    import pytest

    with pytest.raises(ValueError):
        incremental_dedup_sink(stream, str(tmp_path / "c2"), str(tmp_path / "k2"), compact_every=0)


def test_incremental_dedup_sink_end_to_end(spark, tmp_path):
    # real foreachBatch run through a file stream: two duplicate docs
    # arrive in the stream, only the first survives
    src = str(tmp_path / "src")
    _docs(spark, [(1, LONG_A), (2, LONG_A), (3, LONG_C)]).coalesce(1).write.json(src)
    stream = spark.readStream.schema("doc_id bigint, text string").json(src)
    w = incremental_dedup_sink(
        stream,
        str(tmp_path / "cat"),
        str(tmp_path / "ck"),
        n_buckets=8,
    )
    q = w.trigger(availableNow=True).start()
    q.awaitTermination(120)
    cat = TransactionalCatalog(str(tmp_path / "cat"))
    kept = sorted(r.doc_id for r in cat.table("corpus").snapshot(spark).collect())
    assert kept == [1, 3]
    # the pre-created store table kept its partition layout
    files = cat.table("signatures").snapshot(spark).inputFiles()
    assert all("sig_bucket=" in f for f in files)
