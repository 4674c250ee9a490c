"""Cross-run incremental dedup (dedup.MinHashStore).

Pins the store lifecycle the registered oracle can't see: absorb makes
later batches dedup against earlier survivors, the store probe is a
bucket-PRUNED snapshot_where read (file skipping observable via
last_planning), and resolution tie-breaks (store wins) hold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_job_spark.operators.dedup import MinHashStore
from etl_job_spark.table import ManifestTable

LONG_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
LONG_B = "one two three four five six seven eight nine ten eleven"
LONG_C = "red orange yellow green blue indigo violet cyan magenta white"


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_batch_dup_of_store_is_removed(spark, tmp_path):
    store = MinHashStore(str(tmp_path / "s"), n_buckets=8)
    store.initialize(_docs(spark, [(1, LONG_A), (2, LONG_B)]))
    res = {
        r.doc_id: r
        for r in store.dedup_batch(
            spark, _docs(spark, [(10, LONG_A), (11, LONG_C)])
        ).collect()
    }
    assert res[10].kept == 0 and res[10].dedup_to == 1 and res[10].via_store == 1
    assert res[11].kept == 1 and res[11].dedup_to == 11 and res[11].via_store == 0


def test_within_batch_dup_and_store_tiebreak(spark, tmp_path):
    store = MinHashStore(str(tmp_path / "s"), n_buckets=8)
    store.initialize(_docs(spark, [(5, LONG_A)]))
    # 10 and 11 duplicate each other (within), 10+11 also duplicate store 5:
    # store wins the tie for both (store_min=5 <= within_min)
    res = {
        r.doc_id: r
        for r in store.dedup_batch(
            spark, _docs(spark, [(10, LONG_A), (11, LONG_A), (12, LONG_B), (13, LONG_B)])
        ).collect()
    }
    assert res[10].dedup_to == 5 and res[10].via_store == 1
    assert res[11].dedup_to == 5 and res[11].via_store == 1
    # 12/13 collide only within the batch: min-id survives
    assert res[12].kept == 1
    assert res[13].kept == 0 and res[13].dedup_to == 12 and res[13].via_store == 0


def test_absorb_makes_next_batch_dedup_against_survivors(spark, tmp_path):
    store = MinHashStore(str(tmp_path / "s"), n_buckets=8)
    store.initialize(_docs(spark, [(1, LONG_A)]))
    b1 = _docs(spark, [(10, LONG_C)])
    r1 = store.dedup_batch(spark, b1)
    assert [r.kept for r in r1.collect()] == [1]
    store.absorb(r1, b1)
    # batch 2 duplicates batch 1's survivor — only via the absorbed bands
    r2 = {r.doc_id: r for r in store.dedup_batch(spark, _docs(spark, [(20, LONG_C)])).collect()}
    assert r2[20].kept == 0 and r2[20].dedup_to == 10 and r2[20].via_store == 1


def test_short_docs_always_survive(spark, tmp_path):
    store = MinHashStore(str(tmp_path / "s"), n_buckets=8)
    store.initialize(_docs(spark, [(1, LONG_A)]))
    res = store.dedup_batch(spark, _docs(spark, [(10, "ab"), (11, "")])).collect()
    assert sorted((r.doc_id, r.kept, r.dedup_to) for r in res) == [(10, 1, 10), (11, 1, 11)]


def test_store_probe_prunes_bucket_partitions(spark, tmp_path):
    # many distinct store docs spread bands across 16 buckets; a
    # one-doc batch touches ≤4 of them — the probe must NOT read the
    # whole store
    corpus = [(i, f"w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f w{i}g w{i}h") for i in range(40)]
    store = MinHashStore(str(tmp_path / "s"), n_buckets=16)
    store.initialize(_docs(spark, corpus))
    total_files = len(ManifestTable(str(tmp_path / "s")).snapshot(spark).inputFiles())
    tbl = store._table()
    nb = store.bands_of(_docs(spark, [(100, corpus[3][1])]))
    buckets = sorted(r[0] for r in nb.select("sig_bucket").distinct().collect())
    assert len(buckets) <= 4
    pruned = tbl.snapshot_where(spark, [("sig_bucket", "in", buckets)])
    assert tbl.last_planning["kept"] < total_files
    # and the pruned read is exactly the bucket subset
    full = ManifestTable(str(tmp_path / "s")).snapshot(spark).filter(
        F.col("sig_bucket").isin(buckets)
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(map(tuple, full.collect()))
