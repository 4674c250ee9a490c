"""Pluggable commit store (VERDICT r11 next-round #1): the
put-if-absent control plane behind manifests and the txn log, made a
first-class interface so the format deploys off POSIX (S3/GCS
conditional put — mapping documented on the interface).

Covers the store contract itself (exclusivity, redelivery, scoping),
a ManifestTable running its ENTIRE control plane on the in-memory
double, the TransactionalCatalog doing the same, and the two-writer
contention drive re-run through the fault-injecting wrapper: the
loser of an injected race retries on top of the winner's commit —
the protocol survives exactly the failures an object store delivers.
"""

from __future__ import annotations

import threading

import pytest

from etl_job_spark.commit_store import (
    FaultInjectingStore,
    InMemoryCommitStore,
    LocalFSCommitStore,
    StoreConflict,
)
from etl_job_spark.table import CommitConflictError, ManifestTable
from etl_job_spark.txn import TransactionalCatalog


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, dy string, v double")


def _data(df):
    return sorted((r.k, r.dy, float(r.v)) for r in df.select("k", "dy", "v").collect())


# ---------------------------------------------------------------------
# the store contract
# ---------------------------------------------------------------------


@pytest.mark.parametrize("make", [InMemoryCommitStore, None])
def test_write_if_absent_is_exclusive(make, tmp_path):
    store = make() if make else LocalFSCommitStore(str(tmp_path))
    store.write_if_absent("_m/v1.json", b"first")
    with pytest.raises(StoreConflict):
        store.write_if_absent("_m/v1.json", b"second")
    assert store.read("_m/v1.json") == b"first"  # content never torn
    assert store.list_dir("_m") == ["v1.json"]
    assert store.exists("_m/v1.json")
    store.delete("_m/v1.json")
    assert not store.exists("_m/v1.json")
    store.delete("_m/v1.json")  # missing delete is not an error
    with pytest.raises(FileNotFoundError):
        store.read("_m/v1.json")


def test_exclusivity_under_concurrency(tmp_path):
    """N threads race one name on each impl: exactly one wins."""
    for store in (InMemoryCommitStore(), LocalFSCommitStore(str(tmp_path))):
        wins, losses = [], []

        def put(i):
            try:
                store.write_if_absent("_m/v7.json", b"w%d" % i)
                wins.append(i)
            except StoreConflict:
                losses.append(i)

        ts = [threading.Thread(target=put, args=(i,)) for i in range(8)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert len(wins) == 1 and len(losses) == 7
        assert store.read("_m/v7.json") == b"w%d" % wins[0]


def test_scoped_views_share_namespace():
    root = InMemoryCommitStore()
    a = root.scoped("tbl_a")
    a.write_if_absent("_manifests/v1.json", b"x")
    assert root.read("tbl_a/_manifests/v1.json") == b"x"
    assert root.list_dir("tbl_a/_manifests") == ["v1.json"]
    # a sibling scope is disjoint
    assert root.scoped("tbl_b").list_dir("_manifests") == []


def test_fault_wrapper_lost_race_and_spurious():
    inner = InMemoryCommitStore()
    s = FaultInjectingStore(inner)
    # lost race: a rival's content lands, the caller conflicts
    s.lose_race(b"rival")
    with pytest.raises(StoreConflict):
        s.write_if_absent("_m/v1.json", b"mine")
    assert s.read("_m/v1.json") == b"rival"
    # spurious conflict: nothing lands; a retry at the same name wins
    s.spurious_conflict()
    with pytest.raises(StoreConflict):
        s.write_if_absent("_m/v2.json", b"mine")
    assert not s.exists("_m/v2.json")
    s.write_if_absent("_m/v2.json", b"mine")
    assert s.read("_m/v2.json") == b"mine"


def test_fault_wrapper_duplicate_puts_are_absorbed():
    """At-least-once redelivery (an HTTP retry whose first attempt
    landed) must leave first-writer-wins intact."""
    s = FaultInjectingStore(InMemoryCommitStore())
    s.duplicate_puts = True
    s.write_if_absent("_m/v1.json", b"a")
    assert s.read("_m/v1.json") == b"a"
    with pytest.raises(StoreConflict):
        s.write_if_absent("_m/v1.json", b"b")


# ---------------------------------------------------------------------
# a table's whole control plane on the in-memory double
# ---------------------------------------------------------------------


def test_table_lifecycle_on_in_memory_store(spark, tmp_path):
    """Commits, time travel, merge pruning, history — with every
    manifest living in a dict, no JSON on disk (data files stay real
    parquet: the two-plane contract)."""
    store = InMemoryCommitStore()
    t = ManifestTable(str(tmp_path / "t"), store=store)
    t.overwrite(_df(spark, [("a", "d1", 1.0), ("b", "d2", 2.0)]), partition_by=["dy"])
    t.merge(spark, _df(spark, [("a", "d1", 10.0)]), keys=["k", "dy"])
    assert _data(t.snapshot(spark)) == [("a", "d1", 10.0), ("b", "d2", 2.0)]
    assert _data(t.snapshot(spark, version=1)) == [("a", "d1", 1.0), ("b", "d2", 2.0)]
    # no manifest JSON ever touched the filesystem
    assert not (tmp_path / "t" / "_manifests").exists()
    assert sorted(store.list_dir("_manifests")) == [
        "v000000000001.json",
        "v000000000002.json",
    ]
    assert [h["operation"].get("op") for h in t.history()] == ["overwrite", "merge"]
    # racing writers through the shared dict: one wins
    e1 = t._write_data_files(_df(spark, [("w", "d1", 1.0)]), None)
    man = {
        "version": 3, "base_version": 2, "schema": "", "partition_by": [],
        "files": e1,
    }
    t._publish(3, man)
    with pytest.raises(CommitConflictError):
        t._publish(3, man)


def test_catalog_txn_on_in_memory_store(spark, tmp_path):
    """Cross-table atomic commit + crash-replay with the whole log in
    memory; enrolled tables inherit scoped views of the catalog store."""
    store = InMemoryCommitStore()
    cat = TransactionalCatalog(str(tmp_path), store=store)
    state = cat.commit(
        lambda txn: (
            txn.overwrite("s", _df(spark, [("a", "d1", 1.0)])),
            txn.overwrite("m", _df(spark, [("b", "d2", 2.0)])),
        )
    )
    assert state == {"s": 1, "m": 1}
    assert _data(cat.table("s").snapshot(spark)) == [("a", "d1", 1.0)]
    # a fresh catalog over the same store replays to the same state
    cat2 = TransactionalCatalog(str(tmp_path), store=store)
    assert cat2.roll_forward() == {"s": 1, "m": 1}
    assert store.list_dir("_txns") == ["t000000001.json"]


# ---------------------------------------------------------------------
# contention through the fault wrapper (the two-writer drive)
# ---------------------------------------------------------------------


def test_commit_conflict_retry_through_injected_race(spark, tmp_path):
    """The r3 two-writer drive, re-run through the store interface:
    writer B's whole merge is injected as the rival content at A's
    commit point; A's retry loop re-reads, re-prunes, and lands on
    top — final state equals sequential application."""
    fs = FaultInjectingStore(LocalFSCommitStore(str(tmp_path / "t")))
    t = ManifestTable(str(tmp_path / "t"), store=fs)
    t.overwrite(_df(spark, [("a", "d1", 1.0), ("b", "d2", 2.0)]))
    # writer B prepares its v2 manifest out of band (same table, own
    # instance on the raw store) — the content the race injects
    other = ManifestTable(t.path)
    e2 = other._write_data_files(_df(spark, [("b", "d2", 20.0), ("a", "d1", 1.0)]), None)
    import json

    man1 = other._read_manifest(1)
    rival = {
        "version": 2,
        "base_version": 1,
        "schema": man1["schema"],
        "partition_by": [],
        "files": e2,
        "operation": {"op": "merge"},
    }
    fs.lose_race(json.dumps(rival, indent=1, sort_keys=True).encode())
    v = t.merge(spark, _df(spark, [("a", "d1", 10.0)]), keys=["k", "dy"])
    assert v == 3  # the rival took v2; A retried and committed v3
    assert fs.stats["conflicts"] == 1
    assert _data(t.snapshot(spark)) == [("a", "d1", 10.0), ("b", "d2", 20.0)]


def test_spurious_conflict_retries_to_success(spark, tmp_path):
    """A stale 412 (conflict with nothing there) costs one retry, not
    a failed commit."""
    fs = FaultInjectingStore(LocalFSCommitStore(str(tmp_path / "t")))
    t = ManifestTable(str(tmp_path / "t"), store=fs)
    t.overwrite(_df(spark, [("a", "d1", 1.0)]))
    fs.spurious_conflict()
    v = t.append(_df(spark, [("z", "d9", 9.0)]))
    assert v == 2
    assert _data(t.snapshot(spark)) == [("a", "d1", 1.0), ("z", "d9", 9.0)]


def test_catalog_commit_through_injected_duplicate_puts(spark, tmp_path):
    """The txn log's commit point under at-least-once delivery: every
    record/checkpoint put redelivered; nothing double-applies."""
    fs = FaultInjectingStore(LocalFSCommitStore(str(tmp_path)))
    fs.duplicate_puts = True
    cat = TransactionalCatalog(str(tmp_path), store=fs)
    cat.commit(lambda txn: txn.overwrite("s", _df(spark, [("a", "d1", 1.0)])))
    cat.commit(
        lambda txn: txn.merge(
            "s", spark, _df(spark, [("a", "d1", 5.0)]), keys=["k", "dy"]
        )
    )
    assert _data(cat.table("s").snapshot(spark)) == [("a", "d1", 5.0)]
    assert cat.table("s").latest_version() == 2


def test_parquet_sidecar_checkpoint_through_in_memory_store(
    spark, tmp_path, monkeypatch
):
    """A checkpoint big enough for the files-ref parquet sidecar form
    writes THROUGH the store (bytes in the dict, nothing in
    _manifests/ on disk) and resolves back through store.read; the
    Spark-side sidecar-scan tiers are gated on store.uri() — None here
    — so planning falls back to driver-side resolution and stays
    correct."""
    import etl_job_spark.table as table_mod

    monkeypatch.setattr(table_mod, "_FILES_PARQUET_MIN", 4)
    store = InMemoryCommitStore()
    t = ManifestTable(str(tmp_path / "t"), store=store)
    df = spark.range(0, 80).selectExpr(
        "cast(id % 8 as string) p", "id k", "id * 2 v"
    )
    t.overwrite(df.repartition(8, "p"), partition_by=["p"])  # v1: 8 files
    man = t._read_raw_manifest(1)
    assert "files_ref" in man and man["n_files"] == 8
    # the sidecar lives only in the store
    assert any(k.endswith(".parquet") for k in store.list_dir("_manifests"))
    assert not (tmp_path / "t" / "_manifests").exists()
    # resolution + pruned reads work through the driver-side fallback
    assert t.snapshot(spark).count() == 80
    got = t.snapshot_where(spark, [("p", "=", "3")])
    assert sorted(r.k for r in got.collect()) == [3, 11, 19, 27, 35, 43, 51, 59, 67, 75]
    assert t.last_planning["mode"] == "driver"
    # a follow-up commit resolves its base through the sidecar too
    t.append(spark.createDataFrame([("9", 999, 0)], "p string, k long, v long"))
    assert t.snapshot(spark).count() == 81
