"""TransactionalCatalog: cross-table atomicity, crash roll-forward,
deterministic conflict resolution."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from etl_job_spark.table import CommitConflictError
from etl_job_spark.txn import Transaction, TransactionalCatalog, _txn_name


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _mark(txn, marker):
    for s in txn.staged.values():
        for m in s["manifests"]:
            m.setdefault("txn", {})["marker"] = marker


def _record_tables(cat, txn, marker):
    """The record-side shape commit() publishes (the in-memory staged
    chain wraps each manifest inline-or-spilled)."""
    _mark(txn, marker)
    return {
        name: cat._spill_if_large(name, staged, marker)
        for name, staged in txn.staged.items()
    }


def test_two_table_commit_is_atomic_and_visible(spark, tmp_path):
    cat = TransactionalCatalog(str(tmp_path / "cat"))

    def ops(txn):
        txn.overwrite("staging", _df(spark, [(1, "a"), (2, "b")]))
        txn.overwrite("mart", _df(spark, [(1, "A")]))

    versions = cat.commit(ops)
    assert versions == {"staging": 1, "mart": 1}
    assert cat.table("staging").snapshot(spark).count() == 2
    assert cat.table("mart").snapshot(spark).count() == 1

    # second txn: merge staging + rebuild mart together
    def ops2(txn):
        txn.merge("staging", spark, _df(spark, [(2, "b2"), (3, "c")]), keys=["k"])
        txn.overwrite("mart", _df(spark, [(1, "A"), (2, "B")]))

    versions = cat.commit(ops2)
    assert versions == {"staging": 2, "mart": 2}
    got = {r["k"]: r["v"] for r in cat.table("staging").snapshot(spark).collect()}
    assert got == {1: "a", 2: "b2", 3: "c"}


def test_update_where_and_clause_merge_inside_the_log(spark, tmp_path):
    """The round-9 verbs route through the log like every other write:
    update_where and a matched-clause merge stage + apply atomically,
    and replay sees consistent versions."""
    cat = TransactionalCatalog(str(tmp_path / "cat"))
    cat.commit(lambda txn: txn.overwrite("t", _df(spark, [(1, "a"), (2, "b"), (3, "c")])))

    def ops(txn):
        txn.update_where("t", spark, {"v": "upper(v)"}, "k <= 2")

    assert cat.commit(ops) == {"t": 2}
    got = {r["k"]: r["v"] for r in cat.table("t").snapshot(spark).collect()}
    assert got == {1: "A", 2: "B", 3: "c"}

    def ops2(txn):
        txn.merge(
            "t", spark, _df(spark, [(3, "C3"), (9, "nine")]), keys=["k"],
            when_matched_update=["v"], insert_unmatched=False,
        )

    assert cat.commit(ops2) == {"t": 3}
    got = {r["k"]: r["v"] for r in cat.table("t").snapshot(spark).collect()}
    assert got == {1: "A", 2: "B", 3: "C3"}  # no insert of k=9


def test_commit_point_then_crash_heals_by_roll_forward(spark, tmp_path):
    root = str(tmp_path / "cat")
    cat = TransactionalCatalog(root)
    cat.commit(lambda txn: txn.overwrite("t1", _df(spark, [(1, "x")])))

    # stage a 2-table txn but "crash" right after the commit point:
    # publish the record without applying it
    txn = Transaction(cat)
    txn.overwrite("t1", _df(spark, [(1, "y"), (2, "z")]))
    txn.overwrite("t2", _df(spark, [(9, "n")]))
    cat._publish_txn(
        2,
        {"id": 2, "marker": "crashed",
         "tables": _record_tables(cat, txn, "crashed")},
    )

    # before roll-forward, the tables still show the old state
    assert cat.table("t1").latest_version() == 1
    assert cat.table("t2").latest_version() is None

    # ANY later catalog touch heals both tables together
    fresh = TransactionalCatalog(root)
    state = fresh.roll_forward()
    assert state == {"t1": 2, "t2": 1}
    assert {r["k"] for r in fresh.table("t1").snapshot(spark).collect()} == {1, 2}
    assert fresh.table("t2").snapshot(spark).count() == 1


def test_conflicting_record_deterministically_aborted(spark, tmp_path):
    root = str(tmp_path / "cat")
    cat = TransactionalCatalog(root)
    cat.commit(lambda txn: txn.overwrite("t", _df(spark, [(1, "a")])))

    # two records prepared against the SAME base; the one with the
    # higher id must lose for every observer
    t1 = Transaction(cat)
    t1.overwrite("t", _df(spark, [(1, "winner")]))
    cat._publish_txn(2, {"id": 2, "marker": "w", "tables": _record_tables(cat, t1, "w")})

    t2 = Transaction(cat)
    t2.overwrite("t", _df(spark, [(1, "loser")]))
    cat._publish_txn(3, {"id": 3, "marker": "l", "tables": _record_tables(cat, t2, "l")})

    for observer in (cat, TransactionalCatalog(root)):
        assert observer.roll_forward() == {"t": 2}
    rows = cat.table("t").snapshot(spark).collect()
    assert [r["v"] for r in rows] == ["winner"]


def test_losing_committer_reruns_ops_against_fresh_state(spark, tmp_path):
    root = str(tmp_path / "cat")
    cat = TransactionalCatalog(root)
    cat.commit(lambda txn: txn.overwrite("t", _df(spark, [(1, "base")])))

    calls = []

    def ops(txn):
        calls.append(cat.table("t").latest_version())
        if len(calls) == 1:
            # a rival lands a record between our staging and our
            # publish: claim the next txn id out from under us
            rival = Transaction(cat)
            rival.merge("t", spark, _df(spark, [(2, "rival")]), keys=["k"])
            cat._publish_txn(
                2,
                {"id": 2, "marker": "r",
                 "tables": _record_tables(cat, rival, "r")},
            )
        txn.merge("t", spark, _df(spark, [(3, "mine")]), keys=["k"])

    versions = cat.commit(ops)
    assert len(calls) == 2  # ops re-ran after losing the id race
    assert calls == [1, 2]  # second run saw the rival's committed state
    got = {r["k"]: r["v"] for r in cat.table("t").snapshot(spark).collect()}
    assert got == {1: "base", 2: "rival", 3: "mine"}
    assert versions == {"t": 3}


def test_chained_ops_on_one_table_commit_as_one_record(spark, tmp_path):
    """Round 11: a second op on the same table CHAINS (it reads the
    first op's captured state through the pending overlay) and the
    whole chain publishes under ONE record — the multi-statement
    transaction shape (replaces the old one-op-per-table refusal)."""
    cat = TransactionalCatalog(str(tmp_path / "cat"))

    def ops(txn):
        txn.overwrite("t", _df(spark, [(1, "a")]))
        txn.append("t", _df(spark, [(2, "b")]))
        txn.update_where("t", spark, {"v": "upper(v)"}, "k = 1")

    assert cat.commit(ops) == {"t": 3}
    got = {r["k"]: r["v"] for r in cat.table("t").snapshot(spark).collect()}
    assert got == {1: "A", 2: "b"}
    # ONE record carries the whole three-manifest chain
    assert cat._txn_ids() == [1]
    rec = cat._read_txn(1)
    assert len(rec["tables"]["t"]["manifests"]) == 3


def test_out_of_band_write_fails_loudly(spark, tmp_path):
    root = str(tmp_path / "cat")
    cat = TransactionalCatalog(root)
    cat.commit(lambda txn: txn.overwrite("t", _df(spark, [(1, "a")])))

    # stage a record, then an out-of-band writer claims the version
    # slot directly on the table (violating the enrolled contract)
    txn = Transaction(cat)
    txn.overwrite("t", _df(spark, [(1, "txn")]))
    cat._publish_txn(2, {"id": 2, "marker": "m", "tables": _record_tables(cat, txn, "m")})
    cat.table("t").overwrite(_df(spark, [(1, "oob")]))  # direct write → v2

    with pytest.raises(RuntimeError, match="written through the catalog"):
        cat.roll_forward()


def test_noop_delete_inside_txn_stages_nothing(spark, tmp_path):
    cat = TransactionalCatalog(str(tmp_path / "cat"))
    cat.commit(lambda txn: txn.overwrite("t", _df(spark, [(1, "a")])))

    def ops(txn):
        txn.delete_where("t", spark, F.col("k") == 999)  # matches nothing

    assert cat.commit(ops) == {}
    assert cat.table("t").latest_version() == 1


def test_txn_log_survives_and_orders_restarts(spark, tmp_path):
    root = str(tmp_path / "cat")
    cat = TransactionalCatalog(root)
    for i in range(4):
        cat.commit(
            lambda txn, i=i: txn.append("t", _df(spark, [(i, f"r{i}")]))
            if i
            else txn.overwrite("t", _df(spark, [(0, "r0")]))
        )
    assert os.path.isfile(os.path.join(root, "_txns", _txn_name(4)))
    fresh = TransactionalCatalog(root)
    assert fresh.roll_forward() == {"t": 4}
    assert fresh.table("t").snapshot(spark).count() == 4
    hist = fresh.table("t").history()
    assert [h["version"] for h in hist] == [1, 2, 3, 4]


def test_txn_record_stays_small_for_many_file_table(spark, tmp_path, monkeypatch):
    """A transaction over a many-file table must publish an O(1)-size
    record: past the inline threshold the manifest spills to an
    immutable staged file (durable BEFORE the commit point) and the
    record carries a reference (r5 verdict #3)."""
    import etl_job_spark.txn as txn_mod

    monkeypatch.setattr(txn_mod, "_TXN_INLINE_MAX_BYTES", 512)
    root = str(tmp_path / "cat_spill")
    cat = TransactionalCatalog(root)
    df = spark.range(0, 200).selectExpr("id as k", "id as v").repartition(8)
    versions = cat.commit(lambda t: t.overwrite("big", df))
    assert versions == {"big": 1}
    rec = cat._read_txn(1)
    staged = rec["tables"]["big"]
    assert "manifest" not in staged
    assert staged["manifest_ref"].startswith("_txns/_staged/")
    assert staged["version"] == 1 and staged["expected_base"] is None
    assert os.path.getsize(os.path.join(cat.txn_dir, _txn_name(1))) < 1024
    assert os.path.isfile(os.path.join(root, staged["manifest_ref"]))
    # a FRESH catalog (cross-process replay) resolves the spill
    cat2 = TransactionalCatalog(root)
    assert cat2.roll_forward() == {"big": 1}
    assert cat2.table("big").snapshot(spark).count() == 200
    # crash-heal: lose the published manifest, replay re-publishes it
    # from the spilled record content
    from etl_job_spark.table import _manifest_name as _mn
    man = os.path.join(cat.table("big").manifest_dir, _mn(1))
    os.remove(man)
    cat3 = TransactionalCatalog(root)
    assert cat3.roll_forward() == {"big": 1}
    assert cat3.table("big").snapshot(spark).count() == 200
    # a small follow-up txn stays inline (no gratuitous spill) once
    # the real threshold is back
    monkeypatch.setattr(txn_mod, "_TXN_INLINE_MAX_BYTES", 65_536)
    cat3.commit(lambda t: t.overwrite("tiny", _df(spark, [(1, "a")])))
    rec2 = cat3._read_txn(2)
    assert "manifest" in rec2["tables"]["tiny"]


def test_txn_log_checkpoint_bounds_replay_and_vacuum_reclaims(spark, tmp_path, monkeypatch):
    """A fresh process must resolve catalog state from the newest log
    checkpoint alone: after checkpoint + vacuum the pre-checkpoint
    records and their spill files are GONE, yet replay still lands on
    the same versions and commits keep monotonically increasing ids."""
    import etl_job_spark.txn as txn_mod

    monkeypatch.setattr(txn_mod, "_TXN_CHECKPOINT_INTERVAL", 4)
    root = str(tmp_path / "cat_ck")
    cat = TransactionalCatalog(root)
    for i in range(6):  # 6 records; a checkpoint lands once >= 4 accumulate
        cat.commit(lambda t, i=i: t.overwrite("t1", _df(spark, [(i, f"v{i}")])))
    assert cat._ckpt_ids(), "auto-checkpoint never published"
    upto = cat._latest_checkpoint()[0]
    assert upto >= 4
    n_removed = cat.vacuum()
    assert n_removed >= upto  # the covered records are reclaimed
    assert all(i > upto for i in cat._txn_ids())
    # fresh process: state comes from checkpoint + surviving records
    cat2 = TransactionalCatalog(root)
    state = cat2.roll_forward()
    assert state["t1"] == 6
    assert {r["v"] for r in cat2.table("t1").snapshot(spark).collect()} == {"v5"}
    # ids keep increasing past the vacuumed range
    v = cat2.commit(lambda t: t.overwrite("t1", _df(spark, [(9, "z")])))
    assert v == {"t1": 7}
    assert min(cat2._txn_ids()) > upto


def test_txn_checkpoint_preserves_abort_determinism(spark, tmp_path):
    """A table whose starting version was pinned by a PRE-checkpoint
    record (even an aborted one) must keep the same apply/abort
    verdicts after replay switches to the checkpoint."""
    import json as _json

    root = str(tmp_path / "cat_det")
    cat = TransactionalCatalog(root)
    cat.commit(lambda t: t.overwrite("a", _df(spark, [(1, "x")])))
    cat.commit(lambda t: t.overwrite("a", _df(spark, [(2, "y")])))
    # hand-plant an aborted record: expected_base 0 against actual 2
    rec = {
        "id": 3,
        "marker": "m",
        "tables": {
            "a": {
                "expected_base": 0,
                "version": 1,
                "manifest": {"version": 1, "base_version": 0, "files": [],
                             "schema": "struct<>", "partition_by": [],
                             "operation": {}},
            }
        },
    }
    with open(os.path.join(cat.txn_dir, _txn_name(3)), "w") as f:
        _json.dump(rec, f)
    before = TransactionalCatalog(root).roll_forward()
    ck = cat.checkpoint()
    assert ck == 3
    cat.vacuum()
    after = TransactionalCatalog(root).roll_forward()
    assert after == before == {"a": 2}


def test_txn_vacuum_grace_spares_fresh_spills(spark, tmp_path, monkeypatch):
    """A spill file is written BEFORE the record that references it
    publishes — vacuum must never delete a fresh orphan (it may belong
    to an in-flight commit); past the grace period orphans go."""
    import etl_job_spark.txn as txn_mod

    monkeypatch.setattr(txn_mod, "_TXN_INLINE_MAX_BYTES", 256)
    root = str(tmp_path / "cat_grace")
    cat = TransactionalCatalog(root)
    cat.commit(lambda t: t.overwrite("a", _df(spark, [(1, "x")])))
    # simulate an in-flight committer's fresh spill (no record yet)
    stage = os.path.join(root, "_txns", "_staged")
    os.makedirs(stage, exist_ok=True)
    orphan = os.path.join(stage, "deadbeef-x-a.json")
    with open(orphan, "w") as f:
        f.write("{}")
    cat.checkpoint()
    cat.vacuum()  # default grace: the fresh orphan survives
    assert os.path.exists(orphan)
    assert cat.vacuum(grace_seconds=0.0) >= 1  # aged out: reclaimed
    assert not os.path.exists(orphan)
