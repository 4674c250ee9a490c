"""CommitStore conformance kit — the exported contract battery ANY
implementation can run (VERDICT r13 task 5).

A store that passes :func:`run_conformance` satisfies every semantic
the table format and transaction log assume of
:class:`~etl_job_spark.commit_store.CommitStore`; a store that also
passes :func:`run_fault_taxonomy` has been driven through the
object-store failure modes a conditional-put commit protocol must
survive (lost races, stale 412s, at-least-once redelivery).

Usage from any impl's test suite::

    from etl_job_spark.store_conformance import (
        run_conformance, run_fault_taxonomy,
    )

    def test_my_store_conforms(tmp_path):
        run_conformance(lambda: MyStore(...fresh root...))
        run_fault_taxonomy(lambda: MyStore(...fresh root...))

``make_store`` must return a store over a FRESH, EMPTY namespace each
call — the battery writes and deletes real blobs. Every check raises
``AssertionError`` with the violated clause named, so a failure reads
as the contract sentence that broke.
"""

from __future__ import annotations

import threading

from etl_job_spark.commit_store import (
    CommitStore,
    FaultInjectingStore,
    StoreConflict,
)


def run_conformance(make_store, racers: int = 8) -> None:
    """The full CommitStore contract battery against ``make_store()``.

    Covers: write/read byte fidelity, last-writer-wins overwrite,
    put-if-absent exclusivity (single-threaded and under ``racers``
    concurrent threads on one name — exactly one winner, content never
    torn), FileNotFoundError on missing read/mtime, list_dir immediate
    children (including the empty-prefix root listing and the missing
    prefix → ``[]``), exists/delete semantics (missing delete is a
    no-op), mtime presence, scoped-view namespace consistency, and the
    ``uri`` contract (``None`` or a string address)."""
    _check_roundtrip(make_store())
    _check_put_if_absent(make_store())
    _check_race(make_store(), racers)
    _check_missing(make_store())
    _check_listing(make_store())
    _check_delete(make_store())
    _check_scoped(make_store())
    _check_uri(make_store())


def run_fault_taxonomy(make_store) -> None:
    """Drive :class:`FaultInjectingStore` over ``make_store()`` through
    the three object-store failure modes and assert the decorated
    store's observable behavior is exactly the documented taxonomy:

    - a LOST RACE surfaces :class:`StoreConflict` and the rival's
      payload occupies the name (caller re-reads and sees the winner);
    - a SPURIOUS conflict (stale 412 / mutex timeout) surfaces
      :class:`StoreConflict` with the slot genuinely free — the
      caller's retry succeeds at the SAME name;
    - DUPLICATE PUTS (at-least-once redelivery) leave first-writer
      content intact: the redelivery must lose against its own first
      attempt, proving the inner store is exclusive even against
      itself."""
    fs = FaultInjectingStore(make_store())

    # lost race
    fs.lose_race(b"rival-content")
    try:
        fs.write_if_absent("slot.json", b"mine")
    except StoreConflict:
        pass
    else:
        raise AssertionError("lost race must surface StoreConflict")
    assert fs.read("slot.json") == b"rival-content", (
        "after a lost race the RIVAL's payload must occupy the name"
    )

    # spurious conflict then clean retry at the same name
    fs.spurious_conflict()
    try:
        fs.write_if_absent("retry.json", b"payload")
    except StoreConflict:
        pass
    else:
        raise AssertionError("spurious 412 must surface StoreConflict")
    assert not fs.exists("retry.json"), (
        "a spurious conflict must leave the slot free"
    )
    fs.write_if_absent("retry.json", b"payload")  # the retry succeeds
    assert fs.read("retry.json") == b"payload"

    # duplicate delivery: the redelivered put must lose to itself
    fs.duplicate_puts = True
    fs.write_if_absent("dup.json", b"once")
    assert fs.read("dup.json") == b"once", (
        "at-least-once redelivery must never tear or duplicate content"
    )
    fs.duplicate_puts = False


# -- individual clauses ------------------------------------------------


def _check_roundtrip(s: CommitStore) -> None:
    payload = bytes(range(256)) * 3  # binary-safe, not JSON
    s.write("dir/a.bin", payload)
    assert s.read("dir/a.bin") == payload, "write/read must be byte-exact"
    s.write("dir/a.bin", b"second")
    assert s.read("dir/a.bin") == b"second", (
        "unconditional write is last-writer-wins"
    )
    assert s.mtime("dir/a.bin") > 0, "mtime of an existing blob"


def _check_put_if_absent(s: CommitStore) -> None:
    s.write_if_absent("m/v1.json", b"winner")
    try:
        s.write_if_absent("m/v1.json", b"loser")
    except StoreConflict:
        pass
    else:
        raise AssertionError(
            "write_if_absent on a taken name must raise StoreConflict"
        )
    assert s.read("m/v1.json") == b"winner", (
        "a losing put must never alter the occupant's content"
    )
    try:
        s.write_if_absent("m/v1.json", b"winner")
    except StoreConflict:
        pass
    else:
        raise AssertionError(
            "identical content does not make a second put succeed — "
            "idempotence is the CALLER's policy"
        )


def _check_race(s: CommitStore, racers: int) -> None:
    results: list[str | None] = [None] * racers
    barrier = threading.Barrier(racers)

    def attempt(i: int) -> None:
        barrier.wait()
        try:
            s.write_if_absent("race/slot.json", f"writer-{i}".encode())
            results[i] = "won"
        except StoreConflict:
            results[i] = "lost"

    threads = [
        threading.Thread(target=attempt, args=(i,)) for i in range(racers)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results.count("won") == 1, (
        f"of {racers} racers exactly ONE must win (got {results})"
    )
    winner = results.index("won")
    assert s.read("race/slot.json") == f"writer-{winner}".encode(), (
        "final content must be the winner's payload, never torn"
    )


def _check_missing(s: CommitStore) -> None:
    for verb in ("read", "mtime"):
        try:
            getattr(s, verb)("nope/missing.json")
        except FileNotFoundError:
            pass
        else:
            raise AssertionError(f"{verb} of a missing blob must raise "
                                 "FileNotFoundError")
    assert s.exists("nope/missing.json") is False


def _check_listing(s: CommitStore) -> None:
    s.write("d/x.json", b"1")
    s.write("d/y.json", b"2")
    s.write("d/sub/z.json", b"3")
    s.write("top.json", b"4")
    got = set(s.list_dir("d"))
    assert got == {"x.json", "y.json", "sub"}, (
        f"list_dir returns IMMEDIATE children only, got {got}"
    )
    root = set(s.list_dir(""))
    assert {"d", "top.json"} <= root, (
        f"empty prefix lists the root, got {root}"
    )
    assert s.list_dir("does/not/exist") == [], (
        "a missing directory lists as []"
    )


def _check_delete(s: CommitStore) -> None:
    s.write("del/a.json", b"x")
    s.delete("del/a.json")
    assert not s.exists("del/a.json")
    s.delete("del/a.json")  # missing delete is a no-op (racing vacuums)
    s.delete("del/never-existed.json")


def _check_scoped(s: CommitStore) -> None:
    sub = s.scoped("tables", "t1")
    sub.write("m/v1.json", b"scoped")
    assert s.read("tables/t1/m/v1.json") == b"scoped", (
        "a scoped write must be visible at the parent's joined path"
    )
    s.write("tables/t1/m/v2.json", b"parent")
    assert sub.read("m/v2.json") == b"parent", (
        "a parent write must be visible through the scoped view"
    )
    assert "v1.json" in sub.list_dir("m") and "v2.json" in sub.list_dir("m")
    try:
        sub.write_if_absent("m/v1.json", b"again")
    except StoreConflict:
        pass
    else:
        raise AssertionError("exclusivity must hold through scoped views")


def _check_uri(s: CommitStore) -> None:
    s.write("u/blob.json", b"addr")
    u = s.uri("u/blob.json")
    assert u is None or (isinstance(u, str) and u), (
        "uri is None (driver-side fallback) or a non-empty address"
    )
