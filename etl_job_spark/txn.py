"""Cross-table transactions over ManifestTables — the catalog-service
layer production borrows from Delta/Nessie, reduced to its core.

A single ``ManifestTable`` commit is already atomic, but the
reference's E1→E2 flow moves TWO tables together (staging upsert, then
mart rebuild — ``load_sales_data.py`` then ``kicc_to_tb_sales.py``):
a crash between the two leaves a mart that disagrees with its staging.
This module makes a multi-table change one atomic event:

- **the transaction log is the commit point.** A transaction runs its
  table ops normally (reads, prunes, data-file writes all happen), but
  each table's final manifest is CAPTURED instead of published
  (``ManifestTable._capture``). The captured manifests — full content —
  go into one transaction record, published to ``_txns/t%09d.json``
  with the same put-if-absent link primitive manifests use. That one
  link IS the commit: before it, no table changed; after it, every
  table's new version is durable.
- **ops on one table CHAIN.** A second op on the same table reads the
  first op's captured state through the instance's pending-manifest
  overlay (``ManifestTable._pending`` — transaction-private; every
  other reader still resolves the published table), and the record
  stages the whole manifest chain, applied oldest-first on replay.
  This is the reference's multi-statement transaction: three
  enrichment UPDATEs under one ``connection.commit()``
  (kicc_to_tb_sales.py:102-136) land as one record via
  ``sql.execute_dml_txn``.
- **roll-forward makes the record effective.** Publishing the per-table
  manifest files is mechanical replay of the record, performed by
  ``roll_forward()`` — run by every subsequent commit/read, so a crash
  after the commit point heals on the next touch (write-ahead intent +
  idempotent apply).
- **conflicts resolve deterministically from the log alone.** Records
  are totally ordered by id. Replaying from the start, a record
  APPLIES iff every table's ``expected_base`` equals that table's
  version after all earlier applied records (a table's first record
  fixes its starting version); otherwise it is ABORTED — a pure
  function of the log prefix, so every process, now or later, reaches
  the same verdict with no coordination. A committer whose record lost
  (raced to the same base) sees that after its own roll-forward and
  re-runs its ops against the new state — the same optimistic loop as
  single-table commits, lifted to the catalog.

Contract: tables enrolled in a catalog are written THROUGH it.
``_apply`` fails loudly if a version slot holds foreign content (an
out-of-band writer), rather than guessing. Scale bounds: a manifest
whose serialized form passes ``_TXN_INLINE_MAX_BYTES`` is SPILLED to
an immutable staged file under ``_txns/_staged/`` (written + fsynced
BEFORE the record publishes, so a record in the log always resolves)
and the record carries ``manifest_ref`` instead — txn records stay
O(1) in table size, the same reference-not-value move the manifest
log itself makes with checkpoint deltas. Aborted records may leave
orphan staged files (O(aborted transactions), reclaimable like any
unreferenced data file). Commit throughput is serialized on the log
head — exactly the coordinator's job (Nessie's single ref head);
data-plane work stays fully parallel, and data files written by an
aborted attempt are unreferenced and vacuum-reclaimed.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from etl_job_spark.commit_store import CommitStore, LocalFSCommitStore, StoreConflict
from etl_job_spark.table import (
    _MANIFEST_DIR,
    CommitConflictError,
    ManifestTable,
    _manifest_name,
)

_TXN_DIR = "_txns"
_TXN_STAGE_DIR = os.path.join(_TXN_DIR, "_staged")

# a staged-table manifest larger than this (serialized) is spilled to
# an immutable file under _txns/_staged/ and carried by reference —
# records over a 100k-file table stay O(1), not O(table files)
_TXN_INLINE_MAX_BYTES = 65_536

# commit() publishes a log checkpoint once this many records have
# accumulated past the previous checkpoint — cross-process replay
# stays O(interval), the same bound the manifest log's delta
# checkpoints give a single table
_TXN_CHECKPOINT_INTERVAL = 16


def _txn_name(txn_id: int) -> str:
    return f"t{txn_id:09d}.json"


def _ckpt_name(upto: int) -> str:
    return f"c{upto:09d}.json"


class Transaction:
    """Collects one committed-together group of table ops. Obtained
    from ``TransactionalCatalog.commit``'s callback. Multiple ops on
    the SAME table CHAIN: each op reads its predecessor's
    captured-but-unpublished state through the instance's pending
    overlay (``ManifestTable._pending``), and the record stages the
    whole manifest chain — the multi-statement-per-table shape the
    reference's enrichment flow commits as one unit
    (kicc_to_tb_sales.py:102-136: two UPDATE-JOINs + a constant
    backfill under a single connection.commit())."""

    def __init__(self, catalog: "TransactionalCatalog"):
        self._catalog = catalog
        self.staged: dict[str, dict] = {}
        # one instance per table for the transaction's lifetime: the
        # pending-manifest overlay lives on the instance, so chained
        # ops must share it (catalog readers get fresh instances and
        # never see it)
        self._tables: dict[str, ManifestTable] = {}

    def _table(self, name: str) -> ManifestTable:
        t = self._tables.get(name)
        if t is None:
            t = self._catalog.table(name)
            self._tables[name] = t
        return t

    def _run(self, name: str, op: Callable[[ManifestTable], int]) -> None:
        table = self._table(name)
        captured: list[tuple[int, dict]] = []

        def _cap(v: int, m: dict) -> None:
            captured.append((v, m))
            # visible to THIS transaction's later ops on the table —
            # and only to them
            table._pending[v] = m

        table._capture = _cap
        try:
            op(table)
        finally:
            table._capture = None
            # _commit caches entries for the captured (unpublished)
            # version; drop them — the version becomes real only if
            # this transaction's record applies (later chained reads
            # re-resolve through the pending overlay)
            for v, _ in captured:
                table._files_cache.pop(v, None)
        if not captured:
            return  # op was a no-op (e.g. delete matched nothing)
        if len(captured) != 1:  # pragma: no cover - single-commit ops only
            raise AssertionError(f"op on {name!r} captured {len(captured)} commits")
        version, manifest = captured[0]
        entry = self.staged.get(name)
        if entry is None:
            self.staged[name] = {
                "expected_base": manifest["base_version"],
                "version": version,
                "manifests": [manifest],
            }
            return
        if manifest["base_version"] != entry["version"]:  # pragma: no cover
            raise AssertionError(
                f"chained op on {name!r} based on {manifest['base_version']}"
                f", expected {entry['version']}"
            )
        entry["version"] = version
        entry["manifests"].append(manifest)

    # -- the op surface (each mirrors the ManifestTable method) -------

    def overwrite(
        self,
        name: str,
        df: DataFrame,
        partition_by: Sequence[str] | None = None,
        bloom_cols: Sequence[str] | None = None,
    ) -> None:
        self._run(name, lambda t: t.overwrite(df, partition_by, bloom_cols))

    def append(self, name: str, df: DataFrame) -> None:
        self._run(name, lambda t: t.append(df))

    def merge(
        self,
        name: str,
        spark: SparkSession,
        source: DataFrame,
        keys: Sequence[str],
        order_col: str | None = None,
        txn: tuple[str, int] | None = None,
        **kw,
    ) -> None:
        # **kw forwards the matched clauses (when_matched_update /
        # when_matched_delete / insert_unmatched /
        # not_matched_by_source_delete) so enrichment UPDATE-JOINs run
        # inside the log like every other write
        self._run(
            name, lambda t: t.merge(spark, source, keys, order_col, txn=txn, **kw)
        )

    def update_where(self, name: str, spark: SparkSession, set, where) -> None:
        """Row-level UPDATE inside the log (same rule as every verb
        here: an enrolled table must never be updated directly on the
        ManifestTable — replay tracks versions purely from the log)."""
        self._run(name, lambda t: t.update_where(spark, set, where))

    def sql(self, name: str, spark: SparkSession, statement: str) -> None:
        """One SQL DML/DDL statement against an enrolled table, inside
        the log — the ``execute_dml`` surface routed through the
        transaction's captured table instance, so a statement LIST on
        one table chains (each statement reads its predecessor's
        uncommitted state) and commits as ONE record. Catalog table
        names inside statement BODIES (INSERT … SELECT, CTAS, MERGE …
        USING) resolve through this transaction's instances too — a
        body reading a table an earlier statement in the SAME
        transaction wrote sees the staged state, exactly like chained
        ops on one table. VACUUM refuses: it deletes files immediately
        and cannot be staged."""
        if statement.strip().upper().startswith("VACUUM"):
            raise ValueError(
                "VACUUM cannot run inside a transaction: it deletes data "
                "files immediately (nothing to stage or roll back) — run "
                "it directly after the transaction commits"
            )
        from etl_job_spark.sql import _view_resolver, execute_dml

        # catalog VIEWS resolve inside bodies too — over the
        # transaction's table instances, so a view read mid-transaction
        # sees staged state exactly like a direct table reference
        resolve = _view_resolver(spark, self.resolve, self._catalog.view_sql)
        self._run(
            name, lambda t: execute_dml(spark, t, statement, resolve=resolve)
        )

    def resolve(self, name: str) -> "ManifestTable | None":
        """Resolver over this transaction's table instances — the
        ``execute_dml``/``_routed_select`` contract: the enrolled
        table when it has a committed (or txn-staged) version, else
        ``None`` (the name passes through to registered views)."""
        try:
            t = self._table(name)
        except ValueError:
            return None
        return t if t.latest_version() is not None else None

    def delete_where(self, name: str, spark: SparkSession, predicate, **kw) -> None:
        self._run(name, lambda t: t.delete_where(spark, predicate, **kw))

    def delete_keys(
        self, name: str, spark: SparkSession, key_col: str, values: Sequence, **kw
    ) -> None:
        self._run(name, lambda t: t.delete_keys(spark, key_col, values, **kw))

    def compact_small_files(
        self,
        name: str,
        spark: SparkSession,
        target_rows_per_file: int = 1_000_000,
        small_file_rows: int | None = None,
    ) -> None:
        """Upkeep INSIDE the log: an enrolled table must never be
        compacted directly on the ManifestTable — replay tracks
        versions purely from the log, so an out-of-band commit makes
        every later transaction's expected_base look like a lost race
        (deterministic abort, forever). Stages nothing when the table
        has no fragmentation worth rewriting."""
        self._run(
            name,
            lambda t: t.compact_small_files(spark, target_rows_per_file, small_file_rows),
        )


class TransactionalCatalog:
    """Tables under one root directory + the transaction log that
    commits changes to any subset of them atomically."""

    _COMMIT_RETRIES = 3

    def __init__(self, root: str, store: "CommitStore | None" = None):
        self.root = root.rstrip("/")
        self.txn_dir = os.path.join(self.root, _TXN_DIR)
        # control-plane blob store for the log (records, checkpoints,
        # manifest spills) — same contract as ManifestTable.store;
        # enrolled tables get scoped views of it, so one backend (and,
        # for test doubles, one fault schedule) covers the catalog
        self.store: CommitStore = store or LocalFSCommitStore(self.root)
        # published records are immutable → cache parses for the
        # instance's lifetime; _applied tracks (table, version) pairs
        # this instance already verified on disk, so repeated
        # roll_forward calls do O(new records) work, not O(history).
        # Cross-process opens replay from the newest LOG CHECKPOINT
        # (published by commit() every _TXN_CHECKPOINT_INTERVAL
        # records), so they are O(interval) too; vacuum() reclaims the
        # records and spill files a checkpoint makes dead.
        self._txn_cache: dict[int, dict] = {}
        self._applied: set[tuple[str, int]] = set()
        # spilled-manifest cache: staged files are immutable once a
        # record referencing them publishes
        self._staged_cache: dict[str, dict] = {}

    # -- persistent views ----------------------------------------------
    # A view is STATEMENT TEXT stored in the catalog (`_views/<name>`),
    # re-resolved at every read — Hive/Delta's persistent-view
    # semantics: the view always sees the CURRENT committed state of
    # the tables it names, and it survives sessions because the text
    # lives in the store, not in any SparkSession. Underscore prefix
    # keeps the registry invisible to SHOW TABLES' root listing.

    _VIEWS_DIR = "_views"

    def create_view(self, name: str, body_sql: str, replace: bool = False) -> None:
        """Store ``name`` as a persistent view over ``body_sql`` (a
        SELECT/WITH statement resolved through this catalog at read
        time). Refuses a name the catalog already uses for a TABLE —
        tables win at resolution, so a shadowed view would be a trap
        that silently reads the wrong relation."""
        if "/" in name or name.startswith("_"):
            raise ValueError(f"invalid view name {name!r}")
        if not body_sql.strip().upper().startswith(("SELECT", "WITH")):
            raise ValueError("a view body must be a SELECT/WITH statement")
        t = self.table(name)
        if t.latest_version() is not None:
            raise ValueError(
                f"{name!r} is an enrolled TABLE of this catalog — a view "
                "of the same name could never be read (tables win at "
                "resolution); pick another name"
            )
        rel = os.path.join(self._VIEWS_DIR, f"{name}.json")
        payload = json.dumps({"name": name, "sql": body_sql}).encode()
        if replace:
            self.store.write(rel, payload)
            return
        try:
            self.store.write_if_absent(rel, payload)
        except StoreConflict:
            raise ValueError(
                f"view {name!r} already exists — use CREATE OR REPLACE VIEW"
            ) from None

    def view_sql(self, name: str) -> str | None:
        """The stored statement text of view ``name``, or ``None``."""
        if "/" in name or name.startswith("_"):
            return None
        try:
            raw = self.store.read(
                os.path.join(self._VIEWS_DIR, f"{name}.json")
            )
        except FileNotFoundError:
            return None
        return json.loads(raw)["sql"]

    def drop_view(self, name: str, if_exists: bool = False) -> None:
        # same validation as create_view/view_sql (ADVICE r13 #3: a
        # name like '../tbl/m/v1' must never reach store.delete and
        # escape the views namespace through the Python API)
        if "/" in name or name.startswith("_"):
            raise ValueError(f"invalid view name {name!r}")
        rel = os.path.join(self._VIEWS_DIR, f"{name}.json")
        if not self.store.exists(rel):
            if if_exists:
                return
            raise ValueError(f"view {name!r} does not exist")
        self.store.delete(rel)

    def views(self) -> list[str]:
        """Names of every stored persistent view."""
        return sorted(
            n[:-5]
            for n in self.store.list_dir(self._VIEWS_DIR)
            if n.endswith(".json")
        )

    def table(self, name: str) -> ManifestTable:
        if "/" in name or name.startswith("_"):
            raise ValueError(f"invalid table name {name!r}")
        return ManifestTable(
            os.path.join(self.root, name), store=self.store.scoped(name)
        )

    # -- log plumbing -------------------------------------------------

    def _txn_ids(self) -> list[int]:
        out = []
        for n in self.store.list_dir(_TXN_DIR):
            if n.startswith("t") and n.endswith(".json"):
                out.append(int(n[1:-5]))
        return sorted(out)

    def _read_txn(self, txn_id: int) -> dict:
        cached = self._txn_cache.get(txn_id)
        if cached is None:
            cached = json.loads(
                self.store.read(os.path.join(_TXN_DIR, _txn_name(txn_id)))
            )
            self._txn_cache[txn_id] = cached
        return cached

    def _publish_txn(self, txn_id: int, record: dict) -> None:
        try:
            # put-if-absent: THE commit point, delegated to the store
            self.store.write_if_absent(
                os.path.join(_TXN_DIR, _txn_name(txn_id)),
                json.dumps(record, indent=1, sort_keys=True).encode(),
            )
        except StoreConflict:
            raise CommitConflictError(
                f"transaction id {txn_id} claimed by another committer"
            ) from None

    def _load_ref(self, ref: str) -> dict:
        cached = self._staged_cache.get(ref)
        if cached is None:
            cached = json.loads(self.store.read(ref))
            self._staged_cache[ref] = cached
        return cached

    def _staged_manifests(self, staged: dict) -> list[dict]:
        """The manifest CHAIN a record stages for one table (oldest
        first) — inline content, or resolved through ``manifest_ref``
        spill files (written + fsynced before the record's commit
        point, so a published record always resolves). Single-op
        records keep the pre-chain shape (one ``manifest`` /
        ``manifest_ref`` key) for log compatibility."""
        if "manifests" in staged:
            return [
                e["manifest"] if "manifest" in e else self._load_ref(e["manifest_ref"])
                for e in staged["manifests"]
            ]
        if "manifest" in staged:
            return [staged["manifest"]]
        return [self._load_ref(staged["manifest_ref"])]

    def _apply(self, name: str, staged: dict) -> None:
        """Idempotently publish one table's manifest chain from an
        applied record, oldest first (a delta manifest resolves
        through its base, so the chain order is the only publishable
        order). A taken slot must hold THIS record's content (another
        process already applied it); anything else is an out-of-band
        writer violating the enrolled-tables contract — fail loudly."""
        table = self.table(name)
        for manifest in self._staged_manifests(staged):
            if (name, manifest["version"]) in self._applied:
                continue  # verified on disk earlier in this instance's life
            rel = os.path.join(_MANIFEST_DIR, _manifest_name(manifest["version"]))
            if not table.store.exists(rel):
                try:
                    table.store.write_if_absent(
                        rel, json.dumps(manifest, indent=1, sort_keys=True).encode()
                    )
                except StoreConflict:
                    pass  # racing roll-forward of the same record
            existing = json.loads(table.store.read(rel))
            if existing != manifest:
                raise RuntimeError(
                    f"table {name!r} version {manifest['version']} holds "
                    "content not from the transaction log — enrolled tables "
                    "must be written through the catalog"
                )
            self._applied.add((name, manifest["version"]))

    def _ckpt_ids(self) -> list[int]:
        out = []
        for n in self.store.list_dir(_TXN_DIR):
            if n.startswith("c") and n.endswith(".json"):
                out.append(int(n[1:-5]))
        return sorted(out)

    def _latest_checkpoint(self) -> tuple[int, dict]:
        """(upto, state) of the newest log checkpoint — (0, {}) when
        none exists. The state dict is the FULL replay state through
        record ``upto``, including tables whose only appearance was in
        an aborted record (their pinned starting version participates
        in later apply/abort verdicts)."""
        ids = self._ckpt_ids()
        if not ids:
            return 0, {}
        ck = json.loads(self.store.read(os.path.join(_TXN_DIR, _ckpt_name(ids[-1]))))
        return int(ck["upto"]), dict(ck["state"])

    def _replay(self) -> tuple[dict[str, int | None], int]:
        """Replay from the newest checkpoint: (full state, last record
        id seen). Publishes every applied record's manifests on the
        way (idempotent).

        A concurrent ``vacuum`` may delete a record (or its manifest
        spill) we LISTED against an older checkpoint — but it only ever
        deletes records at or below a published checkpoint's upto, so
        the deletion proves a newer checkpoint covers them. Restart
        from scratch: the fresh ``_latest_checkpoint``/``_txn_ids``
        pass sees the new checkpoint and no longer needs the dead
        files. Bounded retries — each restart requires another racing
        checkpoint+vacuum to have landed mid-pass."""
        for _ in range(8):
            try:
                return self._replay_once()
            except FileNotFoundError:
                self._txn_cache.clear()
                self._staged_cache.clear()
                continue
        return self._replay_once()

    def _replay_once(self) -> tuple[dict[str, int | None], int]:
        upto, state = self._latest_checkpoint()
        last = upto
        for txn_id in self._txn_ids():
            if txn_id <= upto:
                continue  # covered by the checkpoint
            last = txn_id
            rec = self._read_txn(txn_id)
            tables = rec["tables"]
            for name, staged in tables.items():
                state.setdefault(name, staged["expected_base"])
            if any(
                state[name] != staged["expected_base"]
                for name, staged in tables.items()
            ):
                continue  # deterministically aborted
            for name, staged in tables.items():
                self._apply(name, staged)
                state[name] = self._staged_version(staged)
        return state, last

    def roll_forward(self) -> dict[str, int]:
        """Replay the log, publishing every APPLIED record's manifests;
        returns each table's current version. Deterministic: apply/abort
        depends only on the log prefix (see module docstring), so any
        process crashes included arrives at the same state. Replay
        starts from the newest log CHECKPOINT, so a fresh process does
        O(records since checkpoint) work, not O(history)."""
        state, _last = self._replay()
        return {k: v for k, v in state.items() if v is not None}

    def checkpoint(self) -> int | None:
        """Publish a log checkpoint covering every current record;
        returns its upto id (None on an empty log). Content is a pure
        function of the log prefix, so racing checkpointers write
        byte-identical files and the put-if-absent link can treat
        EEXIST as success. Applied records' manifests are published
        before the checkpoint lands (\\_replay applies on the way), so
        a reader trusting the checkpoint never needs a pre-checkpoint
        record again — which is what makes ``vacuum`` sound."""
        state, last = self._replay()
        if last == 0:
            return None
        if last in self._ckpt_ids():
            return last  # already covered
        try:
            self.store.write_if_absent(
                os.path.join(_TXN_DIR, _ckpt_name(last)),
                json.dumps(
                    {"upto": last, "state": state}, indent=1, sort_keys=True
                ).encode(),
            )
        except StoreConflict:
            pass  # a racing checkpointer wrote the identical content
        return last

    def vacuum(self, grace_seconds: float = 3600.0) -> int:
        """Reclaim log space made dead by the newest checkpoint:
        records at or below its upto id, earlier checkpoints, and
        staged-manifest spill files no retained record references.
        Returns the number of files removed. Safe because replay never
        reads below the newest checkpoint and every applied record's
        manifests were published before that checkpoint landed.

        ``grace_seconds`` protects the commit protocol's intentional
        write-before-publish window: a concurrent committer spills its
        manifest (fsynced) BEFORE linking the record that references
        it, so a spill file younger than the grace period may belong
        to an in-flight commit and is never touched — deleting it
        would leave a published record unresolvable forever (the same
        retention reasoning as data-file vacuum on any optimistic
        table format)."""
        upto, _state = self._latest_checkpoint()
        removed = 0
        if upto:
            for txn_id in self._txn_ids():
                if txn_id <= upto:
                    self.store.delete(os.path.join(_TXN_DIR, _txn_name(txn_id)))
                    self._txn_cache.pop(txn_id, None)
                    removed += 1
            for ck in self._ckpt_ids():
                if ck < upto:
                    self.store.delete(os.path.join(_TXN_DIR, _ckpt_name(ck)))
                    removed += 1
        live_refs: set[str | None] = set()
        for txn_id in self._txn_ids():
            for staged in self._read_txn(txn_id)["tables"].values():
                for e in staged.get("manifests") or [staged]:
                    live_refs.add(e.get("manifest_ref"))
        import time as _time

        now = _time.time()
        for n in self.store.list_dir(_TXN_STAGE_DIR):
            ref = os.path.join(_TXN_STAGE_DIR, n)
            if ref in live_refs:
                continue
            try:
                if now - self.store.mtime(ref) < grace_seconds:
                    continue  # possibly an in-flight commit's spill
                self.store.delete(ref)
            except OSError:
                continue  # racing vacuum/committer: skip
            self._staged_cache.pop(ref, None)
            removed += 1
        return removed

    @staticmethod
    def _staged_version(staged: dict) -> int:
        """Version a staged entry commits — available WITHOUT loading a
        spilled manifest (replay stays O(records), not O(spill bytes));
        pre-spill records fall back to the inline manifest."""
        v = staged.get("version")
        return int(v) if v is not None else staged["manifest"]["version"]

    # -- the commit loop ----------------------------------------------

    def commit(self, ops: Callable[[Transaction], None]) -> dict[str, int]:
        """Run ``ops`` (a callback staging writes on the Transaction)
        and commit them atomically; returns the new version of every
        touched table. ``ops`` may run more than once — it re-executes
        against fresh state when the transaction loses a race, the
        catalog-level mirror of ``_with_commit_retries``."""
        marker = uuid.uuid4().hex
        for _ in range(self._COMMIT_RETRIES + 1):
            self.roll_forward()
            ck_upto = self._latest_checkpoint()[0]
            if sum(1 for i in self._txn_ids() if i > ck_upto) >= _TXN_CHECKPOINT_INTERVAL:
                ck_upto = self.checkpoint() or ck_upto
            txn = Transaction(self)
            ops(txn)
            if not txn.staged:
                return {}
            for name, staged in txn.staged.items():
                for m in staged["manifests"]:
                    m.setdefault("txn", {})["marker"] = marker
            record_tables = {
                name: self._spill_if_large(name, staged, marker)
                for name, staged in txn.staged.items()
            }
            ids = self._txn_ids()
            record = {
                # ids keep increasing across a vacuumed (empty) record
                # dir — the checkpoint pins the high-water mark
                "id": max((ids[-1] + 1) if ids else 1, ck_upto + 1),
                "marker": marker,
                "tables": record_tables,
            }
            try:
                self._publish_txn(record["id"], record)
            except CommitConflictError:
                continue  # lost the id race; re-run ops on fresh state
            state = self.roll_forward()
            applied = all(
                self._committed_marker(name, staged["version"]) == marker
                for name, staged in txn.staged.items()
            )
            if applied:
                return {n: s["version"] for n, s in txn.staged.items()}
            # our record landed in the log but lost to an earlier id
            # touching the same base — deterministically aborted;
            # re-run ops against the rolled-forward state
        raise CommitConflictError(
            f"transaction against {self.root} lost {self._COMMIT_RETRIES + 1} "
            "races; retry later"
        )

    def _spill_one(self, name: str, manifest: dict, marker: str, body: str) -> str:
        """Write one manifest to an immutable spill file NOW — before
        the record (the commit point) can reference it. Unique per
        attempt: a retried commit (same marker) must never overwrite a
        file an earlier, aborted-but-published record references."""
        ref = os.path.join(
            _TXN_STAGE_DIR, f"{marker}-{uuid.uuid4().hex[:8]}-{name}.json"
        )
        self.store.write(ref, body.encode())
        self._staged_cache[ref] = manifest
        return ref

    def _spill_if_large(self, name: str, staged: dict, marker: str) -> dict:
        """The record-side form of one staged table: each manifest in
        the chain inline when small, else a ``manifest_ref`` spill.
        Single-op stages keep the pre-chain record shape (one
        ``manifest``/``manifest_ref`` key) so logs written by this
        engine stay readable by its earlier versions and vice versa."""
        entry = {
            "expected_base": staged["expected_base"],
            "version": staged["version"],
        }
        manifests = staged["manifests"]
        if len(manifests) == 1:
            manifest = manifests[0]
            body = json.dumps(manifest, sort_keys=True)
            if len(body) <= _TXN_INLINE_MAX_BYTES:
                entry["manifest"] = manifest
            else:
                entry["manifest_ref"] = self._spill_one(name, manifest, marker, body)
            return entry
        chain: list[dict] = []
        for manifest in manifests:
            body = json.dumps(manifest, sort_keys=True)
            if len(body) <= _TXN_INLINE_MAX_BYTES:
                chain.append({"manifest": manifest})
            else:
                chain.append(
                    {"manifest_ref": self._spill_one(name, manifest, marker, body)}
                )
        entry["manifests"] = chain
        return entry

    def _committed_marker(self, name: str, version: int) -> str | None:
        rel = os.path.join(_MANIFEST_DIR, _manifest_name(version))
        try:
            raw = json.loads(self.table(name).store.read(rel))
        except OSError:
            return None
        return (raw.get("txn") or {}).get("marker")
