"""merge_upsert — the reference's core write semantic (SURVEY.md §2 K3).

The reference implements upsert as a per-row exists-probe
(`SELECT COUNT(*) WHERE key = %s`, /root/reference/load_sales_data.py:35-40)
branching to UPDATE or INSERT (load_sales_data.py:129-134). When a
source batch contains the same key twice, the second occurrence hits
the update branch, so the reference's effective policy is
**last-writer-wins by row arrival order**.

Set-oriented Spark equivalent (one job, no per-row round-trips):

1. dedup the source to one row per key — last writer wins, ordered by
   an explicit ``order_col`` (the reference's implicit arrival order is
   made explicit, per SURVEY.md §7 "merge determinism");
2. anti-join the target against the source keys (rows the batch does
   not touch);
3. union the deduped source back in.

Scale notes (100 TB): step 2's join shuffles both sides on the key;
when the target is date-partitioned and the source covers few
partitions (the reference's daily yesterday..today window), restrict
the target scan to those partitions first — ``merge_upsert`` takes an
optional ``partition_pred`` for exactly this, turning a full-table
rewrite into a touched-partitions rewrite (the Delta/Iceberg MERGE
pattern without the table format). The window dedup and the anti-join
share the same key partitioning, so AQE can reuse the exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_last_writer(source: DataFrame, keys: Sequence[str], order_col: str) -> DataFrame:
    """Keep one row per key: the one with the greatest ``order_col``
    (ties broken deterministically by preferring later rows is not
    observable — equal order values pick an arbitrary-but-stable row
    via the extra ordering on all key columns already fixed)."""
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(F.col(order_col).desc())
    return (
        source.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    order_col: str | None = None,
    partition_pred: Column | None = None,
) -> DataFrame:
    """Return target merged with source on ``keys`` (source wins).

    ``order_col``: column in ``source`` defining last-writer-wins for
    intra-batch duplicate keys. If None, the source must already be
    unique per key (enforced lazily by the window only when given).

    ``partition_pred``: predicate selecting the target partitions the
    source can possibly touch; rows outside it pass through untouched
    (concat, no join) — the at-scale fast path.
    """
    if order_col is not None:
        source = dedup_last_writer(source, keys, order_col)
    # align to the target's column set/order: drop source-only columns
    # (e.g. an order_col), and null-fill target-only columns (e.g.
    # enrichment columns a later pass re-derives) with the target dtype
    target_types = dict(target.dtypes)
    source = source.select(
        *[
            F.col(c) if c in source.columns else F.lit(None).cast(target_types[c]).alias(c)
            for c in target.columns
        ]
    )

    if partition_pred is not None:
        untouched = target.filter(~partition_pred)
        target = target.filter(partition_pred)
        kept = target.join(source, on=list(keys), how="left_anti")
        return untouched.unionByName(kept).unionByName(source)

    kept = target.join(source, on=list(keys), how="left_anti")
    return kept.unionByName(source)


def merge_clauses(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    order_col: str | None = None,
    update_cols: Sequence[str] | None = None,
    delete_pred: Column | str | None = None,
    insert_unmatched: bool = True,
    not_matched_by_source_delete: Column | str | bool = False,
) -> DataFrame:
    """MERGE with Delta-style matched clauses — the relational core
    shared by ``ManifestTable.merge``'s clause mode.

    Clause semantics per (deduped) source row:

    - ``delete_pred`` (evaluated on the SOURCE row — the CDC
      ``_deleted``-flag shape, kicc's late voids): a flagged row is a
      DELETE command — its matched target row drops, and it never
      inserts (deleting an absent key is a no-op). NULL = not flagged.
    - ``update_cols``: a matched target row takes the source's values
      for exactly these columns (cast to the target dtype — the
      UPDATE-SET-subset the reference's enrichment layer runs,
      kicc_to_tb_sales.py:109-124); every other column keeps the
      target value. SET expressions see source values only — the
      source row width can be just ``keys + update_cols``.
    - ``update_cols=None``: matched rows are REPLACED whole (upsert).
    - ``insert_unmatched``: un-matched source rows insert as whole
      rows, NULL-filled to the target width (default, the upsert
      contract); False turns the merge into a pure UPDATE-JOIN.
    - ``not_matched_by_source_delete`` (Delta's WHEN NOT MATCHED BY
      SOURCE THEN DELETE — the full-sync shape): target rows whose
      key has NO source row at all are deleted — all of them when
      ``True``, or only those satisfying a predicate over the TARGET
      row. NULL predicate = kept.

    Matched/unmatched is decided against the ORIGINAL target keys, so
    one batch cannot delete a key and then re-insert it (matches
    Delta: each target row is touched by at most one clause).
    """
    if order_col is not None:
        source = dedup_last_writer(source, keys, order_col)
    pred = F.expr(delete_pred) if isinstance(delete_pred, str) else delete_pred
    if pred is not None:
        flagged = F.coalesce(pred, F.lit(False))
        dels = source.filter(flagged).select(*keys).distinct()
        ups = source.filter(~flagged)
    else:
        dels, ups = None, source

    kept = target if dels is None else target.join(dels, on=list(keys), how="left_anti")
    nmbs = not_matched_by_source_delete
    if nmbs is not False and nmbs is not None:
        # a delete-flagged source row still MATCHES its target (and
        # deletes it via the matched clause above), so the by-source
        # test runs against ALL source keys, flagged included
        nm_pred = (
            F.lit(True)
            if nmbs is True
            else (F.expr(nmbs) if isinstance(nmbs, str) else nmbs)
        )
        marked = kept.join(
            source.select(*keys).distinct().withColumn("__in_src", F.lit(True)),
            on=list(keys),
            how="left",
        )
        kept = marked.filter(
            ~(F.col("__in_src").isNull() & F.coalesce(nm_pred, F.lit(False)))
        ).drop("__in_src")
    target_types = dict(target.dtypes)
    if update_cols is None:
        merged = merge_upsert(kept, ups, keys)
        if insert_unmatched:
            return merged
        # pure whole-row UPDATE of matched keys: drop the source rows
        # that found no target partner
        return merge_upsert(
            kept, ups.join(target.select(*keys), on=list(keys), how="left_semi"), keys
        )

    ucols = list(dict.fromkeys(update_cols))
    bad = [c for c in ucols if c in keys or c not in target_types]
    if bad:
        raise ValueError(
            f"when_matched_update columns {bad}: must be non-key target columns"
        )
    missing = [c for c in ucols if c not in ups.columns]
    if missing:
        raise ValueError(f"when_matched_update: source lacks columns {missing}")
    # marker column (not NULL-ness of a source value: a source NULL is
    # a legitimate SET NULL) decides matched-ness after the left join
    src = ups.select(
        *[F.col(k) for k in keys],
        *[F.col(c).cast(target_types[c]).alias(f"__src_{c}") for c in ucols],
        F.lit(True).alias("__matched"),
    )
    uset = set(ucols)
    updated = kept.join(src, on=list(keys), how="left").select(
        *[
            F.when(F.col("__matched"), F.col(f"__src_{c}")).otherwise(F.col(c)).alias(c)
            if c in uset
            else F.col(c)
            for c in target.columns
        ]
    )
    if not insert_unmatched:
        return updated
    inserts = ups.join(target.select(*keys), on=list(keys), how="left_anti").select(
        *[
            F.col(c).cast(target_types[c]).alias(c)
            if c in ups.columns
            else F.lit(None).cast(target_types[c]).alias(c)
            for c in target.columns
        ]
    )
    return updated.unionByName(inserts)


def recover_rename_commit(target_path: str) -> bool:
    """Repair a half-finished rename-commit at ``target_path``.

    The rename-commit sequence (stage → rename target to ``.__old__`` →
    rename staging to target → delete old) has a crash window between
    the two renames where no directory exists at ``target_path`` and
    the previous table sits stranded in ``.__old__``. Call this before
    reading or re-merging: if the target is missing but ``.__old__``
    exists, the old table is restored (the interrupted merge simply
    never happened — the merge is re-runnable). Leftover staging
    directories are always removed. Returns True if a restore happened.
    """
    import os
    import shutil

    old = target_path.rstrip("/") + ".__old__"
    staging = target_path.rstrip("/") + ".__staging__"
    restored = False
    if not os.path.exists(target_path) and os.path.exists(old):
        os.rename(old, target_path)
        restored = True
    shutil.rmtree(staging, ignore_errors=True)
    if os.path.exists(target_path):
        shutil.rmtree(old, ignore_errors=True)
    return restored


def merge_upsert_path(
    spark,
    target_path: str,
    source: DataFrame,
    keys: Sequence[str],
    order_col: str | None = None,
    partition_by: Sequence[str] | None = None,
) -> None:
    """Merge ``source`` into the parquet table at ``target_path``.

    Parquet directories can't be overwritten while a lazy plan still
    reads them, so the merge lands in a sibling staging directory that
    replaces the target via two renames (same idea as Spark's own file
    commit protocol). NOT fully atomic: a crash between the renames
    leaves no table at ``target_path`` (the previous data is stranded
    in ``.__old__``) — ``recover_rename_commit`` runs first and repairs
    exactly that state, so a rerun after any crash is safe. ``os.rename``
    also doesn't exist on object stores; for concurrent readers or
    S3-like storage use ``etl_job_spark.table`` (manifest-committed
    table) instead — this path is the simple local-FS variant.
    """
    import os
    import shutil

    recover_rename_commit(target_path)
    if os.path.exists(target_path):
        target = spark.read.parquet(target_path)
        merged = merge_upsert(target, source, keys, order_col=order_col)
    else:
        merged = dedup_last_writer(source, keys, order_col) if order_col else source

    staging = target_path.rstrip("/") + ".__staging__"
    writer = merged.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)

    old = target_path.rstrip("/") + ".__old__"
    if os.path.exists(target_path):
        os.rename(target_path, old)
    os.rename(staging, target_path)
    shutil.rmtree(old, ignore_errors=True)
    # drop any cached file listing for the replaced directory
    spark.catalog.refreshByPath(target_path)
