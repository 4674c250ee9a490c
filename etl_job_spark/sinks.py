"""Sink operators (SURVEY.md §2.2).

The reference's write surface is per-row INSERT (K1), per-row UPDATE
(K2, subsumed by merge K3 in operators/merge.py), TRUNCATE+reload
(K4), and per-row audit logging (K5). Set-oriented equivalents:

- K1 append          → ``append``
- K4 truncate+reload → ``overwrite``
- daily-window rewrite (the *_period backfill,
  kicc_to_tb_sales_prod_period.py:133-152) → ``overwrite_partitions``:
  dynamic partition overwrite rewrites ONLY the partitions present in
  the batch — at 100 TB the difference between rewriting two days and
  rewriting the table.
- K5 per-row logging → ``observe``d aggregate metrics: one counter set
  per job instead of one log line per row (per-row logging is the
  reference pathology SURVEY.md §4 says not to replicate).
- §2.10 log-and-continue → ``split_quarantine``: error rows land in a
  dead-letter table with full payload for replay; good rows proceed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def append(df: DataFrame, path: str, partition_by: Sequence[str] | None = None) -> None:
    """K1: append parquet, optionally hive-partitioned (date-partition
    the marts so daily readers prune, SURVEY.md §4)."""
    w = df.write.mode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def overwrite(df: DataFrame, path: str, partition_by: Sequence[str] | None = None) -> None:
    """K4: truncate-and-reload (load_prod_data.py:52-53) as an atomic
    directory overwrite."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def overwrite_inplace(df: DataFrame, path: str, partition_by: Sequence[str] | None = None) -> None:
    """Replace the table at ``path`` with ``df`` even when ``df``'s
    plan READS that same path (Spark can't overwrite a directory a lazy
    plan still scans): stage to a sibling directory, then
    rename-commit. The schema-change twin of
    operators/merge.merge_upsert_path, with the same caveat: a crash
    between the two renames leaves no directory at ``path`` until the
    next call (or ``recover_rename_commit``) restores ``.__old__``.
    Local-FS only; for object stores / concurrent readers use
    ``etl_job_spark.table``."""
    import os
    import shutil

    from etl_job_spark.operators.merge import recover_rename_commit

    recover_rename_commit(path)
    staging = path.rstrip("/") + ".__staging__"
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(staging)
    old = path.rstrip("/") + ".__old__"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old, ignore_errors=True)
    df.sparkSession.catalog.refreshByPath(path)


def overwrite_partitions(df: DataFrame, path: str, partition_by: Sequence[str]) -> None:
    """Rewrite only the partitions present in ``df`` (requires
    ``spark.sql.sources.partitionOverwriteMode=dynamic``, set by
    session.get_spark). The engine's primitive for the reference's
    re-run-a-date-window repair flow: idempotent per partition,
    untouched partitions never read or written."""
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def compact(
    spark,
    path: str,
    target_rows_per_file: int = 1_000_000,
    partition_by: Sequence[str] | None = None,
) -> int:
    """Small-file compaction: rewrite the table into
    ceil(rows / target_rows_per_file) files (per partition when
    partitioned). Incremental merge writers fragment tables — the
    reference's daily upserts would too — and at 100 TB, scan cost is
    dominated by file count once files shrink below ~128 MB. Returns
    the file count written. Atomic via the same rename-commit as
    merge_upsert_path."""
    df = spark.read.parquet(path)
    n = df.count()
    n_files = max(1, -(-n // target_rows_per_file))
    overwrite_inplace(df.repartition(n_files), path, partition_by=partition_by)
    return n_files


def bucketed_write(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    num_buckets: int = 32,
    sort_by: Sequence[str] | None = None,
) -> None:
    """Persist as a bucketed (+ optionally sorted) managed table.

    Two tables bucketed by the same keys into the same bucket count
    join WITHOUT a shuffle — each task reads matching bucket files
    from both sides (verified by plan test: no Exchange under the
    join). This is the at-scale answer for fact⋈fact joins repeated
    every run (e.g. staging⋈mart in the nightly merge): pay the
    bucketing shuffle once at write, never at read. Catalyst uses the
    bucket metadata automatically; sorting additionally removes the
    per-task sort of a sort-merge join."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.format("parquet").saveAsTable(table)


def split_quarantine(
    df: DataFrame, error_col: str = "error"
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined): the dead-letter pattern for per-unit
    failures (fetch errors carry an error column instead of raising,
    sources/json_api.py). Quarantine keeps every column for replay."""
    good = df.filter(F.col(error_col).isNull()).drop(error_col)
    bad = df.filter(F.col(error_col).isNotNull())
    return good, bad


def with_audit(df: DataFrame, name: str = "audit") -> tuple[DataFrame, Observation]:
    """Attach job-level audit metrics (row count, per-column null
    counts) computed inline with whatever action runs next — zero extra
    passes, vs the reference's one log line per row
    (load_sales_data.py:130-133). Read ``observation.get`` after the
    action completes."""
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}") for c in df.columns
    ]
    return df.observe(obs, *metrics), obs
