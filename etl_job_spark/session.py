"""SparkSession factory with scale-oriented defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads),
but every setting here is chosen so the same plan shape survives a
1000-executor cluster:

- AQE on: runtime partition coalescing + skew-join splitting (the
  reference's head-office store code concentrates volume,
  SURVEY.md §7 "composite-key skew").
- Arrow on: every Python-side operator (mapInPandas fetch source,
  pandas UDF paths) moves batches, never rows.
- UTC session timezone: deterministic date semantics vs the DuckDB
  correctness oracle.
- shuffle.partitions sized by env; on a real cluster this would be
  set to ~2-3x total cores or left to AQE's coalescing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "etl-job-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # events.parquet carries TIMESTAMP(NANOS); read as long, the
        # catalog converts to TimestampType (micros) on load
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", "/tmp/etl_job_spark_warehouse")
        .config("spark.driver.extraJavaOptions", "-Dderby.system.home=/tmp/etl_job_spark_derby")
    )
    return builder.getOrCreate()
