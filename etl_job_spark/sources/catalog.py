"""Parquet-backed table catalog (SURVEY.md §2.1 S2/S3).

The reference scans MySQL tables (full scan kicc_to_tb_sales.py:67,
range scan kicc_to_tb_sales_prod.py:63-70); here every table is a
Parquet directory read with an explicit select so Catalyst prunes
columns at the scan and pushes filters into the Parquet reader. At
cluster scale the same call reads a partitioned table
(``partitionBy(sale_dy)`` on write → partition pruning on read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_job_spark.schemas import DRIVER_TABLES

TABLE_NAMES = list(DRIVER_TABLES)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table. Filters/projections applied by the caller
    reach the scan via Catalyst (verified in tests via explain())."""
    if name not in DRIVER_TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    if name == "events":
        # generator-dependent ts physical type: some driver rounds land
        # TIMESTAMP(NANOS), which a default session rejects
        # (PARQUET_TYPE_ILLEGAL) — read it as long and convert below.
        # Set here, not only in session.py: the driver calls queries()
        # with its OWN SparkSession. The UTC pin rides along for the
        # same reason — the NTZ→timestamp cast below is wall-clock-
        # preserving only under a UTC session, and a driver session
        # in a non-UTC zone would silently shift every ts
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    ts_type = dict(df.dtypes).get("ts") if name == "events" else None
    if ts_type == "bigint":
        # TIMESTAMP(NANOS) read as long (nanosAsLong) → micros timestamp,
        # matching DuckDB's epoch_us() floor semantics
        # integer div: ns values exceed double's 2^53 exact range
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # TIMESTAMP(MICROS, isAdjustedToUTC=false) reads as NTZ; cast to
        # TimestampType so time arithmetic (unix_micros, windows) sees
        # ONE type whichever physical form the generator used. The
        # session timezone is pinned UTC (session.py), so the cast is
        # wall-clock-preserving and matches DuckDB's naive reading.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}
