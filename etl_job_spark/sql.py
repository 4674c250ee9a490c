"""SQL interface: the driver tables as temp views, so engine users can
write plain Spark SQL against the same catalog the DataFrame operators
use (the reference's consumers are SQL users; this is their migration
path — `spark.sql` over the same data, same Catalyst plans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_job_spark.sources.catalog import TABLE_NAMES, load_table


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Create/replace one temp view per driver table (events arrives
    with its nanos→timestamp normalization already applied)."""
    for name in names or TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Register views, then run one Spark SQL statement against them."""
    register_views(spark, sf_dir)
    return spark.sql(sql)
