from etl_job_spark.sources.catalog import load_table, load_tables  # noqa: F401
