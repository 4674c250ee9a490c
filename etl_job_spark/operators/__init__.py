from etl_job_spark.operators.merge import merge_upsert  # noqa: F401
