from etl_job_spark.functions.exact import money_sum, money_sum_sql, qty_sum, qty_sum_sql  # noqa: F401
