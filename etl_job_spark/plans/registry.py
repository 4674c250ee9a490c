"""Single import point that materializes the full query registry.

Importing this module imports every query-defining module so their
``@query`` decorators run; ``QUERIES``/``ORACLE`` are then complete.
"""

from etl_job_spark.plans.queries import ORACLE, QUERIES  # noqa: F401
import etl_job_spark.plans.analytics  # noqa: F401,E402
import etl_job_spark.plans.llm_ops  # noqa: F401,E402
