"""etl_job_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference ETL system
(JinsupJung/etl-job, surveyed in SURVEY.md) as idiomatic Spark
DataFrame / SQL operators, extended with LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) and
designed for 100 TB scale: declarative plans (Catalyst pushdown /
pruning / join selection), broadcast joins for small dims, explicit
partitioning on merge keys, and no driver-side row loops anywhere.
"""

__version__ = "0.5.0"

from etl_job_spark.catalog import Catalog  # noqa: F401
from etl_job_spark.operators.merge import merge_upsert  # noqa: F401
from etl_job_spark.session import get_spark  # noqa: F401
from etl_job_spark.sources import load_table  # noqa: F401
from etl_job_spark.table import (  # noqa: F401
    CommitConflictError,
    ConstraintViolationError,
    ManifestTable,
    predicate_column,
)
from etl_job_spark.txn import TransactionalCatalog  # noqa: F401
