"""File sources beyond parquet: CSV and JSON-lines with EXPLICIT
schemas (SURVEY.md §1.2 — schema inference never runs in production
paths: an inference pass is a full extra scan at 100 TB, and a schema
drift becomes a silent type change instead of a loud error).

Malformed rows follow the same dead-letter pattern as the fetch source
(sources/json_api.py): PERMISSIVE mode routes them to a rescue column
instead of failing the job, and ``split_rescued`` quarantines them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

RESCUE_COL = "_corrupt_record"


def _with_rescue(schema: StructType) -> StructType:
    from pyspark.sql.types import StringType

    return StructType([*schema.fields, StructField(RESCUE_COL, StringType())])


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = True, **options
) -> DataFrame:
    """CSV scan with fixed schema; malformed lines land in the rescue
    column (PERMISSIVE), preserving the raw text for replay."""
    return (
        spark.read.schema(_with_rescue(schema))
        .options(
            header=str(header).lower(),
            mode="PERMISSIVE",
            columnNameOfCorruptRecord=RESCUE_COL,
            **options,
        )
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: StructType, **options) -> DataFrame:
    """JSON-lines scan with fixed schema; missing keys → NULL (the
    reference's dict.get semantics), malformed documents → rescue
    column."""
    return (
        spark.read.schema(_with_rescue(schema))
        .options(mode="PERMISSIVE", columnNameOfCorruptRecord=RESCUE_COL, **options)
        .json(path)
    )


def split_rescued(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined) — same contract as sinks.split_quarantine,
    keyed on the rescue column.

    Spark refuses to filter on the corrupt-record column straight off a
    raw file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN); the documented
    pattern is to materialize first, which also means the file is
    parsed once for both branches."""
    df = df.cache()
    good = df.filter(F.col(RESCUE_COL).isNull()).drop(RESCUE_COL)
    bad = df.filter(F.col(RESCUE_COL).isNotNull())
    return good, bad
