"""Local replica of the driver's DuckDB-oracle comparison
(SURVEY.md §5 item 1): row count + sorted-column schema +
order-insensitive value comparison between a Spark query result and
the equivalent DuckDB SQL on the same parquet tables.

Queries are designed for *exact* value equality (integer-cents sums,
string-formatted dates), so the comparison is exact, not approximate —
a mismatch means a real semantic or determinism bug.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return repr(v)
    if isinstance(v, (int,)):
        return str(v)
    return str(v)


def _normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_cell(v) for v in row))
    out.sort()
    return out


def assert_matches(spark_df, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    spark_pdf = spark_df.toPandas()
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    assert s_cols == o_cols, f"{name}: column mismatch spark={s_cols} oracle={o_cols}"
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s_rows, o_rows = _normalize(spark_pdf), _normalize(oracle_pdf)
    if s_rows != o_rows:
        diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs (spark, oracle): {diffs}")
