"""Exact (order-independent) aggregates for cross-engine determinism.

Floating-point SUM depends on summation order, which differs between
Spark partitions and the DuckDB correctness oracle — and between any
two cluster runs. Money columns have fixed decimal scale, so we sum
exact integer cents instead: bit-identical on every engine and every
partitioning, i.e. the property a 100 TB deterministic pipeline
actually needs (equivalent to DecimalType arithmetic, kept as
BIGINT+DOUBLE here for oracle-type parity).

`round(x*scale)` is computed on IEEE doubles identically in Spark and
DuckDB (both round half away from zero for positive doubles), and the
integer sum is exact, so `sum_cents / scale` is bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_sum(col: Column | str, scale: int = 100) -> Column:
    """Order-independent SUM of a fixed-scale decimal stored as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c * scale).cast("bigint")) / F.lit(float(scale))


def money_sum_sql(expr: str, scale: int = 100) -> str:
    """DuckDB SQL equivalent of :func:`money_sum`."""
    return f"sum(CAST(round(({expr}) * {scale}) AS BIGINT)) / {scale}.0"


def qty_sum(col: Column | str) -> Column:
    """Exact SUM of an integral-valued double column (e.g. l_quantity)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("bigint"))


def qty_sum_sql(expr: str) -> str:
    # outer cast: DuckDB's sum(BIGINT) yields HUGEINT, which pandas
    # renders as float64 and would hash-mismatch Spark's bigint
    return f"CAST(sum(CAST({expr} AS BIGINT)) AS BIGINT)"
