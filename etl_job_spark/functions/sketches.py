"""Sketch aggregates — the approximate path for 100 TB cardinality and
quantile questions (SURVEY.md §2.5 notes the engine exposes these at
zero custom cost; exact twins live in the query registry beside them).

- ``approx_count_distinct``: HyperLogLog++, default rsd 5%. One pass,
  fixed memory per group — vs exact countDistinct, which shuffles every
  distinct value.
- ``approx_percentile``: KLL-style quantile sketch with a tunable
  accuracy budget.

These are deliberately NOT oracle-checked: the sketch layouts are
engine-specific (Spark's HLL++ vs DuckDB's HLL give different
estimates for the same data), so the tests bound the error against the
exact answer instead — the property a user actually relies on.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def approx_distinct(col: str | Column, rsd: float = 0.05) -> Column:
    return F.approx_count_distinct(col, rsd)


def approx_quantiles(col: str | Column, probs: list[float], accuracy: int = 10000) -> Column:
    probs_sql = ", ".join(str(p) for p in probs)
    name = col if isinstance(col, str) else col._jc.toString()
    return F.expr(f"approx_percentile({name}, array({probs_sql}), {accuracy})")
