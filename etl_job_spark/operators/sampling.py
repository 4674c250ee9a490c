"""Training-mix sampling: deterministic splits and per-group caps.

A corpus pipeline needs reproducible subset selection — train/val/test
splits that never move when the job reruns or the cluster repartitions,
and per-source caps that keep one domain from dominating the mix. Both
are pure-SQL shapes (no RNG state, no sampling operator):

- **deterministic split**: bucket = md5(id) mod N. A cryptographic
  hash of the stable id is uniform and engine-portable (md5 is
  bit-identical in Spark and the DuckDB oracle), so membership is a
  property of the ROW, not of execution: adding documents never
  reshuffles existing assignments — the invariant `sample()` and RNG
  seeds cannot give, and the reason training pipelines split on
  content hashes.
- **per-group cap**: row_number over (group, stable order) <= K. One
  shuffle on the group key; ordering by a hash of the id takes a
  uniform random-looking K per group rather than the first K by id.

Scale: both are single-shuffle (the cap's window) or shuffle-free (the
split is a projection). The split composes with partitioned writes —
``df.withColumn("split", …).write.partitionBy("split")`` lands the mix
as prunable partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def split_bucket(id_col: str, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from a stable id column:
    the first 8 md5 hex chars as an integer, mod n_buckets. Portable:
    identical values in any engine with md5 (the DuckDB oracle uses
    the same expression)."""
    return (
        F.expr(f"cast(conv(substring(md5(cast({id_col} as string)), 1, 8), 16, 10) as bigint)")
        % n_buckets
    ).cast("int")


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: dict[str, int] | None = None,
) -> DataFrame:
    """Assign each row a named split by hash bucket. ``splits`` maps
    name -> percent (must sum to 100); buckets [0, p1) -> first split,
    [p1, p1+p2) -> second, etc. Membership depends only on the id —
    re-runs, repartitions, and corpus growth never move a row."""
    splits = splits or {"train": 90, "val": 5, "test": 5}
    if sum(splits.values()) != 100:
        raise ValueError(f"split percents must sum to 100, got {splits}")
    bucket = split_bucket(id_col, 100)
    expr = None
    lo = 0
    for name, pct in splits.items():
        cond = bucket < lo + pct
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo += pct
    return df.withColumn("split", expr)


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    max_rows: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``max_rows`` rows per group, selected by hash order
    of the id (a uniform, deterministic "random K" per group — not the
    K smallest ids, which would bias toward old documents). One window
    shuffle on the group key; AQE splits skewed groups."""
    order = F.expr(f"md5(cast({id_col} as string))")
    w = Window.partitionBy(*group_cols).orderBy(order, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_rows)
        .drop("__rn")
    )
