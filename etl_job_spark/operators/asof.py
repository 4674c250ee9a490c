"""As-of (nearest-predecessor) join — SURVEY.md §2.4 flags this as the
natural extension beyond the reference's equi-joins (the reference has
none; kicc_to_tb_sales.py:109-124 are all equality UPDATE-joins).

Spark has no ASOF JOIN operator; the idiomatic composition avoids the
naive range-join explosion (|left| × |right| candidate pairs filtered
afterwards) entirely:

1. union left probes and right quotes into one keyed event column,
2. one window sort per key orders them on (ts, side),
3. ``last(right_payload, ignorenulls)`` carries the most recent right
   row forward onto each left row.

Cost: ONE shuffle on the join key + a partition-local sort — the same
plan shape as a sort-merge join, with no intermediate blow-up. Skewed
keys are handled by AQE the same way any window would be; at 100 TB
this is the formulation that survives (it's also how Flink/KDB-style
engines sequence as-of semantics).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` within the same key group (backward
    as-of, ties match — DuckDB/pandas ``merge_asof`` semantics).

    ``right_cols``: right payload columns to carry (default: all but
    keys and ts). Carried columns are suffixed. Left rows with no
    predecessor get NULLs, like a left join.

    ``tolerance``: optional max staleness as an interval string (e.g.
    ``'7 days'``); a carried match older than this is nulled out —
    pandas ``merge_asof(tolerance=...)``. Applied after the window
    carry, so it adds no join or shuffle.

    ``direction``: ``'backward'`` (default, greatest right_ts <=
    left_ts) or ``'forward'`` (smallest right_ts >= left_ts) — the
    forward pass is the same window run in reverse order, still one
    shuffle.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_cols = list(
        right_cols
        if right_cols is not None
        else [c for c in right.columns if c not in (*keys, right_ts)]
    )
    payload = F.struct(F.col(right_ts).alias("__ts"), *[F.col(c) for c in right_cols])

    l_tagged = left.withColumn("__t", F.col(left_ts)).withColumn(
        "__side", F.lit(1)
    ).withColumn("__payload", F.lit(None).cast(right.select(payload).schema[0].dataType))
    r_tagged = (
        right.select(*keys, F.col(right_ts).alias("__t"), payload.alias("__payload"))
        .withColumn("__side", F.lit(0))
    )
    # align schemas: right side carries no left payload
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))

    # right rows (side 0) sort adjacent to left rows at the same
    # timestamp on the matching side, so an exactly-equal quote
    # matches its probe in either direction
    if direction == "backward":
        order = [F.col("__t").asc(), F.col("__side").asc()]
    else:
        order = [F.col("__t").desc(), F.col("__side").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1).drop("__t", "__side", "__payload")
    if tolerance is not None:
        bound = F.expr(f"interval {tolerance}")
        in_bound = (
            F.col("__match.__ts") >= F.col(left_ts) - bound
            if direction == "backward"
            else F.col("__match.__ts") <= F.col(left_ts) + bound
        )
        out = out.withColumn("__match", F.when(in_bound, F.col("__match")))
    for c in right_cols:
        out = out.withColumn(c + suffix, F.col("__match." + c))
    return out.withColumn(right_ts + suffix, F.col("__match.__ts")).drop("__match")
