"""Training-shard assembly: pack documents into fixed-token-budget
shards, and downsample sources to a weighted token mixture.

Both are the last mile of an LLM data pipeline — after dedup/filtering
the corpus must land as (a) shards of ~equal token mass for the
training loader and (b) a domain mixture matching target weights.
Both must be DETERMINISTIC (a rerun must produce byte-identical
shards) and neither may funnel the corpus through one task.

**pack_token_shards** needs a global running sum of token counts in a
stable document order. The naive window (``ORDER BY id`` with no
partition) is a single-task sort — the classic scale killer. Here it
is the textbook two-stage distributed prefix sum instead:

1. bucket each row by RANGE of the order column (pure projection —
   no sampling, so bucketing is deterministic, unlike
   ``repartitionByRange``);
2. one small aggregation computes per-bucket token totals — at most
   ``n_buckets`` rows ever reach the driver;
3. the driver prefix-sums those totals into per-bucket OFFSETS
   (broadcast back as a tiny join side);
4. a per-bucket window (parallel across buckets) adds the offset to
   the within-bucket running sum.

The result is bit-identical to the single-task window at any
partitioning, with the only data shuffle being the per-bucket window
exchange. At 1000 executors, raise ``n_buckets`` to keep buckets at
task granularity; skew across buckets is bounded by the range split.

**mix_to_token_budget** aggregates one row per SOURCE to the driver
(bounded metadata, the touched-partition-list contract) and computes
per-source thresholds in Python arbitrary-precision integers — the
equivalent int64 SQL arithmetic (resolution × target tokens) wraps at
~9.2e12 target tokens, exactly the scale this operator exists for.
Thresholds broadcast back onto the corpus; membership is the
md5-bucket row property used by ``sampling.split_bucket``, so the
kept set never moves on rerun or repartition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_job_spark.operators.sampling import split_bucket

MIX_RESOLUTION = 1_000_000


def pack_token_shards(
    df: DataFrame,
    weight_col: str,
    order_col: str,
    budget: int,
    n_buckets: int = 256,
    materialize: bool = True,
) -> DataFrame:
    """Assign each row the shard id of its starting token offset in
    the ``order_col`` sequence: ``shard_id = (running_sum - weight)
    div budget``. ``order_col`` must be numeric and unique (document
    ids); ``weight_col`` a non-negative integer (token counts).

    Equals ``(sum(w) OVER (ORDER BY order) - w) div budget`` exactly,
    without the global single-task sort — see the module docstring for
    the two-stage prefix-sum shape. Shards are contiguous runs of the
    order column, so a downstream ``write.partitionBy("shard_id")``
    lands loader-ready shards of ~``budget`` tokens each.

    ``materialize=True`` (default) pins the input with an eager
    ``localCheckpoint`` before anything reads it: the upstream pipeline
    (typically post-dedup, expensive) computes EXACTLY once, and the
    driver-computed offsets and the returned plan's rows come from the
    same materialization — required for correctness when the upstream
    plan is nondeterministic (offsets computed against one run and rows
    against another would silently break the bit-equality with the
    global window). ``materialize=False`` skips the checkpoint for
    callers that already persisted/landed a DETERMINISTIC input and
    want zero extra storage; the two metadata aggregations then
    recompute the input plan."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if materialize:
        # one upstream compute shared by the bounds agg, the per-bucket
        # agg AND the returned plan; blocks are executor-local
        # (MEMORY_AND_DISK) and reclaimed by the context cleaner when
        # the frame is garbage-collected
        df = df.localCheckpoint(eager=True)
    bounds = df.agg(F.min(order_col).alias("lo"), F.max(order_col).alias("hi")).first()
    if bounds is None or bounds["lo"] is None:
        return df.withColumn("shard_id", F.lit(0).cast("bigint")).limit(0)
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    # divide-first bucketing: (order-lo) div stride never overflows,
    # unlike (order-lo)*n_buckets, which wraps for snowflake-scale id
    # domains (~1e18 span) and would scramble bucket order silently.
    # Any contiguous range bucketing yields the identical final result
    # (the offsets absorb the boundaries), so stride rounding is free.
    stride = max(1, -(-(hi - lo + 1) // n_buckets))
    bucket = F.expr(f"cast((cast({order_col} as bigint) - {lo}) div {stride} as int)")
    rows = df.withColumn("__bucket", bucket)

    # ≤ n_buckets rows: the ONLY driver-side data in the whole pass
    per_bucket = (
        rows.groupBy("__bucket")
        .agg(F.sum(weight_col).alias("__w"))
        .orderBy("__bucket")
        .collect()
    )
    offsets, acc = [], 0
    for r in per_bucket:
        offsets.append((int(r["__bucket"]), acc))
        acc += int(r["__w"])
    off_df = df.sparkSession.createDataFrame(offsets, "__bucket int, __offset bigint")

    w = Window.partitionBy("__bucket").orderBy(order_col)
    return (
        rows.join(F.broadcast(off_df), "__bucket")
        .withColumn("__cum", F.col("__offset") + F.sum(weight_col).over(w))
        .withColumn(
            "shard_id", F.expr(f"(__cum - {weight_col}) div {budget}").cast("bigint")
        )
        .drop("__bucket", "__offset", "__cum")
    )


def mix_to_token_budget(
    df: DataFrame,
    source_col: str,
    weight_col: str,
    token_col: str,
    budget_sql: str,
    id_col: str = "doc_id",
    resolution: int = MIX_RESOLUTION,
) -> DataFrame:
    """Deterministically downsample each source so its expected kept
    token mass approaches ``budget * weight / total_weight``, keeping a
    source whole (threshold clamps at 100%) when it is already under
    target. Membership = ``md5-bucket(id) < threshold`` — a row
    property, so reruns and corpus growth never move a kept document.

    ``budget_sql`` is a SQL expression over the totals row (columns
    ``__total_tok``, ``__total_wt``; e.g. ``"__total_tok div 2"``) so
    the whole pass stays declarative: two tiny aggregations, one
    broadcast join, zero driver-side data. Threshold arithmetic is
    integer division throughout (engine-exact); ``resolution`` bounds
    rounding granularity at one part per million. ``weight_col`` must
    be constant within a source.
    """
    per_src = df.groupBy(source_col).agg(
        F.sum(token_col).alias("__src_tok"), F.min(weight_col).alias("__wt")
    ).collect()  # one row per SOURCE — bounded metadata, like MERGE's
    # touched-partition list. Thresholds are then computed in Python
    # ARBITRARY-PRECISION ints: the SQL form (resolution * target div
    # src_tok) wraps int64 once a source's target token mass passes
    # ~9.2e12 — at exactly the corpus scale this operator exists for —
    # and a wrapped-negative threshold silently empties the source.
    if not per_src:
        return df.limit(0)
    src_tok = {r[source_col]: int(r["__src_tok"]) for r in per_src}
    wt = {r[source_col]: int(r["__wt"]) for r in per_src}
    total_tok, total_wt = sum(src_tok.values()), sum(wt.values())
    budget = int(
        df.sparkSession.sql(
            f"SELECT ({budget_sql}) AS b FROM VALUES "
            f"({total_tok}, {total_wt}) AS t(__total_tok, __total_wt)"
        ).first()["b"]
    )
    thr_rows = [
        (
            s,
            min(resolution, (resolution * ((budget * wt[s]) // total_wt)) // src_tok[s])
            if src_tok[s]
            else 0,
        )
        for s in src_tok
    ]
    thr = df.sparkSession.createDataFrame(
        thr_rows, f"{source_col} {dict(df.dtypes)[source_col]}, __thr bigint"
    )
    kept = df.join(F.broadcast(thr), source_col).filter(
        split_bucket(id_col, resolution).cast("bigint") < F.col("__thr")
    )
    return kept.drop("__thr")
