"""Skew mitigation (SURVEY.md §7 "composite-key skew").

The reference's head-office store code concentrates volume
(kicc_to_tb_sales.py:131 hard-codes the direct-store range); at
cluster scale one hot key serializes a whole join stage. Two layers of
defense:

1. AQE skew-join splitting (on by default, session.py) — handles
   sort-merge skew transparently; prefer it.
2. Manual salting (this module) — for engines/paths AQE doesn't reach
   (e.g. a shuffled hash join forced by hints, or pre-AQE clusters):
   the hot side scatters each key across S salt buckets, the other
   side replicates each row S times, and the join runs on
   (key, salt) — a hot key's rows now spread over S tasks.

Cost model: replication multiplies the small side by S, so pick
S ≈ (hot-key rows / target-partition rows), and salt only when the
small side × S still fits comfortably; sums/counts over the salted
join are unaffected because salting only re-partitions, never
duplicates a (left, right) match.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# Join types for which salting is a pure physical rewrite. Right/full
# outer joins are NOT equivalent: every unmatched ``other`` row was
# replicated salt× and each replica survives the outer join, so the
# result would contain salt copies of it.
_SAFE_HOW = {
    "inner",
    "left",
    "left_outer",
    "leftouter",
    "left_semi",
    "leftsemi",
    "semi",
    "left_anti",
    "leftanti",
    "anti",
}


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    keys: Sequence[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join where ``skewed``'s key distribution is hot.

    Each skewed row gets a deterministic salt in [0, salt) derived by
    hashing the full row (monotonic ids would tie the result to
    physical partitioning); ``other`` is replicated salt× with an
    explode — no shuffle added, the join itself shuffles on
    (keys, salt) so a hot key fans out over ``salt`` tasks.

    For ``how`` in inner/left/left_semi/left_anti the result is exactly
    ``skewed.join(other, keys, how)`` — salting is a physical rewrite,
    not a semantic one (verified by the equivalence test). Right/full
    outer joins would duplicate unmatched ``other`` rows once per salt
    replica, so they are rejected; put the preserved side on the left,
    or use AQE's skew-join handling for a full outer.
    """
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SAFE_HOW}:
        raise ValueError(
            f"salted_join: how={how!r} is not equivalence-safe (unmatched "
            "replicated rows of the non-salted side would appear salt times); "
            f"use one of {sorted(_SAFE_HOW)}"
        )
    salt_col = (
        (F.abs(F.xxhash64(*[F.col(c) for c in skewed.columns])) % salt).cast("int").alias("__salt")
    )
    left = skewed.select("*", salt_col)
    right = other.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("__salt")
    )
    return left.join(right, [*keys, "__salt"], how).drop("__salt")


def exact_group_percentiles(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    percentiles: Sequence[tuple[float, str]],
) -> DataFrame:
    """Exact linear-interpolated percentiles per key group, computed so
    a HOT KEY cannot serialize the aggregation — the skew story for
    holistic aggregates (ROADMAP #3).

    Spark's built-in ``percentile`` is holistic: every value of a group
    buffers in one aggregation state, so at 100 TB a hot key means one
    task holding (and sorting) that key's entire column. This rewrite
    makes it algebraic over the value FREQUENCY MAP instead:

    1. ``groupBy(keys, value) -> count`` — the only pass over the raw
       rows. A hot key's volume spreads over its distinct values, and
       map-side combine collapses duplicates before the shuffle, so
       the data crossing the wire is O(distinct values), not O(rows);
    2. a running-count window over each key's distinct values (state
       is O(distinct values per key) — bounded for discrete domains
       like quantities, cents, durations);
    3. percentile lookup as conditional MIN aggregates: index
       ``pos = p * (N - 1)`` splits into ``k = floor(pos)``; the
       values at ranks k and k+1 are the smallest values whose
       running count exceeds them, and the result interpolates
       ``v_k + (pos - k) * (v_{k+1} - v_k)`` — the same definition
       Spark's ``percentile`` and DuckDB's ``quantile_cont``
       implement, so results match the built-in bit-for-bit on
       integer-exact inputs (pinned by test).

    Intended for discrete / bounded-cardinality value domains (ints,
    money-as-cents, bucketed durations); for unbounded doubles at
    scale, ``approx_percentile`` is the honest answer. Window + final
    groupBy share one hash partitioning on ``keys`` (Catalyst reuses
    the exchange), so the whole operator costs two shuffles.

    ``percentiles`` — (fraction, output column name) pairs.
    """
    v = F.col(value_col)
    counts = df.groupBy(*keys, v.alias("__v")).agg(F.count(F.lit(1)).alias("__cnt"))
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy("__v")
    wall = Window.partitionBy(*[F.col(k) for k in keys])
    c = counts.select(
        *keys,
        "__v",
        F.sum("__cnt").over(w).alias("__cum"),
        F.sum("__cnt").over(wall).alias("__tot"),
    )
    aggs = []
    for i, (p, _alias) in enumerate(percentiles):
        pos = F.lit(float(p)) * (F.col("__tot") - 1).cast("double")
        k = F.floor(pos)
        aggs.append(F.min(F.when(F.col("__cum") >= k + 1, F.col("__v"))).alias(f"__vk_{i}"))
        aggs.append(F.min(F.when(F.col("__cum") >= k + 2, F.col("__v"))).alias(f"__vk1_{i}"))
        aggs.append(F.min(pos - k).alias(f"__frac_{i}"))  # constant within the group
    out = c.groupBy(*keys).agg(*aggs)
    final = list(keys)
    for i, (_p, alias) in enumerate(percentiles):
        vk = F.col(f"__vk_{i}").cast("double")
        vk1 = F.coalesce(F.col(f"__vk1_{i}").cast("double"), vk)
        final.append((vk + F.col(f"__frac_{i}") * (vk1 - vk)).alias(alias))
    return out.select(*final)


def salted_collect_list(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    salt: int = 16,
    sort: bool = True,
) -> DataFrame:
    """``collect_list`` per key with two-stage salting — the other
    holistic-agg skew shape (ROADMAP #3): a hot key's values first
    collect into ``salt`` independent partial arrays on different
    tasks (stage 1 groups by (key, salt)), then the bounded partials
    concatenate per key (stage 2 moves ``salt`` arrays per key, not
    one giant state through one task).

    ``sort=True`` sorts the final array so the result is deterministic
    (plain collect_list order is partition-dependent anyway); the
    output column is named ``{value_col}s``."""
    salt_col = (F.abs(F.xxhash64(*[F.col(c) for c in df.columns])) % salt).alias("__salt")
    partials = (
        df.select(*keys, F.col(value_col), salt_col)
        .groupBy(*keys, "__salt")
        .agg(F.collect_list(value_col).alias("__part"))
    )
    merged = partials.groupBy(*keys).agg(
        F.flatten(F.collect_list("__part")).alias(f"{value_col}s")
    )
    if sort:
        merged = merged.withColumn(f"{value_col}s", F.sort_array(F.col(f"{value_col}s")))
    return merged


def kth_smallest(
    df: DataFrame,
    col: str,
    k: int,
    bits_per_pass: int = 16,
) -> int:
    """EXACT k-th smallest value (1-based, duplicates counted) of a
    non-null bigint column, by iterative histogram refinement — the
    distributed selection primitive for quantiles over NEAR-UNIQUE
    values, where ``exact_group_percentiles``'s frequency-map trick
    (which exploits repeated values) degenerates and a global
    sort/ntile would serialize into one partition.

    Each pass buckets the surviving value range into ≤ 2^bits_per_pass
    equal-width cells with ONE aggregation job, walks the ≤ 65k cell
    counts on the driver (bounded metadata, never row data), and
    recurses into the cell containing the k-th value. A full 64-bit
    domain resolves in ≤ ceil(64/16) = 4 passes; ranges narrower than
    2^bits finish in one. O(passes · scan) work, O(2^bits) driver
    memory, no shuffle at all (aggregations are map-side partials +
    a 65k-row reduce). Callers doing repeated probes (terciles,
    deciles) should persist ``df`` first."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    bounds = df.agg(
        F.min(col).alias("lo"), F.max(col).alias("hi"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    if bounds.n is None or k > bounds.n:
        raise ValueError(f"k={k} exceeds row count {bounds.n}")
    lo, hi = int(bounds.lo), int(bounds.hi)
    cells = 1 << bits_per_pass
    while hi > lo:
        width = hi - lo + 1
        cell_w = max(1, -(-width // cells))  # ceil — last cell may be short
        # integer div, not "/": double division truncates wrongly at
        # cell boundaries once quotients stop being exactly
        # representable. (min-max span must fit int64, as any single
        # Spark bigint subtraction must.)
        counts = dict(
            df.filter((F.col(col) >= lo) & (F.col(col) <= hi))
            .groupBy(F.expr(f"cast(({col} - ({lo})) div {cell_w} as bigint)").alias("c"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        acc = 0
        for c in sorted(counts):
            if acc + counts[c] >= k:
                k -= acc
                lo, hi = lo + c * cell_w, min(hi, lo + c * cell_w + cell_w - 1)
                break
            acc += counts[c]
    return lo
