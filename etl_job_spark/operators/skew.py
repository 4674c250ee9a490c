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

from pyspark.sql import DataFrame
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
