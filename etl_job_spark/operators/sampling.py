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


# ---------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169): rank raw-corpus documents by how target-like
# their hashed n-gram bag is, then Gumbel-top-k sample proportionally
# to the importance weight. The reference has no analogue; extension
# per SURVEY.md §2's LLM-pipeline mandate.
#
# Engine-portability choices (the repo's integer-exactness invariant):
# per-feature log-ratios are rounded to INTEGER micro-nats before any
# summation, so document scores are exact bigint sums (order-free); the
# Gumbel noise derives from md5(doc_id) — a deterministic hash-RNG both
# engines replay bit-identically — and is itself micro-nat-rounded.
# The only floating step, ln() of a deterministic IEEE quotient, sits
# ~9 orders of magnitude above its ULP error when rounded at 1e-6.
# ---------------------------------------------------------------------

_GUMBEL_GRID = 1 << 20  # hash-uniform resolution for the Gumbel draw


def _bucket_expr(md5_arg: str, n_buckets: int) -> str:
    """First 8 md5 hex chars as an integer, mod n_buckets — the same
    portable bucket `split_bucket` uses, inlined for array lambdas."""
    return (
        f"cast(conv(substring(md5({md5_arg}), 1, 8), 16, 10) as bigint) % {n_buckets}"
    )


def hashed_ngram_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Hashed bag-of-ngrams: (id, feat, cnt) with feat ∈ [0, n_buckets)
    covering unigrams AND bigrams (DSIR §3.1's feature space).

    Scale shape: the n-gram arrays build inside the row (zero
    shuffle), then ONE groupBy(id, feat) counts the bag — and because
    feat has at most n_buckets distinct values per document, map-side
    combine collapses the exploded pairs to ≤ n_buckets rows per doc
    before anything moves."""
    uni_arg = "concat('1:', t)"
    uni = f"transform(toks, t -> {_bucket_expr(uni_arg, n_buckets)})"
    bi = (
        "transform(slice(toks, 1, size(toks) - 1), (t, i) -> "
        + _bucket_expr("concat('2:', t, ' ', element_at(toks, i + 2))", n_buckets)
        + ")"
    )
    return (
        docs.select(
            F.col(id_col),
            F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+").alias(
                "toks"
            ),
        )
        .select(id_col, F.explode(F.expr(f"concat({uni}, {bi})")).alias("feat"))
        .groupBy(id_col, "feat")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def dsir_weights(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    temperature: int = 1,
) -> DataFrame:
    """Per-raw-document importance score and Gumbel-perturbed sampling
    key, both in exact integer micro-nats:

      score_micro = Σ_f cnt_f(doc) · round(1e6 · ln p̂_target(f)/p̂_raw(f))
      key_micro   = (score_micro div T) + round(1e6 · Gumbel(md5('g:'||id)))

    p̂ uses add-one smoothing over the n_buckets hashed features. The
    top-k rows by key_micro ARE the Gumbel-top-k sample ∝ exp(score/T)
    (Gumbel-max trick), made reproducible by the hash-derived noise.

    ``temperature`` flattens the sample the usual way — T=1 is pure
    importance resampling, T→∞ approaches uniform. It must be a
    positive INTEGER so the tempered score stays exact bigint
    arithmetic (``div`` truncates toward zero once per document — the
    pinned behavior for negative scores too — ≤1 micro-nat, the
    same order-free rounding discipline as the ratios themselves);
    ``score_micro`` is always reported untempered.

    Scale shape: the ratio table is n_buckets rows (broadcast); doc
    scores are one groupBy(id) over the already-bucketed feature bag.
    Raw totals never leave the executors except as one 1-row aggregate."""
    if not isinstance(temperature, int) or temperature < 1:
        raise ValueError(
            f"temperature must be a positive integer (got {temperature!r}); "
            "integer division keeps the tempered score exact"
        )
    raw_feats = hashed_ngram_features(raw_docs, text_col, id_col, n_buckets)
    tgt_feats = hashed_ngram_features(target_docs, text_col, id_col, n_buckets)
    cr = raw_feats.groupBy("feat").agg(F.sum("cnt").alias("cr"))
    ct = tgt_feats.groupBy("feat").agg(F.sum("cnt").alias("ct"))
    ratios = cr.join(ct, "feat", "full").fillna(0, ["cr", "ct"])
    totals = ratios.agg(
        F.sum("ct").cast("bigint").alias("t_tot"), F.sum("cr").cast("bigint").alias("r_tot")
    )
    lr = ratios.crossJoin(F.broadcast(totals)).select(
        "feat",
        F.expr(
            f"cast(round(ln((cast(ct + 1 as double) * (r_tot + {n_buckets}))"
            f" / (cast(cr + 1 as double) * (t_tot + {n_buckets}))) * 1e6) as bigint)"
        ).alias("lr_micro"),
    )
    scores = (
        raw_feats.join(F.broadcast(lr), "feat")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("lr_micro")).cast("bigint").alias("score_micro"))
    )
    gum_arg = f"concat('g:', cast({id_col} as string))"
    gumbel = F.expr(
        f"cast(round(-ln(-ln((({_bucket_expr(gum_arg, _GUMBEL_GRID)}) + 1)"
        f" / {_GUMBEL_GRID + 1}.0)) * 1e6) as bigint)"
    )
    tempered = (
        F.col("score_micro")
        if temperature == 1
        else F.expr(f"score_micro div {temperature}")
    )
    return scores.select(
        id_col, "score_micro", (tempered + gumbel).alias("key_micro")
    )


def dsir_resample(weights: DataFrame, k: int, id_col: str = "doc_id") -> DataFrame:
    """The k rows with the largest Gumbel keys — a weighted sample
    without replacement ∝ exp(score). orderBy(...).limit(k) compiles
    to TakeOrderedAndProject: per-partition top-k then a k-row merge,
    never a global sort."""
    return weights.orderBy(F.col("key_micro").desc(), F.col(id_col)).limit(k)


def temperature_caps(
    docs: DataFrame,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based source mixing at α = 0.5: select ~``budget``
    documents with per-source quotas ∝ √n_source — the standard
    rebalancing that UPSAMPLES small sources relative to proportional
    mixing without letting any giant source dominate (the multilingual
    mixing rule, α = 1/2 of the n_i^α family).

    α is fixed at 1/2 because it is the one temperature with an EXACT
    integer form: isqrt(n) (floor(sqrt(n)) — IEEE sqrt is correctly
    rounded, so the floor is exact for any count below ~2^52) makes
    every quota floor(budget · √n_i / Σ√n_j) pure bigint arithmetic —
    engine-portable, no pow() libm drift. Quotas cap at n_i; selection
    within a source is hash-order (the same deterministic "random K"
    as ``cap_per_group``), so membership never moves on rerun.

    Scale shape: source counts are one groupBy (|sources| rows,
    broadcast back); selection is one window shuffle on the group key.

    Reference analogue: none; extension per SURVEY.md §2's
    LLM-pipeline mandate."""
    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = counts.select(
        group_col, "n", F.expr("cast(floor(sqrt(n)) as bigint)").alias("w")
    )
    tot = w.agg(F.sum("w").cast("bigint").alias("w_tot"))
    quota = (
        w.crossJoin(F.broadcast(tot))
        .select(
            group_col,
            F.least(F.expr(f"cast(({budget} * w) div w_tot as bigint)"), F.col("n")).alias(
                "quota"
            ),
        )
    )
    order = F.expr(f"md5(cast({id_col} as string))")
    win = Window.partitionBy(group_col).orderBy(order, F.col(id_col))
    return (
        docs.withColumn("__rn", F.row_number().over(win))
        .join(F.broadcast(quota), group_col)
        .filter(F.col("__rn") <= F.col("quota"))
        .drop("__rn", "quota")
    )
