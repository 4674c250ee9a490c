"""Pin the r15 two-level (hash-count -> exact text verify) duplicate-
window decision in remove_duplicate_spans against the single-pass
text-grouped reference it replaced.

The two-level form is exact by construction (a hash group of count 1
is provably unique; repeated-hash rows re-verify on full text); this
test re-derives the reference inline so a future edit that breaks the
equivalence — e.g. skipping the exact re-verify — fails here at tiny
scale instead of at the sf0.1 oracle."""

from pyspark.sql import functions as F

from etl_job_spark.operators.dedup import positional_shingles, remove_duplicate_spans
from etl_job_spark.operators.text import tokens


def _reference(docs, k):
    """Single-pass text-grouped span removal (the pre-r15 form)."""
    sh = positional_shingles(docs, k)
    dup = sh.groupBy("g").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1)
    dup_starts = sh.join(dup.select("g"), "g", "left_semi")
    per_doc = dup_starts.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("start")).alias("dup_starts")
    )
    base = docs.select("doc_id", tokens("text").alias("toks"))
    kept = F.expr(
        f"""aggregate(
          coalesce(dup_starts, cast(array() as array<int>)),
          struct(0 AS cur, cast(array() as array<string>) AS kept),
          (acc, s) -> struct(
            greatest(acc.cur, s + {k}) AS cur,
            CASE WHEN s > acc.cur
                 THEN concat(acc.kept, slice(toks, acc.cur + 1, s - acc.cur))
                 ELSE acc.kept END AS kept),
          acc -> CASE WHEN acc.cur < size(toks)
                      THEN concat(acc.kept, slice(toks, acc.cur + 1, size(toks) - acc.cur))
                      ELSE acc.kept END
        )"""
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select("doc_id", "toks", kept.alias("kept"))
        .select(
            "doc_id",
            F.size("toks").cast("bigint").alias("n_tokens"),
            (F.size("toks") - F.size("kept")).cast("bigint").alias("n_removed"),
            F.array_join("kept", " ").alias("kept_text"),
        )
    )


def test_two_level_decision_matches_text_grouped_reference(spark):
    # within-doc repeats, cross-doc shares, unique windows, short docs
    rows = [
        (1, "a b c d e a b c d e a b c d e"),
        (2, "a b c d e x y z w q"),
        (3, "p q r s t u v w x y"),
        (4, "p q r s t u v w x y"),
        (5, "one two three"),
        (6, ""),
        (7, "solo text with nothing shared here at all ok"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for k in (2, 4):
        got = {
            r.doc_id: (r.n_tokens, r.n_removed, r.kept_text)
            for r in remove_duplicate_spans(docs, k=k).collect()
        }
        want = {
            r.doc_id: (r.n_tokens, r.n_removed, r.kept_text)
            for r in _reference(docs, k).collect()
        }
        assert got == want, f"k={k}: {got} != {want}"
