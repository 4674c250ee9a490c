"""Benchmark decontamination: flag training documents that share long
n-grams with an evaluation/benchmark set.

The standard training-data hygiene pass (the GPT-3 appendix-C /
PaLM-style "13-gram overlap" rule, here parameterized): any document
containing a word-k-gram that also appears in a benchmark item is
contaminated — it would leak eval answers into the training mix.

Scale shape (the only one that survives 100 TB):

- The CORPUS side is the big side: its k-shingles are produced
  within-row (``dedup.shingles`` — ``array_distinct`` before the
  explode, so the shingle table needs no shuffle and stays partitioned
  like the scan).
- The BENCHMARK side is small by construction (eval suites are
  thousands of items, not billions), so its shingles are **broadcast**
  and the contamination probe is a map-side hash join against the
  corpus shingle stream — the corpus never shuffles to meet the
  benchmark.
- The only shuffle in the whole pass is the final per-document
  aggregation, and it carries ONLY matched shingles (contamination is
  sparse: a tiny fraction of corpus shingles survive the join).

Reference parity: the reference has no decontamination (it is a POS
ETL, `load_sales_data.py`), so this module is extension surface for
the LLM-pipeline north star (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_job_spark.operators.dedup import shingles

CONTAM_K = 8


def benchmark_shingles(
    bench: DataFrame, text_col: str = "text", id_col: str = "bench_id", k: int = CONTAM_K
) -> DataFrame:
    """Distinct k-shingles of each benchmark item: (bench_id, shingle).
    Small by contract — callers broadcast it."""
    sh = shingles(bench.select(F.col(id_col).alias("doc_id"), F.col(text_col)), k=k)
    return sh.select(F.col("doc_id").alias("bench_id"), "shingle")


def contamination_hits(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    k: int = CONTAM_K,
) -> DataFrame:
    """Per contaminated document: how many distinct k-grams overlap the
    benchmark (``n_hit_ngrams``) and how many distinct benchmark items
    are implicated (``n_bench_items``). Documents with zero overlap do
    not appear — the result is sparse.

    ``bench`` carries (bench_id, text). Its shingle table is broadcast;
    see the module docstring for why that is the scale-correct side.
    """
    corpus_sh = shingles(docs, text_col=text_col, k=k)
    bench_sh = benchmark_shingles(bench, text_col=text_col, k=k)
    return (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_hit_ngrams"),
            F.countDistinct("bench_id").alias("n_bench_items"),
        )
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    k: int = CONTAM_K,
) -> DataFrame:
    """Drop every document sharing at least one k-gram with the
    benchmark: a broadcast LEFT ANTI join against the distinct set of
    contaminated doc ids (small — see ``contamination_hits``)."""
    hits = contamination_hits(docs, bench, text_col=text_col, k=k).select("doc_id")
    return docs.join(F.broadcast(hits), "doc_id", "left_anti")
