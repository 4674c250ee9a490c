"""Text-analysis operators for LLM-data pipelines (BASELINE.json north
star): tokenization, stats, quality scoring, language-ID heuristic,
document fingerprinting.

Everything is built from JVM-side `pyspark.sql.functions` expressions —
no Python UDFs in the hot path — so the whole surface stays inside
whole-stage codegen and scales linearly with executors. Ratios are
quotients of exact integers (counts/lengths), so results are
bit-identical to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PUNCT_CLASS = "[.,!?;:]"
# BPE-ish pre-tokenizer: alpha runs | digit runs | single non-space symbol
BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

# tiny per-language stopword anchors for the n-gram heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "ist"],
    "en": ["the", "and", "of", "is"],
    "es": ["el", "los", "que", "y"],
    "fr": ["le", "la", "et", "est"],
    "zh": ["的", "是", "了"],
}


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def n_tokens(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("bigint")


def punct_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))).cast("bigint")


def bpe_token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(BPE_PATTERN), 0)).cast("bigint")


def stopword_hits(col_name: str, words: list[str]) -> Column:
    """Total padded-occurrence count of the given stopwords."""
    padded = f"concat(' ', lower({col_name}), ' ')"
    parts = [
        f"(length({padded}) - length(replace({padded}, ' {w} '))) div {len(w) + 2}"
        for w in words
    ]
    return F.expr(" + ".join(parts)).cast("bigint")


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def winnowing_fingerprints(
    docs: DataFrame, text_col: str = "text", k: int = 5, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken):
    char k-gram rolling hashes, keep the minimum of every window of
    ``window`` consecutive hashes, dedup — the standard local
    plagiarism/overlap fingerprint. Guarantees any shared substring of
    length ≥ k + window - 1 contributes a shared fingerprint.

    Hash = first 8 hex digits of md5(gram) as an integer: engine-
    portable (identical in the DuckDB oracle) and well-distributed.
    One explode + one window + one distinct; everything stays keyed by
    doc_id, so the window sort never crosses documents."""
    from pyspark.sql import Window as W

    c = F.lower(F.trim(F.col(text_col)))
    grams = F.expr(
        f"transform(sequence(1, greatest(length(lower(trim({text_col}))) - {k - 1}, 0)),"
        f" i -> substring(lower(trim({text_col})), i, {k}))"
    )
    g = docs.select("doc_id", F.posexplode(grams).alias("pos", "gram")).withColumn(
        "h", F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("bigint")
    )
    n_windows = F.max("pos").over(W.partitionBy("doc_id")) - (window - 1)
    wmin = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(W.currentRow, window - 1)
    )
    return (
        g.withColumn("minh", F.min("h").over(wmin))
        .withColumn("n_windows", n_windows)
        .filter(F.col("pos") <= F.col("n_windows"))
        .select("doc_id", "minh")
        .distinct()
    )


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stats: char/token counts, punctuation ratio,
    mean token length — the quality-signal raw material."""
    toks = tokens(text_col)
    return docs.select(
        "doc_id",
        F.length(text_col).cast("bigint").alias("n_chars"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        punct_count(text_col).alias("n_punct"),
        (punct_count(text_col) / F.length(text_col).cast("bigint")).alias("punct_ratio"),
        (
            F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t))
            / F.size(toks).cast("bigint")
        ).alias("mean_token_len"),
    )
