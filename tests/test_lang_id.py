"""Language-ID quality tests (r3 VERDICT wrong-#3).

The oracle-diff gate proves Spark == DuckDB, but both sides could share
the same defect — r3's padded zh counter passed the oracle while being
unable to return 'zh' on any genuine (unspaced) Chinese text.  These
tests pin the OPERATOR-quality property: real unsegmented zh text must
actually predict zh, and the planted corpus must exercise that path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_job_spark.operators.text import LANG_STOPWORDS, stopword_hits
from etl_job_spark.plans.registry import QUERIES


def test_planted_zh_docs_predict_zh(spark, sf_dir):
    out = QUERIES["text_lang_id"](spark, sf_dir)
    planted = out.filter(F.col("doc_id") >= 2000000)
    n_planted = planted.count()
    assert n_planted > 0, "lang corpus must plant zh documents"
    assert planted.filter(F.col("pred_lang") == "zh").count() == n_planted
    assert planted.filter(F.col("score") <= 0).count() == 0


def test_unpadded_hits_fire_on_unspaced_chinese(spark):
    # Genuine zh sentence with no spaces: 的 ×2, 是 ×1, 了 ×1
    df = spark.createDataFrame([("今天的天气是很好的我们出门了",)], ["text"])
    row = df.select(
        stopword_hits("text", LANG_STOPWORDS["zh"], padded=False).alias("h")
    ).first()
    assert row["h"] == 4
    # the padded counter (the r3 defect) scores the same text 0
    row0 = df.select(
        stopword_hits("text", LANG_STOPWORDS["zh"], padded=True).alias("h")
    ).first()
    assert row0["h"] == 0


def test_english_docs_still_predict_en(spark, sf_dir):
    out = QUERIES["text_lang_id"](spark, sf_dir)
    base = out.filter(F.col("doc_id") < 2000000)
    # the synthetic documents table is English prose — en must dominate
    n = base.count()
    n_en = base.filter(F.col("pred_lang") == "en").count()
    assert n_en > n * 0.5
