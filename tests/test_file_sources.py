"""CSV / JSON-lines source tests: explicit schema, missing-key → NULL,
malformed-row quarantine."""

from __future__ import annotations

from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

from etl_job_spark.sources.files import read_csv, read_jsonl, split_rescued

SCHEMA = StructType(
    [
        StructField("sp_code", StringType()),
        StructField("sale_date", StringType()),
        StructField("total_amt", DoubleType()),
        StructField("bill_qty", LongType()),
    ]
)


def test_read_csv_with_quarantine(spark, tmp_path):
    p = tmp_path / "sales.csv"
    p.write_text(
        "sp_code,sale_date,total_amt,bill_qty\n"
        "000001,19950102,123.45,3\n"
        "000002,19950102,not_a_number,xx\n"  # malformed
        "000003,19950103,99.5,1\n"
    )
    df = read_csv(spark, str(p), SCHEMA)
    good, bad = split_rescued(df)
    assert good.count() == 2
    assert bad.count() == 1
    assert "not_a_number" in bad.first()._corrupt_record
    got = {r.sp_code: r.total_amt for r in good.collect()}
    assert got == {"000001": 123.45, "000003": 99.5}


def test_read_jsonl_missing_key_is_null(spark, tmp_path):
    p = tmp_path / "sales.jsonl"
    p.write_text(
        '{"sp_code": "000001", "sale_date": "19950102", "total_amt": 5.0, "bill_qty": 2}\n'
        '{"sp_code": "000002", "sale_date": "19950102"}\n'  # missing keys
        "{broken json\n"
    )
    df = read_jsonl(spark, str(p), SCHEMA)
    good, bad = split_rescued(df)
    assert good.count() == 2
    assert bad.count() == 1
    row = {r.sp_code: r for r in good.collect()}["000002"]
    assert row.total_amt is None and row.bill_qty is None  # dict.get semantics
