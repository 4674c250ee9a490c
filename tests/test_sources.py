"""Fetch-source tests (S1/S5/J4): request plan, parallel fetch with a
fake transport, schema-driven decode, dead-letter error rows."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from etl_job_spark.sources.json_api import build_request_plan, decode_payload, fetch_json

ROW_SCHEMA = StructType(
    [
        StructField("sp_code", StringType()),
        StructField("total_amt", DoubleType()),
        StructField("sale_amt", DoubleType()),
    ]
)


def fake_transport(sp_code: str, sale_date: str) -> str:
    if sp_code == "BAD":
        return json.dumps({"ret_code": "9999", "data": []})
    if sp_code == "BOOM":
        raise ConnectionError("socket closed")
    return json.dumps(
        {
            "ret_code": "0000",
            "data": [
                {"sp_code": sp_code, "total_amt": 100.0, "sale_amt": 90.0},
                {"sp_code": sp_code, "total_amt": 50.0},  # missing key -> NULL
            ],
        }
    )


def test_fetch_and_decode(spark):
    stores = spark.createDataFrame([("S1",), ("S2",), ("BAD",), ("BOOM",)], "sp_code string")
    calendar = spark.createDataFrame([("20240101",), ("20240102",)], "sale_date string")
    plan = build_request_plan(stores, calendar)
    assert plan.count() == 8  # 4 stores x 2 dates

    responses = fetch_json(plan, fake_transport, num_partitions=4).cache()
    errors = responses.filter(F.col("error").isNotNull())
    assert errors.count() == 4  # BAD + BOOM across 2 dates
    kinds = {r.error.split(":")[0] for r in errors.collect()}
    assert kinds == {"ret_code=9999", "ConnectionError"}

    rows = decode_payload(responses, ROW_SCHEMA)
    got = rows.collect()
    assert len(got) == 8  # 2 good stores x 2 dates x 2 rows
    nulls = [r for r in got if r.sale_amt is None]
    assert len(nulls) == 4  # dict.get semantics: missing key -> NULL
    assert all(r.total_amt in (100.0, 50.0) for r in got)
