"""Distributed JSON-over-HTTP fetch source (SURVEY.md §2.1 S1, §3 E1).

The reference drives a nested Python loop over stores × dates, one
``requests.post`` + one MySQL connection per pair
(/root/reference/load_sales_data.py:160-164, :89-93), strictly serial.

Spark-first shape: the (store, date) request plan IS a DataFrame —
``stores.crossJoin(calendar)`` — and the fetch is a ``mapInPandas``
over it, so requests parallelize across executors with one transport
per *partition* (not per request, avoiding the reference's
connection-per-fetch pathology, SURVEY.md §4). Responses are JSON
strings parsed with ``from_json(schema)``: a missing key becomes
NULL, matching the reference's ``dict.get`` semantics
(load_sales_data.py:105-126).

The transport is pluggable: production would POST
``{s_code, hd_code, sp_code, sale_date}`` and check HTTP status and
``ret_code == "0000"`` (load_sales_data.py:95-100); tests inject a
deterministic fake. Failures yield an ``error`` column instead of a
row batch — the dead-letter pattern replacing the reference's
log-and-continue (load_sales_data.py:137-140).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# transport(sp_code, sale_date) -> raw JSON response text
Transport = Callable[[str, str], str]

RESPONSE_FIELDS = "fetch_sp_code string, fetch_sale_date string, payload string, error string"


def build_request_plan(stores: DataFrame, calendar: DataFrame) -> DataFrame:
    """stores(sp_code) × calendar(sale_date) — the J4 cross product as a
    DataFrame. At scale, repartition so fetch work spreads evenly."""
    return stores.select("sp_code").crossJoin(calendar.select("sale_date"))


def fetch_json(
    requests_df: DataFrame,
    transport: Transport,
    num_partitions: int | None = None,
) -> DataFrame:
    """Run ``transport`` once per (sp_code, sale_date) row, in parallel.

    Returns one row per request: payload JSON text or an error string.
    """
    if num_partitions:
        requests_df = requests_df.repartition(num_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {"fetch_sp_code": [], "fetch_sale_date": [], "payload": [], "error": []}
            for sp_code, sale_date in zip(batch["sp_code"], batch["sale_date"]):
                payload, error = None, None
                try:
                    raw = transport(str(sp_code), str(sale_date))
                    doc = json.loads(raw)
                    if doc.get("ret_code") != "0000":
                        error = f"ret_code={doc.get('ret_code')}"
                    else:
                        payload = json.dumps(doc.get("data", []))
                except Exception as exc:  # per-unit failure is non-fatal (E1 step 5)
                    error = f"{type(exc).__name__}: {exc}"
                out["fetch_sp_code"].append(sp_code)
                out["fetch_sale_date"].append(sale_date)
                out["payload"].append(payload)
                out["error"].append(error)
            yield pd.DataFrame(out)

    return requests_df.mapInPandas(run, schema=RESPONSE_FIELDS)


def decode_payload(responses: DataFrame, row_schema: StructType) -> DataFrame:
    """S5 JSON decode: explode the payload array through an explicit
    schema (never inferred — SURVEY.md §1.2). Error rows are excluded;
    route ``responses.filter(error IS NOT NULL)`` to a quarantine sink.
    """
    from pyspark.sql.types import ArrayType

    ok = responses.filter(F.col("error").isNull())
    rows = ok.select(
        F.col("fetch_sp_code"),
        F.col("fetch_sale_date"),
        F.explode(F.from_json(F.col("payload"), ArrayType(row_schema))).alias("row"),
    )
    return rows.select("fetch_sp_code", "fetch_sale_date", "row.*")
