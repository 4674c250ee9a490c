"""Schema registry (SURVEY.md §1.2-§1.4).

The reference implies schemas via hand-written INSERT column lists
(e.g. /root/reference/load_sales_data.py:57-65); this engine declares
them as explicit ``StructType``s so JSON ingestion uses
``from_json(schema)`` — a missing key becomes NULL, matching the
reference's ``dict.get`` semantics (load_sales_data.py:105-126) —
and production paths never rely on runtime inference.

Two groups:
- driver tables: the TPC-H-ish test fixtures (FIXTURES.md §A);
- KICC staging/mart tables: the reference's catalog (SURVEY.md §1.3),
  typed per the §1.4 type map (codes/names → string, qty → long,
  amounts → double here for oracle parity; a production deployment
  would use DecimalType(18,2) at the mart).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _st(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


# ---------------------------------------------------------------- driver tables

REGION = _st(("r_regionkey", IntegerType()), ("r_name", StringType()))

NATION = _st(
    ("n_nationkey", IntegerType()),
    ("n_name", StringType()),
    ("n_regionkey", IntegerType()),
)

CUSTOMER = _st(
    ("c_custkey", LongType()),
    ("c_name", StringType()),
    ("c_nationkey", IntegerType()),
    ("c_acctbal", DoubleType()),
    ("c_mktsegment", StringType()),
)

SUPPLIER = _st(
    ("s_suppkey", LongType()),
    ("s_name", StringType()),
    ("s_nationkey", IntegerType()),
    ("s_acctbal", DoubleType()),
)

PART = _st(
    ("p_partkey", LongType()),
    ("p_name", StringType()),
    ("p_brand", StringType()),
    ("p_type", StringType()),
    ("p_size", IntegerType()),
    ("p_retailprice", DoubleType()),
)

ORDERS = _st(
    ("o_orderkey", LongType()),
    ("o_custkey", LongType()),
    ("o_orderstatus", StringType()),
    ("o_totalprice", DoubleType()),
    ("o_orderdate", TimestampType()),
    ("o_orderpriority", StringType()),
)

LINEITEM = _st(
    ("l_orderkey", LongType()),
    ("l_partkey", LongType()),
    ("l_suppkey", LongType()),
    ("l_linenumber", IntegerType()),
    ("l_quantity", DoubleType()),
    ("l_extendedprice", DoubleType()),
    ("l_discount", DoubleType()),
    ("l_tax", DoubleType()),
    ("l_returnflag", StringType()),
    ("l_linestatus", StringType()),
    ("l_shipdate", TimestampType()),
)

EVENTS = _st(
    ("event_id", LongType()),
    ("ts", TimestampType()),
    ("user_id", LongType()),
    ("event_type", StringType()),
    ("value", DoubleType()),
    ("props", StringType()),
)

DOCUMENTS = _st(
    ("doc_id", LongType()),
    ("text", StringType()),
    ("lang", StringType()),
    ("source", StringType()),
    ("n_chars", LongType()),
)

EMBEDDINGS = _st(
    ("vec_id", LongType()),
    ("embedding", ArrayType(FloatType())),
    ("label", IntegerType()),
)

DRIVER_TABLES: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# -------------------------------------------------- KICC staging/mart catalog
# Column lists per SURVEY.md §1.3 (sources cited there into /root/reference).

KICC_STORE_LIST = _st(
    ("hd_code", StringType()),
    ("sp_code", StringType()),
    ("sp_name", StringType()),
    ("biz_no", StringType()),
    ("open_flag", StringType()),
    ("erp_sp_code", StringType()),
    ("master_name", StringType()),
    ("tel_no", StringType()),
    ("sp_type", StringType()),
    ("area_code", StringType()),
    ("sale_class_code", StringType()),
    ("sale_class_name", StringType()),
    ("address1", StringType()),
    ("address2", StringType()),
    ("brand_code", StringType()),
    ("brand_name", StringType()),
)

KICC_SALES_DATA = _st(
    ("sp_code", StringType()),
    ("sale_date", StringType()),  # varchar YYYYMMDD in staging, like the reference
    ("hd_code", StringType()),
    ("sp_name", StringType()),
    ("biz_no", StringType()),
    ("total_amt", DoubleType()),
    ("sale_amt", DoubleType()),
    ("net_amt", DoubleType()),
    ("total_dc_amt", DoubleType()),
    ("vat_amt", DoubleType()),
    ("bill_qty", LongType()),
    ("normal_qty", LongType()),
    ("normal_amt", DoubleType()),
    ("return_qty", LongType()),
    ("return_amt", DoubleType()),
    ("service_amt", DoubleType()),
    ("cash_qty", LongType()),
    ("cash_amt", DoubleType()),
    ("card_qty", LongType()),
    ("card_amt", DoubleType()),
    ("emoney_qty", LongType()),
    ("emoney_amt", DoubleType()),
)

KICC_PRODUCT_LIST = _st(
    ("hd_code", StringType()),
    ("sp_code", StringType()),
    ("item_code", StringType()),
    ("item_name", StringType()),
    ("large_scale_nm", StringType()),
    ("medium_scale_nm", StringType()),
    ("small_scale_nm", StringType()),
    ("item_cost", DoubleType()),
    ("item_price", DoubleType()),
)

KICC_STORE_PRODUCT_SALES = _st(
    ("hd_code", StringType()),
    ("sp_code", StringType()),
    ("sp_name", StringType()),
    ("biz_no", StringType()),
    ("sale_date", StringType()),
    ("item_code", StringType()),
    ("item_name", StringType()),
    ("sale_qty", LongType()),
    ("total_amt", DoubleType()),
    ("sale_amt", DoubleType()),
    ("net_amt", DoubleType()),
    ("total_dc_amt", DoubleType()),
    ("vat_amt", DoubleType()),
)

# logical keys (SURVEY.md §1.3) — used by merge_upsert callers
LOGICAL_KEYS: dict[str, list[str]] = {
    "kicc_store_list": ["sp_code"],
    "kicc_sales_data": ["sp_code", "sale_date"],
    "kicc_store_product_sales": ["sp_code", "sale_date", "item_code", "item_name"],
    "tb_sales_by_store": ["chain_no", "sale_dy"],
    "tb_sales_by_prod": ["chain_no", "sale_dy", "prod_code"],
}
