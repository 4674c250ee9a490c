"""KICC-shaped staging views derived from the driver's TPC-H tables
(FIXTURES.md §B), with the matching DuckDB CTE SQL colocated so every
downstream query and its correctness oracle share one definition.

These reproduce the reference's staging grains (SURVEY.md §1.3):
- kicc_store_list   ← supplier ⋈ nation ⋈ region   (key: sp_code)
- kicc_sales_data   ← lineitem store-day rollup     (key: sp_code, sale_date)
- kicc_product_list ← part                          (key: item_code)
- kicc_store_product_sales ← lineitem ⋈ part rollup (key: sp_code, sale_date,
                                                     item_code, item_name)
- tb_store_temp / tb_store_easypos — tiny enrichment dims (J1/J2),
  tb_store_temp deliberately covers only ~80% of stores so unmatched
  fact rows exercise the reference's keep-old-value semantics.

Scale notes: the rollups are single-shuffle groupBys with map-side
partial aggregation; the A2 grain (SURVEY.md §2.5) is exactly what the
reference's POS API pre-aggregates, so this engine owns it. Dimension
joins downstream broadcast (suppliers/nations/regions are small by
construction at any SF — classic star schema).

The reference stores sale_date as varchar YYYYMMDD (SURVEY.md §1.4);
these views preserve that, and the staging→mart boundary applies
``to_date`` exactly like kicc_to_tb_sales.py:72.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_job_spark.functions import money_sum, qty_sum
from etl_job_spark.sources import load_table

EXCLUDED_STORE = "000002"  # P3: load_store_data.py:69-72 skips sp_code 000002


def date_window(lo: str, hi: str):
    """``sale_d BETWEEN`` bounds for a YYYYMMDD string window.

    ``sale_date BETWEEN '19980101' AND '19980331'`` on the string
    grain is exactly ``sale_d BETWEEN DATE'1998-01-01' AND
    DATE'1998-03-31'`` on the native grain (fixed-width digit strings
    order chronologically), and the DATE form pushes to the lineitem
    parquet scan as an l_shipdate range — the string form never
    reached the scan at all (it compared a post-agg derivation)."""
    iso = lambda s: f"{s[:4]}-{s[4:6]}-{s[6:]}"  # noqa: E731
    return F.to_date(F.lit(iso(lo))), F.to_date(F.lit(iso(hi)))


# ---------------------------------------------------------------- Spark side

def kicc_store_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select(
            F.lit("I9X").alias("hd_code"),
            F.lpad(F.col("s_suppkey").cast("string"), 6, "0").alias("sp_code"),
            F.col("s_name").alias("sp_name"),
            F.when(F.col("s_acctbal") >= 0, F.lit("1")).otherwise(F.lit("0")).alias("open_flag"),
            F.col("n_name").alias("area_code"),
            F.col("r_name").alias("brand_name"),
        )
    )


def kicc_sales_data_dated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store-day staging rollup grouped on the NATIVE keys — the int
    supplier key and the DATE ship date — exposed as (sp_key, sale_d)
    alongside the aggregates and sp_name.

    Why this exists (optimization r14, guide §2.3 "narrower types" +
    §1.2 "per-task work"): the original rollup grouped by
    ``lpad(l_suppkey)`` / ``date_format(l_shipdate)``, which (a)
    computed two string derivations per INPUT row before the partial
    aggregation, (b) shuffled 14 bytes of string key where 8 bytes of
    int+date suffice, and (c) forced every downstream consumer that
    needs a real date to RE-PARSE the string it had just printed —
    ``to_date(sale_date, 'yyyyMMdd')`` per output row, a java.time
    parse (allocation-heavy, ~10-100x the cost of the comparison it
    feeds) that moreover lands in the single AQE-coalesced post-agg
    partition. Grouping by the native columns is result-identical
    (lpad and date_format are injective on the key domains) and lets
    date-window consumers filter ``sale_d BETWEEN DATE…``, which
    pushes to the parquet scan as an l_shipdate range
    (PushedFilters), where the string form never could.

    Key-domain bound (ADVICE r14): the lpad injectivity argument holds
    only while keys FIT their pad width — Spark's lpad TRUNCATES
    longer strings, so at suppkey ≥ 10^6 (sf ≥ ~100 under TPC-H
    scaling) the old string-grouped rollup silently MERGED colliding
    keys while this rollup keeps them distinct and prints duplicate
    sp_code values (same bound for item_code at partkey ≥ 10^8).
    Within the width the derivations are equal; past it the reference
    string grain itself is ill-defined — widen the pads with the key
    domain if the fixture ever grows there.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    agg = (
        li.groupBy(
            F.col("l_suppkey").alias("sp_key"),
            # cast, not to_date-with-format: the fixture stores shipdate
            # as TIMESTAMP(MICROS) — the cast is integer day extraction
            # (no java.time), and it pins the grain to the DAY exactly
            # like the date_format key it replaces
            F.col("l_shipdate").cast("date").alias("sale_d"),
        )
        .agg(
            money_sum("l_extendedprice").alias("total_amt"),
            (money_sum(disc, 10000)).alias("sale_amt"),
            (money_sum(charge, 1000000)).alias("net_amt"),
            (money_sum(F.col("l_extendedprice") * F.col("l_discount"), 10000)).alias("total_dc_amt"),
            (money_sum(F.col("l_extendedprice") * F.col("l_tax"), 10000)).alias("vat_amt"),
            F.countDistinct("l_orderkey").alias("bill_qty"),
            money_sum(F.when(F.col("l_returnflag") == "N", disc).otherwise(F.lit(0.0)), 10000).alias("cash_amt"),
            money_sum(F.when(F.col("l_returnflag") == "A", disc).otherwise(F.lit(0.0)), 10000).alias("card_amt"),
            money_sum(F.when(F.col("l_returnflag") == "R", disc).otherwise(F.lit(0.0)), 10000).alias("emoney_amt"),
        )
    )
    sup_dim = sup.select(
        F.col("s_suppkey").alias("sp_key"),
        F.col("s_name").alias("sp_name"),
    )
    return agg.join(F.broadcast(sup_dim), "sp_key", "left")


def kicc_sales_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store-day staging rollup (A2 grain of load_sales_data.py
    s_code=3) — the reference string grain (sp_code varchar(6),
    sale_date varchar YYYYMMDD), derived once per GROUP from the
    native-key rollup above (bit-identical: lpad/date_format are the
    same injective derivations the groupBy keys used to run per row)."""
    d = kicc_sales_data_dated(spark, sf_dir)
    return d.select(
        F.lpad(F.col("sp_key").cast("string"), 6, "0").alias("sp_code"),
        F.date_format("sale_d", "yyyyMMdd").alias("sale_date"),
        "total_amt",
        "sale_amt",
        "net_amt",
        "total_dc_amt",
        "vat_amt",
        "bill_qty",
        "cash_amt",
        "card_amt",
        "emoney_amt",
        "sp_name",
    )


def kicc_product_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("item_code"),
        F.col("p_name").alias("item_name"),
        F.col("p_brand").alias("large_scale_nm"),
        # ~20% nulled to exercise the J3 backfill (FIXTURES.md §B)
        F.when(F.col("p_partkey") % 5 == 0, F.lit(None)).otherwise(F.col("p_type")).alias("medium_scale_nm"),
        F.col("p_size").cast("string").alias("small_scale_nm"),
        (F.round(F.col("p_retailprice") * F.lit(0.6), 2)).alias("item_cost"),
        F.col("p_retailprice").alias("item_price"),
    )


def kicc_store_product_sales_dated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store-day-item rollup on NATIVE keys (sp_key int, sale_d date,
    item_key int) with item_code/item_name attached per GROUP.

    Same optimization as :func:`kicc_sales_data_dated`, plus one join
    move (guide §3.3 "explode before a join multiplies the shuffle",
    dual): the part dim used to broadcast-join BEFORE the rollup, so
    every lineitem row carried item_code+item_name (~35 bytes of
    string) into the shuffle as grouping keys; joining AFTER the
    rollup attaches them once per group. Result-identical: the join
    key l_partkey is the same rows either side of the aggregate
    (inner-join existence commutes with grouping on the join key —
    groups on (sp, d, partkey) survive iff their partkey matches,
    exactly the rows the pre-agg join kept), and
    (item_code, item_name) are functions of p_partkey."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    part_dim = F.broadcast(
        part.select(
            F.col("p_partkey").alias("item_key"),
            F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("item_code"),
            F.col("p_name").alias("item_name"),
        )
    )
    agg = (
        li.groupBy(
            F.col("l_suppkey").alias("sp_key"),
            F.col("l_shipdate").cast("date").alias("sale_d"),
            F.col("l_partkey").alias("item_key"),
        )
        .agg(
            qty_sum("l_quantity").alias("sale_qty"),
            money_sum("l_extendedprice").alias("total_amt"),
            money_sum(disc, 10000).alias("sale_amt"),
            money_sum(F.col("l_extendedprice") * F.col("l_discount"), 10000).alias("total_dc_amt"),
            money_sum(F.col("l_extendedprice") * F.col("l_tax"), 10000).alias("vat_amt"),
        )
    )
    return agg.join(part_dim, "item_key")


def kicc_store_product_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store-day-item staging rollup (A2 grain of s_code=12) — the
    reference string grain, derived once per group (see
    :func:`kicc_store_product_sales_dated`)."""
    d = kicc_store_product_sales_dated(spark, sf_dir)
    return d.select(
        F.lpad(F.col("sp_key").cast("string"), 6, "0").alias("sp_code"),
        F.date_format("sale_d", "yyyyMMdd").alias("sale_date"),
        "item_code",
        "item_name",
        "sale_qty",
        "total_amt",
        "sale_amt",
        "total_dc_amt",
        "vat_amt",
    )


def tb_store_temp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrichment dim for J1 (kicc_to_tb_sales.py:109-113): covers only
    stores with s_suppkey % 5 != 0 → unmatched facts keep old value."""
    sup = load_table(spark, sf_dir, "supplier")
    return sup.filter(F.col("s_suppkey") % 5 != 0).select(
        F.lpad(F.col("s_suppkey").cast("string"), 6, "0").alias("chain_no"),
        F.concat(F.lit("resp_"), F.col("s_nationkey").cast("string")).alias("resp"),
    )


def tb_store_easypos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrichment dim for J2 (kicc_to_tb_sales.py:118-122): full coverage."""
    sup = load_table(spark, sf_dir, "supplier")
    return sup.select(
        F.lpad(F.col("s_suppkey").cast("string"), 6, "0").alias("chain_no"),
        F.concat(F.col("s_nationkey").cast("string"), F.lit(","), F.col("s_suppkey").cast("string")).alias("xy_degree"),
    )


# --------------------------------------------------------- DuckDB oracle CTEs
# Textually distinct but semantically identical definitions for the
# correctness oracle. Exact-integer money sums keep both engines
# bit-identical (see functions/exact.py).

SQL_KICC_STORE_LIST = """
kicc_store_list AS (
  SELECT 'I9X' AS hd_code,
         lpad(CAST(s_suppkey AS VARCHAR), 6, '0') AS sp_code,
         s_name AS sp_name,
         CASE WHEN s_acctbal >= 0 THEN '1' ELSE '0' END AS open_flag,
         n_name AS area_code,
         r_name AS brand_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
)"""

SQL_KICC_SALES_DATA = """
kicc_sales_data AS (
  SELECT a.*, s.s_name AS sp_name
  FROM (
    SELECT lpad(CAST(l_suppkey AS VARCHAR), 6, '0') AS sp_code,
           strftime(l_shipdate, '%Y%m%d') AS sale_date,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS total_amt,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS sale_amt,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) / 1000000.0 AS net_amt,
           sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) / 10000.0 AS total_dc_amt,
           sum(CAST(round(l_extendedprice * l_tax * 10000) AS BIGINT)) / 10000.0 AS vat_amt,
           count(DISTINCT l_orderkey) AS bill_qty,
           sum(CAST(round(CASE WHEN l_returnflag = 'N' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END * 10000) AS BIGINT)) / 10000.0 AS cash_amt,
           sum(CAST(round(CASE WHEN l_returnflag = 'A' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END * 10000) AS BIGINT)) / 10000.0 AS card_amt,
           sum(CAST(round(CASE WHEN l_returnflag = 'R' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END * 10000) AS BIGINT)) / 10000.0 AS emoney_amt
    FROM lineitem
    GROUP BY 1, 2
  ) a
  LEFT JOIN supplier s ON a.sp_code = lpad(CAST(s.s_suppkey AS VARCHAR), 6, '0')
)"""

SQL_KICC_PRODUCT_LIST = """
kicc_product_list AS (
  SELECT lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS item_code,
         p_name AS item_name,
         p_brand AS large_scale_nm,
         CASE WHEN p_partkey % 5 = 0 THEN NULL ELSE p_type END AS medium_scale_nm,
         CAST(p_size AS VARCHAR) AS small_scale_nm,
         round(p_retailprice * 0.6, 2) AS item_cost,
         p_retailprice AS item_price
  FROM part
)"""

SQL_KICC_STORE_PRODUCT_SALES = """
kicc_store_product_sales AS (
  SELECT lpad(CAST(l_suppkey AS VARCHAR), 6, '0') AS sp_code,
         strftime(l_shipdate, '%Y%m%d') AS sale_date,
         lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS item_code,
         p_name AS item_name,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sale_qty,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS total_amt,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS sale_amt,
         sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) / 10000.0 AS total_dc_amt,
         sum(CAST(round(l_extendedprice * l_tax * 10000) AS BIGINT)) / 10000.0 AS vat_amt
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2, 3, 4
)"""

SQL_TB_STORE_TEMP = """
tb_store_temp AS (
  SELECT lpad(CAST(s_suppkey AS VARCHAR), 6, '0') AS chain_no,
         'resp_' || CAST(s_nationkey AS VARCHAR) AS resp
  FROM supplier WHERE s_suppkey % 5 <> 0
)"""

SQL_TB_STORE_EASYPOS = """
tb_store_easypos AS (
  SELECT lpad(CAST(s_suppkey AS VARCHAR), 6, '0') AS chain_no,
         CAST(s_nationkey AS VARCHAR) || ',' || CAST(s_suppkey AS VARCHAR) AS xy_degree
  FROM supplier
)"""
