"""Aggregation / window / set-op / JSON / event-stream query surface.

The reference contains none of these (SURVEY.md §2.6: no ORDER BY,
LIMIT, UNION, window functions anywhere) — they're the free Spark
surface its mart consumers imply, exposed as oracle-checked queries.

Determinism: exact integer sums everywhere (functions/exact.py);
window cumulative sums accumulate integer cents, never doubles;
every ranking has a total order (explicit tiebreaks); session
arithmetic is integer microseconds (unix_micros / epoch_us).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_job_spark.functions import money_sum, qty_sum
from etl_job_spark.plans import kicc
from etl_job_spark.plans.queries import PROD_WINDOW, query
from etl_job_spark.sources import load_table

# ---------------------------------------------------------------------
# TPC-H Q1-style pricing summary — the flagship full-scan aggregation
# ---------------------------------------------------------------------

Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS sum_disc_price,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) / 1000000.0 AS sum_charge,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) / CAST(count(*) AS BIGINT) AS avg_qty,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / CAST(count(*) AS BIGINT) / 100.0 AS avg_price,
       sum(CAST(round(l_discount * 100) AS BIGINT)) / CAST(count(*) AS BIGINT) / 100.0 AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query("pricing_summary", Q1_SQL)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: one scan, map-side partial agg into 6 groups.
    Averages are ratios of exact integer sums, so they are
    order-independent (a plain avg(double) is not)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    cnt = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        qty_sum("l_quantity").alias("sum_qty"),
        money_sum("l_extendedprice").alias("sum_base_price"),
        money_sum(disc, 10000).alias("sum_disc_price"),
        money_sum(charge, 1000000).alias("sum_charge"),
        (qty_sum("l_quantity") / cnt).alias("avg_qty"),
        (F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")) / cnt / 100.0).alias("avg_price"),
        (F.sum(F.round(F.col("l_discount") * 100).cast("bigint")) / cnt / 100.0).alias("avg_disc"),
        cnt.cast("bigint").alias("count_order"),
    )


# ---------------------------------------------------------------------
# TPC-H Q3-style join aggregation with top-N
# ---------------------------------------------------------------------

Q3_SQL = """
SELECT o.o_orderkey,
       sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_orderpriority AS orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderkey
LIMIT 10
"""


@query("shipping_priority", Q3_SQL)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dims broadcast into the fact scan,
    exact-sum revenue, total-ordered top-10 (revenue desc, orderkey)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_sum(disc, 10000).alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------
# TPC-H Q5-style multi-join: local-supplier revenue by nation
# ---------------------------------------------------------------------

Q5_SQL = """
SELECT n.n_name,
       sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue
FROM customer c
JOIN orders o    ON c.c_custkey = o.o_custkey
JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n    ON s.s_nationkey = n.n_nationkey
JOIN region r    ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n.n_name
"""


@query("local_supplier_revenue", Q5_SQL)
def local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the deepest join chain in the suite. All four
    dims (customer/supplier/nation/region) broadcast into the
    orders⋈lineitem fact pipeline — at 100 TB the fact side shuffles
    once (orderkey) and every dim lookup is map-side; the local-
    supplier condition (c_nationkey = s_nationkey) rides the same join."""
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nat = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(sup),
            (li.l_suppkey == sup.s_suppkey) & (cust.c_nationkey == sup.s_nationkey),
        )
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(money_sum(disc, 10000).alias("revenue"))
    )


# ---------------------------------------------------------------------
# Window functions: per-group top-k and lag/cumulative time series
# ---------------------------------------------------------------------

TOPK_SQL = "WITH" + kicc.SQL_KICC_STORE_PRODUCT_SALES + """
, rev AS (
  SELECT sp_code, item_code,
         sum(CAST(round(sale_amt * 10000) AS BIGINT)) / 10000.0 AS revenue
  FROM kicc_store_product_sales
  GROUP BY sp_code, item_code
)
SELECT sp_code, item_code, revenue, rk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY sp_code ORDER BY revenue DESC, item_code) AS BIGINT) AS rk
  FROM rev
) t WHERE rk <= 3
"""


@query("window_topk_products", TOPK_SQL)
def window_topk_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 products per store by revenue — Window.partitionBy +
    row_number with a total order (revenue desc, item_code)."""
    # dated staging (optimization r14): the re-aggregation groups on
    # the native int keys (narrower shuffle than the lpad'd strings;
    # injective, so identical groups) and the strings print once per
    # (store, item) group AFTER the aggregate. The window itself keeps
    # the string keys: partitioning is injective either way, but the
    # row_number tiebreak on item_code must stay byte-identical (lpad
    # is only order-preserving while keys fit the pad width).
    sps = kicc.kicc_store_product_sales_dated(spark, sf_dir)
    rev = (
        sps.groupBy("sp_key", "item_key")
        .agg(money_sum("sale_amt", 10000).alias("revenue"))
        .select(
            F.lpad(F.col("sp_key").cast("string"), 6, "0").alias("sp_code"),
            F.lpad(F.col("item_key").cast("string"), 8, "0").alias("item_code"),
            "revenue",
        )
    )
    w = Window.partitionBy("sp_code").orderBy(F.col("revenue").desc(), F.col("item_code"))
    return (
        rev.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 3)
        .select("sp_code", "item_code", "revenue", "rk")
    )


RANKS_SQL = "WITH" + kicc.SQL_KICC_SALES_DATA + """
, day_rev AS (
  SELECT sale_date, CAST(sum(CAST(round(total_amt * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM kicc_sales_data GROUP BY sale_date
)
SELECT sale_date, rev_cents,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       round(percent_rank() OVER w, 9) AS prnk,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile
FROM day_rev
WINDOW w AS (ORDER BY rev_cents DESC, sale_date)
"""


@query("window_rank_family", RANKS_SQL)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank / ntile over daily revenue —
    the remaining window-function family in one totally-ordered pass
    (integer-cents revenue, explicit date tiebreak)."""
    # dated staging (optimization r14): the day re-aggregation groups
    # on the 4-byte DATE (identical groups — date_format is injective)
    # and the string prints once per day, after the aggregate
    sales = kicc.kicc_sales_data_dated(spark, sf_dir)
    day_rev = (
        sales.groupBy("sale_d")
        .agg(F.sum(F.round(F.col("total_amt") * 100).cast("bigint")).alias("rev_cents"))
        .select(F.date_format("sale_d", "yyyyMMdd").alias("sale_date"), "rev_cents")
    )
    w = Window.orderBy(F.col("rev_cents").desc(), F.col("sale_date"))
    return day_rev.select(
        "sale_date",
        "rev_cents",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.round(F.percent_rank().over(w), 9).alias("prnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


LAG_SQL = "WITH" + kicc.SQL_KICC_SALES_DATA + """
SELECT sp_code, sale_date, total_amt,
       lag(total_amt) OVER w AS prev_amt,
       sum(CAST(round(total_amt * 100) AS BIGINT)) OVER (PARTITION BY sp_code ORDER BY sale_date ROWS UNBOUNDED PRECEDING) / 100.0 AS cum_amt
FROM kicc_sales_data
WINDOW w AS (PARTITION BY sp_code ORDER BY sale_date)
"""


@query("window_day_over_day", LAG_SQL)
def window_day_over_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag + running total per store ordered by day. The running sum
    accumulates integer cents inside the window frame, so it is exact
    and engine-independent (a double running sum would not be)."""
    # dated staging (optimization r14): the window exchange+sort run
    # on (int, date) instead of two strings — identical partitions and
    # per-partition order (both derivations are injective and
    # order-preserving on the key domain); strings print after the
    # window, so they never enter the shuffle
    sales = kicc.kicc_sales_data_dated(spark, sf_dir)
    w = Window.partitionBy("sp_key").orderBy("sale_d")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return sales.select(
        "sp_key",
        "sale_d",
        "total_amt",
        F.lag("total_amt").over(w).alias("prev_amt"),
        (F.sum(F.round(F.col("total_amt") * 100).cast("bigint")).over(wcum) / 100.0).alias("cum_amt"),
    ).select(
        F.lpad(F.col("sp_key").cast("string"), 6, "0").alias("sp_code"),
        F.date_format("sale_d", "yyyyMMdd").alias("sale_date"),
        "total_amt",
        "prev_amt",
        "cum_amt",
    )


TRAILING_SQL = "WITH" + kicc.SQL_KICC_SALES_DATA + """
, daily AS (
  SELECT sp_code, strptime(sale_date, '%Y%m%d')::DATE AS d,
         CAST(sum(CAST(round(total_amt * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM kicc_sales_data GROUP BY 1, 2
)
SELECT sp_code, strftime(d, '%Y-%m-%d') AS day,
       CAST(sum(rev_cents) OVER (
         PARTITION BY sp_code ORDER BY d
         RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS trailing_7d_cents
FROM daily
"""


@query("window_trailing_7d", TRAILING_SQL)
def window_trailing_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-store trailing-7-day revenue — the frame
    is bounded by VALUE distance (6 days back), not row count, so gaps
    in the calendar are handled correctly. Integer-cents arithmetic."""
    # dated staging (optimization r14): the native DATE key feeds the
    # RANGE frame directly — the to_date re-parse of the string the
    # rollup had just printed (a java.time parse per row) is gone, and
    # the day re-aggregation groups on (int, date)
    sales = kicc.kicc_sales_data_dated(spark, sf_dir)
    daily = sales.groupBy(
        "sp_key", F.col("sale_d").alias("d")
    ).agg(F.sum(F.round(F.col("total_amt") * 100).cast("bigint")).cast("bigint").alias("rev_cents"))
    # RANGE frames need a numeric ordering column: days since epoch
    w = (
        Window.partitionBy("sp_key")
        .orderBy(F.unix_date("d"))
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        F.lpad(F.col("sp_key").cast("string"), 6, "0").alias("sp_code"),
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.sum("rev_cents").over(w).cast("bigint").alias("trailing_7d_cents"),
    )


CUBE_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
       count(*) AS n,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@query("cube_flags", CUBE_SQL)
def cube_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with grouping_id — all four
    grouping sets in one pass (Spark expands the cube inside a single
    aggregate, no multi-scan union)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            qty_sum("l_quantity").alias("sum_qty"),
            F.grouping_id().cast("bigint").alias("gid"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "n",
            "sum_qty",
        )
    )


# ---------------------------------------------------------------------
# Grouping sets / rollup
# ---------------------------------------------------------------------

ROLLUP_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("rollup_flags", ROLLUP_SQL)
def rollup_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping() flags — subtotals + grand total in one
    pass (Spark expands grouping sets without rescanning)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
            .cast("bigint")
            .alias("gid"),
            qty_sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "sum_qty",
            "n",
        )
    )


# ---------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------

SETOPS_SQL = "WITH" + kicc.SQL_KICC_SALES_DATA + """
, jan AS (SELECT DISTINCT sp_code FROM kicc_sales_data WHERE sale_date BETWEEN '19980101' AND '19980131'),
  feb AS (SELECT DISTINCT sp_code FROM kicc_sales_data WHERE sale_date BETWEEN '19980201' AND '19980228')
SELECT 'both' AS tag, sp_code FROM (SELECT sp_code FROM jan INTERSECT SELECT sp_code FROM feb) t
UNION ALL
SELECT 'jan_only' AS tag, sp_code FROM (SELECT sp_code FROM jan EXCEPT SELECT sp_code FROM feb) t
UNION ALL
SELECT 'feb_only' AS tag, sp_code FROM (SELECT sp_code FROM feb EXCEPT SELECT sp_code FROM jan) t
"""


@query("set_ops", SETOPS_SQL)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL over store activity in two months."""
    # dated staging (optimization r14): the month windows land on the
    # DATE key (pushed below the rollup to the lineitem scan — each
    # branch aggregates one month, not the full history) and the set
    # ops compare 8-byte ints; sp_code prints per surviving key
    sales = kicc.kicc_sales_data_dated(spark, sf_dir)
    win = kicc.date_window
    jan = sales.filter(F.col("sale_d").between(*win("19980101", "19980131"))).select("sp_key").distinct()
    feb = sales.filter(F.col("sale_d").between(*win("19980201", "19980228"))).select("sp_key").distinct()
    code = F.lpad(F.col("sp_key").cast("string"), 6, "0").alias("sp_code")
    return (
        jan.intersect(feb).select(F.lit("both").alias("tag"), code)
        .unionAll(jan.exceptAll(feb).distinct().select(F.lit("jan_only").alias("tag"), code))
        .unionAll(feb.exceptAll(jan).distinct().select(F.lit("feb_only").alias("tag"), code))
    )


# ---------------------------------------------------------------------
# Global sort + limit
# ---------------------------------------------------------------------

TOPN_SQL = """
SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@query("top_orders", TOPN_SQL)
def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: Spark plans TakeOrderedAndProject — per-partition
    heap + driver merge of N, no full sort at any scale."""
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------
# Distinct aggregates
# ---------------------------------------------------------------------

DISTINCT_SQL = """
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
       count(DISTINCT o_custkey) AS n_customers,
       count(DISTINCT o_orderpriority) AS n_priorities,
       count(*) AS n_orders
FROM orders
GROUP BY 1
"""


@query("distinct_agg", DISTINCT_SQL)
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) per group (Spark expands then
    re-aggregates; approx_count_distinct is the at-scale variant,
    kept out of the oracle set because it is approximate)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month"))
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------
# Events: JSON extraction (S5 analog on the events stream table)
# ---------------------------------------------------------------------

JSON_SQL = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
"""


@query("events_json_extract", JSON_SQL)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object over the props JSON column — schema-on-read with
    missing-key → NULL semantics, same as the reference's dict.get."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------
# Events: tumbling window aggregation (batch analog of streaming §2.8)
# ---------------------------------------------------------------------

TUMBLING_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS window_start,
       event_type,
       count(*) AS n,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM events
GROUP BY 1, 2
"""


@query("events_tumbling_hourly", TUMBLING_SQL)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows over the events table — the batch twin of
    the streaming pipeline in etl_job_spark/streaming (same grouping,
    watermark added there)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias("window_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0).alias("sum_value"),
    )


# ---------------------------------------------------------------------
# Events: sessionization (gap-based) via window functions
# ---------------------------------------------------------------------

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes in microseconds

SESSION_SQL = f"""
WITH seq AS (
  SELECT user_id, epoch_us(ts) AS t_us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
              OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, t_us,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY t_us ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM seq
)
SELECT user_id, session_id,
       count(*) AS n_events,
       CAST(max(t_us) - min(t_us) AS BIGINT) AS duration_us
FROM sess
GROUP BY user_id, session_id
"""


FIRST_LAST_SQL = "WITH" + kicc.SQL_KICC_SALES_DATA + """
SELECT sp_code,
       min(sale_date) AS first_day,
       max(sale_date) AS last_day,
       CAST(arg_min(CAST(round(total_amt * 100) AS BIGINT), sale_date) AS BIGINT) AS first_day_cents,
       CAST(arg_max(CAST(round(total_amt * 100) AS BIGINT), sale_date) AS BIGINT) AS last_day_cents
FROM kicc_sales_data
GROUP BY sp_code
"""


@query("window_first_last", FIRST_LAST_SQL)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-store first/last trading day and that day's revenue —
    min_by/max_by ordered lookups (DuckDB arg_min/arg_max), the
    aggregate form of first_value/last_value. sale_date is unique per
    store at this grain, so the ordered pick is deterministic."""
    # dated staging (optimization r14): min/max/min_by/max_by order by
    # the DATE key (same order as the fixed-width yyyyMMdd string —
    # date_format is monotonic), the groupBy shuffles an int key, and
    # the two day strings print once per store
    sales = kicc.kicc_sales_data_dated(spark, sf_dir).select(
        "sp_key", "sale_d", F.round(F.col("total_amt") * 100).cast("bigint").alias("cents")
    )
    return sales.groupBy("sp_key").agg(
        F.min("sale_d").alias("first_d"),
        F.max("sale_d").alias("last_d"),
        F.expr("min_by(cents, sale_d)").cast("bigint").alias("first_day_cents"),
        F.expr("max_by(cents, sale_d)").cast("bigint").alias("last_day_cents"),
    ).select(
        F.lpad(F.col("sp_key").cast("string"), 6, "0").alias("sp_code"),
        F.date_format("first_d", "yyyyMMdd").alias("first_day"),
        F.date_format("last_d", "yyyyMMdd").alias("last_day"),
        "first_day_cents",
        "last_day_cents",
    )


ZSCORE_SQL = """
WITH stats AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s1,
         CAST(sum(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s2
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       round((CAST(round(e.value * 100) AS BIGINT) - s.s1 / CAST(s.n AS DOUBLE))
         / sqrt(s.s2 / CAST(s.n AS DOUBLE) - (s.s1 / CAST(s.n AS DOUBLE)) * (s.s1 / CAST(s.n AS DOUBLE))), 6) AS zscore
FROM events e JOIN stats s ON e.event_type = s.event_type
WHERE abs((CAST(round(e.value * 100) AS BIGINT) - s.s1 / CAST(s.n AS DOUBLE))
        / sqrt(s.s2 / CAST(s.n AS DOUBLE) - (s.s1 / CAST(s.n AS DOUBLE)) * (s.s1 / CAST(s.n AS DOUBLE)))) >= 1.8
"""


@query("events_zscore_anomalies", ZSCORE_SQL)
def events_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers (|z| ≥ 1.8): moments from exact
    integer-cents sums (one aggregate, broadcast back over the fact),
    so mean/variance are order-independent; the z quotient rounds to
    6 decimals to absorb engine sqrt/div ULP."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "v_cents", F.round(F.col("value") * 100).cast("bigint")
    )
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v_cents").alias("s1"),
        F.sum(F.col("v_cents") * F.col("v_cents")).alias("s2"),
    )
    mean = F.col("s1") / F.col("n").cast("double")
    var = F.col("s2") / F.col("n").cast("double") - mean * mean
    z = (F.col("v_cents") - mean) / F.sqrt(var)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) >= 1.8)
        .select("event_id", "event_type", F.round(z, 6).alias("zscore"))
    )


RANGE_JOIN_SQL = """
WITH months AS (
  SELECT m AS month_start,
         m + INTERVAL 1 MONTH AS month_end,
         strftime(m, '%Y-%m') AS ym
  FROM (SELECT unnest(generate_series(DATE '1992-01-01', DATE '2002-12-01', INTERVAL 1 MONTH))::DATE AS m)
)
SELECT ym, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
JOIN months ON o_orderdate >= month_start AND o_orderdate < month_end
GROUP BY ym
"""


@query("orders_month_range_join", RANGE_JOIN_SQL)
def orders_month_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) join: each order lands in the month interval
    containing it. The month dimension is tiny and broadcast, so the
    fact side streams through a nested-loop probe against ~130
    intervals without shuffling — the general pattern for interval
    dimensions (calendars, SLA buckets, rate tables) that equality
    joins can't express. (Where an equality rewrite exists — here,
    date_trunc — prefer it; this query is the oracle-checked
    demonstration that the general form is available and correct.)"""
    orders = load_table(spark, sf_dir, "orders")
    months = spark.sql(
        "SELECT m AS month_start, add_months(m, 1) AS month_end, date_format(m, 'yyyy-MM') AS ym "
        "FROM (SELECT explode(sequence(to_date('1992-01-01'), to_date('2002-12-01'), "
        "interval 1 month)) AS m)"
    )
    return (
        orders.join(
            F.broadcast(months),
            (F.col("o_orderdate") >= F.col("month_start"))
            & (F.col("o_orderdate") < F.col("month_end")),
        )
        .groupBy("ym")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).cast("bigint").alias("total_cents"),
        )
    )


def sketch_cardinalities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ cardinality estimates beside their exact answers, with the
    relative error materialized. Registered WITHOUT an oracle: sketch
    estimates are engine-specific, so the driver records a rows-only
    check here while tests/test_sketches.py bounds the error — the
    guarantee a user actually gets from a sketch."""
    from etl_job_spark.functions.sketches import approx_distinct

    li = load_table(spark, sf_dir, "lineitem")
    out = li.agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        approx_distinct("l_orderkey").alias("approx_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        approx_distinct("l_partkey").alias("approx_parts"),
    )
    return out.select(
        "exact_orders",
        "approx_orders",
        (F.abs(F.col("approx_orders") - F.col("exact_orders")) / F.col("exact_orders")).alias(
            "orders_rel_err"
        ),
        "exact_parts",
        "approx_parts",
        (F.abs(F.col("approx_parts") - F.col("exact_parts")) / F.col("exact_parts")).alias(
            "parts_rel_err"
        ),
    )


query("sketch_cardinalities")(sketch_cardinalities)  # rows-only: no portable oracle


STRING_FN_SQL = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       substr(p_name, 1, 10) AS name_prefix,
       replace(p_type, ' ', '_') AS type_snake,
       regexp_extract(p_type, '^([A-Z]+)', 1) AS type_first_word,
       CAST(length(p_name) AS BIGINT) AS name_len,
       concat_ws('|', p_brand, CAST(p_size AS VARCHAR)) AS brand_size,
       CAST(len(string_split(p_name, ' ')) AS BIGINT) AS name_words
FROM part
"""


@query("string_functions", STRING_FN_SQL)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string surface in one pass: case, substring, replace,
    regexp extraction, length, concat, split — all JVM expressions
    inside whole-stage codegen (never a Python UDF for these)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.regexp_extract("p_type", r"^([A-Z]+)", 1).alias("type_first_word"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.concat_ws("|", "p_brand", F.col("p_size").cast("string")).alias("brand_size"),
        F.size(F.split("p_name", " ")).cast("bigint").alias("name_words"),
    )


FULL_OUTER_SQL = "WITH" + kicc.SQL_KICC_SALES_DATA + """
, a AS (
  SELECT sp_code, CAST(sum(CAST(round(total_amt * 100) AS BIGINT)) AS BIGINT) AS rev_1997
  FROM kicc_sales_data WHERE sale_date BETWEEN '19970101' AND '19971231' GROUP BY sp_code
), b AS (
  SELECT sp_code, CAST(sum(CAST(round(total_amt * 100) AS BIGINT)) AS BIGINT) AS rev_1998
  FROM kicc_sales_data WHERE sale_date BETWEEN '19980101' AND '19981231' GROUP BY sp_code
)
SELECT coalesce(a.sp_code, b.sp_code) AS sp_code,
       coalesce(a.rev_1997, 0) AS rev_1997,
       coalesce(b.rev_1998, 0) AS rev_1998,
       coalesce(b.rev_1998, 0) - coalesce(a.rev_1997, 0) AS delta_cents
FROM a FULL OUTER JOIN b ON a.sp_code = b.sp_code
"""


@query("full_outer_year_compare", FULL_OUTER_SQL)
def full_outer_year_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (absent from the reference, SURVEY.md §2.4
    'not present'): year-over-year store revenue where stores may
    exist in either year only — null-side rows coalesce to 0."""
    # dated staging (optimization r14): each year window filters the
    # DATE key (pushed below the rollup to the lineitem scan — each
    # branch aggregates one year, not the full history), the full
    # outer join keys on the int, sp_code prints per store at the end
    sales = kicc.kicc_sales_data_dated(spark, sf_dir)
    cents = F.sum(F.round(F.col("total_amt") * 100).cast("bigint")).cast("bigint")

    def year(lo: str, hi: str, alias: str):
        return (
            sales.filter(F.col("sale_d").between(*kicc.date_window(lo, hi)))
            .groupBy("sp_key")
            .agg(cents.alias(alias))
        )

    a = year("19970101", "19971231", "rev_1997")
    b = year("19980101", "19981231", "rev_1998")
    return (
        a.join(b, "sp_key", "full_outer")
        .select(
            F.lpad(F.col("sp_key").cast("string"), 6, "0").alias("sp_code"),
            F.coalesce("rev_1997", F.lit(0)).alias("rev_1997"),
            F.coalesce("rev_1998", F.lit(0)).alias("rev_1998"),
            (F.coalesce("rev_1998", F.lit(0)) - F.coalesce("rev_1997", F.lit(0))).alias(
                "delta_cents"
            ),
        )
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

PIVOT_SQL = """
SELECT user_id,
       """ + ",\n       ".join(
    f"count(*) FILTER (WHERE event_type = '{t}') AS n_{t}" for t in EVENT_TYPES
) + """
FROM events
GROUP BY user_id
"""


@query("events_pivot_by_type", PIVOT_SQL)
def events_pivot_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event counts, one column per type. The value
    list is FIXED (schema can't depend on data — a discovery pass at
    100 TB would be its own scan); Spark compiles this to one hash
    aggregate with conditional counts, same as the oracle's FILTER."""
    ev = load_table(spark, sf_dir, "events")
    piv = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}") for t in EVENT_TYPES],
    )


MEDIAN_SQL = """
SELECT event_type,
       quantile_cont(v_cents, 0.5) AS median_cents,
       quantile_cont(v_cents, 0.9) AS p90_cents
FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_cents FROM events) t
GROUP BY event_type
"""


@query("events_exact_percentiles", MEDIAN_SQL)
def events_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median/p90 over integer cents: linear-interpolated
    percentile of integers is exact double arithmetic, so engines
    agree bit-for-bit. (At 100 TB you'd reach for approx_percentile —
    kept out of the oracle suite because its sketch is
    engine-specific; this is the exact reference beside it.)"""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("v_cents")
    )
    return ev.groupBy("event_type").agg(
        F.expr("percentile(v_cents, 0.5)").alias("median_cents"),
        F.expr("percentile(v_cents, 0.9)").alias("p90_cents"),
    )


@query("events_percentiles_freqmap", MEDIAN_SQL)
def events_percentiles_freqmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME percentiles as ``events_exact_percentiles``, computed
    by the skew-proof frequency-map rewrite
    (``operators.skew.exact_group_percentiles``): the built-in
    ``percentile`` buffers every row of a group in ONE aggregation
    state — a hot event_type at 100 TB serializes into a single task —
    while the rewrite reduces rows to (key, value) counts with
    map-side combine and evaluates the interpolation over the bounded
    frequency table. Same oracle as the holistic twin, so the rewrite
    is proven exactly equivalent, not approximately."""
    from etl_job_spark.operators.skew import exact_group_percentiles

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("v_cents")
    )
    return exact_group_percentiles(
        ev,
        ["event_type"],
        "v_cents",
        [(0.5, "median_cents"), (0.9, "p90_cents")],
    )


SLIDE_US = 15 * 60 * 1_000_000
DUR_US = 60 * 60 * 1_000_000

SLIDING_SQL = f"""
SELECT strftime(to_timestamp((w_start_us) / 1000000.0), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n
FROM (
  SELECT event_type,
         (epoch_us(ts) // {SLIDE_US}) * {SLIDE_US} - k * {SLIDE_US} AS w_start_us,
         epoch_us(ts) AS t_us
  FROM events, (SELECT unnest(generate_series(0, {DUR_US // SLIDE_US} - 1)) AS k) ks
) t
WHERE t_us < w_start_us + {DUR_US}
GROUP BY 1, 2
"""


@query("events_sliding_hourly", SLIDING_SQL)
def events_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 minutes: each event lands in 4
    overlapping windows (F.window duration/slide — same operator the
    streaming twin uses). The oracle derives the window set from
    integer-microsecond arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )


ASOF_SQL = """
SELECT p.event_id,
       p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       coalesce(v.event_id, -1) AS view_event_id,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
"""


@query("asof_view_attribution", ASOF_SQL)
def asof_view_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): for each purchase event, the
    most recent prior view by the same user — classic attribution.
    One shuffle on user_id, no range-join explosion; DuckDB's native
    ASOF JOIN is the oracle."""
    from etl_job_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    joined = asof_join(
        purchases, views, keys=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["event_id"], suffix="_view",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        # coalesce: keeps the column non-null bigint so pandas never
        # promotes it to float in any comparison path
        F.coalesce(F.col("event_id_view"), F.lit(-1)).alias("view_event_id"),
        F.date_format("ts_view", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("view_ts"),
    )


@query("events_sessionize", SESSION_SQL)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (30-min inactivity) with lag + running count —
    pure window composition, integer-microsecond arithmetic. The
    streaming twin uses session_window / applyInPandasWithState."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("t_us"), "event_id", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn(
        "is_new",
        F.when(
            (F.col("t_us") - F.lag("t_us").over(w) > SESSION_GAP_US)
            | F.lag("t_us").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    wcum = Window.partitionBy("user_id").orderBy("t_us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = seq.withColumn("session_id", F.sum("is_new").over(wcum).cast("bigint"))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("t_us") - F.min("t_us")).cast("bigint").alias("duration_us"),
    )
