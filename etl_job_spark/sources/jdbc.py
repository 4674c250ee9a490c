"""JDBC source/sink — the reference's actual storage boundary.

The reference stores everything in MySQL and touches it one row at a
time over pymysql (connection config /root/reference/load_sales_data.py:8-13;
per-row exists-probe/UPDATE/INSERT load_sales_data.py:35-40,129-134).
This module is the Spark-native replacement: set-oriented JDBC reads
with predicate pushdown and range-partitioned parallelism, batched
writes, and a true server-side MERGE built from a staged batch — one
statement per batch instead of three round-trips per row.

Scale notes (100 TB context):
- a JDBC source is a bandwidth-bound single stream unless partitioned;
  ``read_table`` splits on a numeric/date column into N concurrent
  range queries (bounds auto-discovered with one MIN/MAX query when
  not given) — this is what makes a bulk extract saturate the DB's
  read capacity instead of one connection's;
- Catalyst pushes filters and column pruning into the generated SQL
  (`PushedFilters` on the JDBCRelation scan — pinned by plan test), so
  a daily extract reads a day, not the table;
- the merge writer stages the batch into a temp table with batched
  inserts, then issues ONE ANSI ``MERGE`` on the server: the database
  applies the upsert with its own index, no per-key round-trips. This
  is the exact replacement for the reference's per-row branch.

Tested against Apache Derby (embedded, ships with Spark); the config
carries any JDBC url/driver — for the reference's MySQL the url is
``jdbc:mysql://host/db`` with the Connector/J driver on the executor
classpath and ``merge_dialect="mysql"`` (INSERT … ON DUPLICATE KEY).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcConfig:
    """Connection descriptor. Secrets should come from the environment
    or a secret manager at deploy time — never from code (the reference
    hard-codes its production password in a public file; that is one of
    the pathologies this engine does not carry forward)."""

    url: str
    driver: str | None = None
    user: str | None = None
    password: str | None = None
    properties: dict[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        out = dict(self.properties)
        if self.driver:
            out["driver"] = self.driver
        if self.user is not None:
            out["user"] = self.user
        if self.password is not None:
            out["password"] = self.password
        return out


def q(ident: str, quote_char: str = '"') -> str:
    """Quote an identifier. Spark's JDBC writer creates tables with
    quoted (case-preserving) column names, so every identifier in SQL
    we generate against those tables must be quoted the same way —
    unquoted ``sp_code`` would resolve to ``SP_CODE`` on Derby and
    fail. MySQL uses backticks (``quote_char='`'``)."""
    return f"{quote_char}{ident}{quote_char}"


def derby_embedded(path: str) -> JdbcConfig:
    """Embedded-Derby config for tests/local runs (jar ships in Spark)."""
    return JdbcConfig(
        url=f"jdbc:derby:{path};create=true",
        driver="org.apache.derby.iapi.jdbc.AutoloadedDriver",
    )


def read_table(
    spark: SparkSession,
    cfg: JdbcConfig,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound=None,
    upper_bound=None,
    predicates: Sequence[str] | None = None,
    fetchsize: int = 10_000,
) -> DataFrame:
    """Read a JDBC table as a DataFrame.

    Three parallelism modes:
    - plain (one partition) when neither split option is given;
    - range-split on ``partition_column`` into ``num_partitions``
      concurrent queries; bounds auto-discovered via one MIN/MAX probe
      when not provided (the probe is pushed to the DB, returns 1 row);
    - explicit ``predicates``: one partition per WHERE clause — the
      reference's per-(store, date) scans map to one predicate per day.

    Catalyst later prunes columns and pushes filters into each
    partition's generated SQL.
    """
    props = {"fetchsize": str(fetchsize), **cfg.options()}
    if predicates:
        return spark.read.jdbc(cfg.url, table, predicates=list(predicates), properties=props)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            row = read_query(
                spark,
                cfg,
                f'SELECT MIN({q(partition_column)}) AS "lo", '
                f'MAX({q(partition_column)}) AS "hi" FROM {table}',
            ).collect()[0]
            lo, hi = row[0], row[1]
            lower_bound = lo if lower_bound is None else lower_bound
            upper_bound = hi if upper_bound is None else upper_bound
        return spark.read.jdbc(
            cfg.url,
            table,
            column=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=num_partitions,
            properties=props,
        )
    return spark.read.jdbc(cfg.url, table, properties=props)


def read_query(spark: SparkSession, cfg: JdbcConfig, query: str) -> DataFrame:
    """Push an arbitrary SQL query to the database (aggregations the DB
    should do — e.g. the MIN/MAX bound probe — never ship raw rows)."""
    return (
        spark.read.format("jdbc")
        .option("url", cfg.url)
        .option("query", query)
        .options(**cfg.options())
        .load()
    )


def write_table(
    df: DataFrame,
    cfg: JdbcConfig,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    column_types: str | None = None,
    truncate: bool = False,
) -> None:
    """Batched JDBC write (one INSERT per ``batchsize`` rows per
    partition — vs the reference's one INSERT per row).

    ``column_types``: DDL fragment for created tables (e.g.
    ``"sp_code VARCHAR(16), sale_date VARCHAR(8)"``) — without it Spark
    maps StringType to CLOB on some dialects (Derby), which breaks
    comparisons and pushdown. ``truncate``: on overwrite, TRUNCATE
    instead of DROP+CREATE so DDL (indexes, grants) survives — K4's
    truncate-and-reload (load_prod_data.py:52-53) against a real DB.
    """
    writer = (
        df.write.format("jdbc")
        .option("url", cfg.url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .options(**cfg.options())
        .mode(mode)
    )
    if column_types:
        writer = writer.option("createTableColumnTypes", column_types)
    if truncate:
        writer = writer.option("truncate", "true")
    writer.save()


def execute(spark: SparkSession, cfg: JdbcConfig, sql: str) -> int:
    """Run one DDL/DML statement on the database via the JVM's
    DriverManager (driver-side, one statement — never per-row)."""
    jvm = spark._sc._jvm
    props = jvm.java.util.Properties()
    for k, v in cfg.options().items():
        if k != "driver":
            props.setProperty(k, v)
    if cfg.driver:
        jvm.java.lang.Class.forName(cfg.driver)
    conn = jvm.java.sql.DriverManager.getConnection(cfg.url, props)
    try:
        stmt = conn.createStatement()
        try:
            return stmt.executeUpdate(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


def merge_upsert_jdbc(
    spark: SparkSession,
    cfg: JdbcConfig,
    table: str,
    source: DataFrame,
    keys: Sequence[str],
    order_col: str | None = None,
    staging_table: str | None = None,
    column_types: str | None = None,
    merge_dialect: str = "ansi",
) -> None:
    """Server-side MERGE: stage the batch, issue one upsert statement.

    The set-oriented replacement for the reference's per-row
    exists-probe → UPDATE/INSERT loop (load_sales_data.py:35-40,
    129-134): the batch lands in ``staging_table`` with batched
    inserts, then the database applies a single ``MERGE`` (ANSI /
    Derby / SQL Server) or ``INSERT … ON DUPLICATE KEY UPDATE``
    (``merge_dialect="mysql"``) using its own index on ``keys``.
    Intra-batch duplicate keys resolve by ``order_col``
    (last-writer-wins) BEFORE staging, matching operators/merge.py.
    """
    from etl_job_spark.operators.merge import dedup_last_writer

    if order_col is not None:
        source = dedup_last_writer(source, keys, order_col).drop(order_col)
    qc = "`" if merge_dialect == "mysql" else '"'
    staging = staging_table or f"{table}_staging"
    try:
        execute(spark, cfg, f"DELETE FROM {staging}")
    except Exception:
        # staging doesn't exist: clone the TARGET's column types (a
        # Spark-created staging would map strings to CLOB on Derby,
        # which can't be compared against the target's VARCHARs)
        select_cols = ", ".join(q(c, qc) for c in source.columns)
        if merge_dialect == "mysql":
            ddl = f"CREATE TABLE {staging} AS SELECT {select_cols} FROM {table} WHERE 1=0"
        else:
            ddl = f"CREATE TABLE {staging} AS SELECT {select_cols} FROM {table} WITH NO DATA"
        execute(spark, cfg, ddl)
    write_table(source, cfg, staging, mode="append", column_types=column_types)

    cols = [q(c, qc) for c in source.columns]
    key_set = set(keys)
    non_keys = [q(c, qc) for c in source.columns if c not in key_set]
    on = " AND ".join(f"t.{q(k, qc)} = s.{q(k, qc)}" for k in keys)
    if merge_dialect == "mysql":
        col_list = ", ".join(cols)
        updates = ", ".join(f"{c} = VALUES({c})" for c in non_keys)
        sql = (
            f"INSERT INTO {table} ({col_list}) SELECT {col_list} FROM {staging} "
            f"ON DUPLICATE KEY UPDATE {updates}"
        )
    else:
        updates = ", ".join(f"t.{c} = s.{c}" for c in non_keys)
        insert_cols = ", ".join(cols)
        insert_vals = ", ".join(f"s.{c}" for c in cols)
        sql = (
            f"MERGE INTO {table} t USING {staging} s ON {on} "
            f"WHEN MATCHED THEN UPDATE SET {updates} "
            f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals})"
        )
    execute(spark, cfg, sql)
