"""SQL interface: the driver tables as temp views, so engine users can
write plain Spark SQL against the same catalog the DataFrame operators
use (the reference's consumers are SQL users; this is their migration
path — `spark.sql` over the same data, same Catalyst plans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_job_spark.sources.catalog import TABLE_NAMES, load_table


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Create/replace one temp view per driver table (events arrives
    with its nanos→timestamp normalization already applied)."""
    for name in names or TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Register views, then run one Spark SQL statement against them."""
    register_views(spark, sf_dir)
    return spark.sql(sql)


# ---------------------------------------------------------------------
# SQL DML over ManifestTables. Spark SQL cannot plan UPDATE/DELETE on a
# Python data source (DSv2 row-level operations are JVM-only), but the
# reference's consumers WRITE these statements verbatim
# (kicc_to_tb_sales.py:109-134 is literal UPDATE SQL) — so the engine
# accepts the two row-level forms and routes them to the table verbs:
#
#   UPDATE <table> SET col = expr [, col = expr …] WHERE <predicate>
#   DELETE FROM <table> WHERE <predicate>
#
# The SET expressions and the predicate are passed to Spark SQL
# unmodified (full expression language); only the statement SHAPE is
# parsed here, with a quote/paren-aware scanner so commas inside
# function calls and keywords inside string literals don't confuse the
# split. Anything else (MERGE INTO, multi-table UPDATE, subqueries in
# SET) raises with the supported forms named — use the library verbs.
# ---------------------------------------------------------------------


def _scan_top(sql: str, word: str) -> int:
    """Index of the first occurrence of keyword ``word`` at paren
    depth 0, outside single/double-quoted literals; -1 if absent."""
    depth = 0
    quote: str | None = None
    upper = sql.upper()
    w = word.upper()
    i = 0
    while i < len(sql):
        c = sql[i]
        if quote is not None:
            if c == quote:
                quote = None
            i += 1
            continue
        if c in ("'", '"'):
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and upper.startswith(w, i):
            before_ok = i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")
            j = i + len(w)
            after_ok = j >= len(sql) or not (sql[j].isalnum() or sql[j] == "_")
            if before_ok and after_ok:
                return i
        i += 1
    return -1


def _split_assignments(body: str) -> dict[str, str]:
    """``a = e1, b = e2`` → {a: e1, b: e2}; commas split only at paren
    depth 0 outside quotes, the column name is the text before each
    item's FIRST top-level '='."""
    items: list[str] = []
    depth = 0
    quote: str | None = None
    start = 0
    for i, c in enumerate(body):
        if quote is not None:
            if c == quote:
                quote = None
            continue
        if c in ("'", '"'):
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            items.append(body[start:i])
            start = i + 1
    items.append(body[start:])
    out: dict[str, str] = {}
    for item in items:
        # the assignment '=' is always the item's first '=' (the column
        # name cannot contain one; expression '='s come after)
        eq = item.find("=")
        if eq <= 0:
            raise ValueError(f"SET item {item.strip()!r}: expected col = expr")
        col = item[:eq].strip()
        expr = item[eq + 1:].strip()
        if not col.isidentifier() or not expr:
            raise ValueError(f"SET item {item.strip()!r}: expected col = expr")
        out[col] = expr
    return out


def execute_dml(spark: SparkSession, table, sql: str) -> int:
    """Execute one row-level DML statement against a ManifestTable
    (instance or path); returns the new committed version. The table
    name inside the statement is accepted but not resolved — the
    target is the ``table`` argument (one statement, one table: the
    reference's shape)."""
    from etl_job_spark.table import ManifestTable

    t = table if isinstance(table, ManifestTable) else ManifestTable(str(table))
    s = sql.strip().rstrip(";").strip()
    upper = s.upper()
    if upper.startswith("UPDATE"):
        set_at = _scan_top(s, "SET")
        where_at = _scan_top(s, "WHERE")
        if set_at < 0 or where_at < 0 or where_at < set_at:
            raise ValueError(
                "supported form: UPDATE <table> SET col = expr[, ...] "
                "WHERE <predicate>"
            )
        assignments = _split_assignments(s[set_at + 3:where_at])
        return t.update_where(spark, assignments, s[where_at + 5:].strip())
    if upper.startswith("DELETE"):
        from_at = _scan_top(s, "FROM")
        where_at = _scan_top(s, "WHERE")
        if from_at < 0 or where_at < 0:
            raise ValueError(
                "supported form: DELETE FROM <table> WHERE <predicate>"
            )
        return t.delete_where(spark, s[where_at + 5:].strip())
    raise ValueError(
        "execute_dml supports UPDATE ... SET ... WHERE ... and DELETE "
        "FROM ... WHERE ...; for MERGE use ManifestTable.merge (matched "
        "clauses included)"
    )
