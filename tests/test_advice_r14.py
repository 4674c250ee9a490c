"""Round-14 ADVICE pins: script routing of the full read-only verb set
(#2), drop_view name validation (#3), and execute_dml's SELECT branch
honoring the caller's resolver (#5). (#1 backslash escapes is pinned in
test_backslash_escapes.py; #4 S3 409-retry in test_store_conformance.)"""

from __future__ import annotations

import pytest

from etl_job_spark.sql import execute_dml, execute_sql_script
from etl_job_spark.table import ManifestTable
from etl_job_spark.txn import TransactionalCatalog


def _seed(spark, cat, name="mart"):
    t = cat.table(name)
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    return t


def test_script_routes_readonly_introspection_verbs(spark, tmp_path):
    """SHOW CREATE TABLE / EXPLAIN / VACUUM … DRY RUN previously fell
    through to execute_dml_txn inside a script, where statement_table
    or the VACUUM guard failed the whole script (ADVICE r13 #2)."""
    cat = TransactionalCatalog(str(tmp_path / "cat"))
    _seed(spark, cat)
    seen: list[tuple[str, object]] = []
    out = execute_sql_script(
        spark,
        cat,
        """
        SHOW CREATE TABLE mart;
        EXPLAIN SELECT k FROM mart WHERE k = 1;
        VACUUM mart DRY RUN;
        SELECT * FROM mart
        """,
        select_handler=lambda stmt, df: seen.append((stmt, df)),
    )
    assert out == {}  # nothing committed — all four are read-only
    assert len(seen) == 4
    ddl = seen[0][1].collect()[0][0]
    assert "CREATE TABLE" in ddl and "k int" in ddl
    plan = seen[1][1].collect()[0][0]
    assert "Physical Plan" in plan or "==" in plan


def test_script_readonly_verbs_never_stage_inside_begin(spark, tmp_path):
    cat = TransactionalCatalog(str(tmp_path / "cat"))
    _seed(spark, cat)
    seen = []
    execute_sql_script(
        spark,
        cat,
        """
        BEGIN;
        UPDATE mart SET v = 'z' WHERE k = 1;
        SHOW CREATE TABLE mart;
        COMMIT
        """,
        select_handler=lambda stmt, df: seen.append(stmt),
    )
    assert len(seen) == 1
    got = {r.k: r.v for r in cat.table("mart").snapshot(spark).collect()}
    assert got == {1: "z", 2: "b"}


def test_drop_view_validates_name(spark, tmp_path):
    """A traversal-shaped name must never reach store.delete (ADVICE
    r13 #3) — same check as create_view/view_sql."""
    cat = TransactionalCatalog(str(tmp_path / "cat"))
    _seed(spark, cat)
    cat.create_view("v1", "SELECT k FROM mart")
    for bad in ("../mart/m/v1", "_views", "a/b"):
        with pytest.raises(ValueError, match="invalid view name"):
            cat.drop_view(bad)
    cat.drop_view("v1")
    assert cat.views() == []


def test_execute_dml_select_honors_caller_resolver(spark, tmp_path):
    """execute_dml(…, resolve=…) on a top-level SELECT resolves OTHER
    table names through the caller's resolver instead of silently
    falling back to session temp views (ADVICE r13 #5)."""
    t = ManifestTable(str(tmp_path / "mart"))
    t.overwrite(spark.createDataFrame([(1, 10), (2, 20)], "k int, v int"))
    dim = ManifestTable(str(tmp_path / "dim"))
    dim.overwrite(spark.createDataFrame([(1, "one")], "k int, name string"))

    def resolve(name):
        return dim if name == "dim" else None

    rows = execute_dml(
        spark,
        t,
        "SELECT m.k, m.v, d.name FROM mart m JOIN dim d ON m.k = d.k",
        resolve=resolve,
    ).collect()
    assert [(r.k, r.v, r.name) for r in rows] == [(1, 10, "one")]
