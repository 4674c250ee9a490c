"""EXPLAIN for DML (round 14, VERDICT r13 Missing #3): the routed
verb, the planned file-prune split — computed by the SAME planning
primitives the verb would run (``_merge_prune`` /
``_prune_by_key_stats`` + ``_entry_all_match``) — and the join
strategy for merges, with NOTHING committed. One plan line per row."""

from __future__ import annotations

import pytest

from etl_job_spark.sql import execute_dml, execute_sql
from etl_job_spark.table import ManifestTable
from etl_job_spark.txn import TransactionalCatalog


@pytest.fixture()
def cat(spark, tmp_path):
    c = TransactionalCatalog(str(tmp_path / "cat"))
    t = c.table("mart")
    t.overwrite(
        spark.range(0, 8000)
        .selectExpr("id as k", "id % 5 as g", "id * 1.0 as v")
        .repartitionByRange(8, "k")
    )
    d = c.table("dim")
    d.overwrite(spark.range(100, 120).selectExpr("id as k", "id * 9.0 as v"))
    return c


def _lines(df):
    return [r.plan for r in df.collect()]


def test_explain_merge_reports_prune_without_committing(spark, cat):
    t = cat.table("mart")
    v = t.latest_version()
    lines = _lines(
        execute_sql(
            spark, cat,
            "EXPLAIN MERGE INTO mart a USING dim b ON a.k = b.k "
            "WHEN MATCHED THEN UPDATE SET a.v = b.v "
            "WHEN NOT MATCHED THEN INSERT *",
        )
    )
    assert "verb: MERGE" in lines
    assert any(l.startswith("keys: k") for l in lines)
    # dim keys 100..119 hit exactly one of 8 range-clustered files —
    # the SAME merge-range tier the write path runs
    assert "files: total=8 rewrite_candidates=1 carried_by_reference=7" in lines
    assert any("prune tier merge-range" in l for l in lines)
    assert any(l.startswith("join: ") for l in lines)
    assert cat.table("mart").latest_version() == v  # committed nothing


def test_explain_merge_ordered_reports_broadcast(spark, cat):
    lines = _lines(
        execute_sql(
            spark, cat,
            "EXPLAIN MERGE INTO mart a USING dim b ON a.k = b.k "
            "WHEN MATCHED THEN UPDATE SET a.v = b.v "
            "WHEN MATCHED THEN DELETE "
            "WHEN NOT MATCHED THEN INSERT *",
        )
    )
    assert any("engine: ordered" in l for l in lines)
    assert any("broadcast-replanned" in l for l in lines)


def test_explain_update_spec_prune(spark, cat):
    t = cat.table("mart")
    v = t.latest_version()
    lines = _lines(
        execute_sql(
            spark, cat,
            "EXPLAIN UPDATE mart SET v = 0 WHERE k BETWEEN 10 AND 20",
        )
    )
    assert "verb: UPDATE" in lines
    assert "files: total=8 metadata_pruned=7 candidates=1" in lines
    assert cat.table("mart").latest_version() == v


def test_explain_delete_unprovable_predicate_is_honest(spark, cat):
    lines = _lines(
        execute_sql(
            spark, cat,
            "EXPLAIN DELETE FROM mart WHERE upper(string(g)) = '3'",
        )
    )
    assert any("not provable" in l for l in lines)
    assert any("copy_on_write" in l for l in lines)


def test_explain_insert_and_replace_where(spark, cat):
    lines = _lines(
        execute_sql(spark, cat, "EXPLAIN INSERT INTO mart SELECT * FROM dim")
    )
    assert any("append only" in l for l in lines)
    lines2 = _lines(
        execute_sql(
            spark, cat,
            "EXPLAIN INSERT INTO mart REPLACE WHERE k BETWEEN 0 AND 999 "
            "SELECT k, g, 0.0 AS v FROM mart WHERE k < 1000",
        )
    )
    assert any("REPLACE WHERE" in l for l in lines2)
    assert any("all-match proved" in l for l in lines2)


def test_explain_dml_direct_table_surface(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.overwrite(
        spark.range(0, 100).selectExpr("id as k", "id * 1.0 as v")
    )
    v = t.latest_version()
    df = execute_dml(spark, t, "EXPLAIN UPDATE t SET v = 1 WHERE k = 5")
    assert any("verb: UPDATE" in r.plan for r in df.collect())
    assert t.latest_version() == v


def test_explain_update_allmatch_proved(spark, tmp_path):
    """A whole-partition UPDATE proves its files from metadata alone."""
    t = ManifestTable(str(tmp_path / "p"))
    t.overwrite(
        spark.createDataFrame(
            [(p, k, k) for p in ("a", "b") for k in range(50)],
            "p string, k int, v int",
        ),
        partition_by=["p"],
    )
    lines = [
        r.plan
        for r in execute_dml(
            spark, t, "EXPLAIN UPDATE p SET v = 0 WHERE p = 'a'"
        ).collect()
    ]
    proved = [l for l in lines if l.startswith("all-match proved")]
    assert proved and proved[0].split(":")[1].strip() != "0", lines
    assert any(l == "hit-discovery scan candidates: 0" for l in lines), lines


def test_explain_select_surfaces_file_skip_decisions(spark, cat):
    """EXPLAIN SELECT appends the manifest-level file-skip decisions as
    plan rows (r14) — they happen at view registration, before the
    scan exists, so Catalyst's plan cannot show them."""
    execute_sql(spark, cat, "CREATE VIEW martv AS SELECT k, v FROM mart")

    def lines(stmt):
        return [r.plan for r in execute_sql(spark, cat, stmt).collect()]

    l1 = lines("EXPLAIN SELECT k FROM mart WHERE k BETWEEN 10 AND 20")
    assert any(
        "manifest file skipping: mart: kept 1 of 8 files "
        "(conjunctive spec)" in x
        for x in l1
    ), l1
    l2 = lines("EXPLAIN SELECT k FROM mart WHERE k < 10 OR k >= 7990")
    assert any("2-disjunct DNF" in x and "kept 2 of 8" in x for x in l2), l2
    l3 = lines("EXPLAIN SELECT k FROM martv WHERE k BETWEEN 10 AND 20")
    assert any("view martv -> base mart: kept 1 of 8" in x for x in l3), l3
    # no prune applies -> exactly the one physical-plan row
    l4 = lines("EXPLAIN SELECT count(*) AS n FROM mart")
    assert len(l4) == 1 and "Physical Plan" in l4[0]


def test_explain_in_subquery_dml_reports_the_merge_route(spark, cat):
    """EXPLAIN of an IN-subquery DELETE/UPDATE reports the route
    EXECUTION takes (the keyed merge with key-envelope pruning), not
    the plain scan route — and the NOT IN three-valued NO-OP is
    called out when the subquery yields NULL (r14)."""
    nm = cat.table("nm")
    nm.overwrite(spark.sql("SELECT cast(null as long) AS k UNION ALL SELECT 1"))
    v0 = cat.table("mart").latest_version()

    l1 = _lines(
        execute_sql(
            spark, cat,
            "EXPLAIN DELETE FROM mart WHERE k IN (SELECT k FROM dim)",
        )
    )
    assert l1[0] == "verb: DELETE"
    assert any("route: keyed merge" in x for x in l1)
    # dim keys 100..119 → one of 8 range-clustered files, the SAME
    # split the executing merge would plan
    assert any("rewrite_candidates=1" in x for x in l1), l1

    l2 = _lines(
        execute_sql(
            spark, cat,
            "EXPLAIN UPDATE mart SET v = 0 WHERE k NOT IN (SELECT k FROM dim)",
        )
    )
    assert any("prune: DISABLED" in x for x in l2), l2
    assert any(x.startswith("set: v") for x in l2)

    l3 = _lines(
        execute_sql(
            spark, cat,
            "EXPLAIN DELETE FROM mart WHERE k NOT IN (SELECT k FROM nm)",
        )
    )
    assert any("NO-OP" in x and "three-valued" in x for x in l3), l3
    assert cat.table("mart").latest_version() == v0  # nothing committed
