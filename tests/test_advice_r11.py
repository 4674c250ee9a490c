"""Round-11 ADVICE closures + the conditional NOT-MATCHED INSERT
clause (VERDICT r10 next-round #3):

- high: a second MERGE clause of the same kind refuses instead of
  silently clobbering the first (the conditional-UPDATE predicate
  leaking onto a later unconditional UPDATE's assignments).
- medium: the SQL conditional matched DELETE now carries Delta's
  clause scope — a delete-flagged UNMATCHED source row stays eligible
  for the INSERT clause (the library's CDC default is unchanged and
  pinned here too).
- medium follow-on: unconditional WHEN MATCHED THEN DELETE now
  composes with WHEN NOT MATCHED INSERT (delete-matched/insert-rest,
  Delta's replace shape) instead of refusing.
- low: ALTER TABLE ... DROP COLUMN with no names raises ValueError,
  not AttributeError.
- low: source-column references resolve case-insensitively (Spark's
  resolution rule) in expression SET and identity detection.
- new clause: WHEN NOT MATCHED AND <cond> THEN INSERT, SQL + library.
"""

from __future__ import annotations

import pytest

from etl_job_spark.sql import execute_dml
from etl_job_spark.table import ManifestTable


def _mk(spark, tmp_path, name="t", rows=None, schema="k long, v long, s string"):
    t = ManifestTable(str(tmp_path / name))
    t.overwrite(
        spark.createDataFrame(
            rows if rows is not None
            else [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")],
            schema,
        )
    )
    return t


def test_merge_into_duplicate_clause_semantics(spark, tmp_path):
    """The r10 high ADVICE finding: 'WHEN MATCHED AND p THEN UPDATE'
    followed by 'WHEN MATCHED THEN UPDATE' used to execute with the
    first clause's SET dropped and the second gated by p. Round 11
    first REFUSED duplicates; the ordered clause engine now EXECUTES
    them with Delta's written-order first-match-wins semantics — this
    pin asserts those semantics, and that the genuinely-invalid
    orderings (an unconditional clause followed by another of its
    group — unreachable) still refuse loudly."""
    spark.createDataFrame(
        [(2, 99, "B")], "k long, v long, s string"
    ).createOrReplaceTempView("dup_src")

    # the exact ADVICE scenario, now first-match-wins: k=2 (v=99 > 0)
    # takes the FIRST clause — v updated, s untouched; other matched
    # rows would fall through to the second
    t = _mk(spark, tmp_path, name="t1")
    execute_dml(spark, t, (
        "MERGE INTO t1 x USING dup_src s ON x.k = s.k "
        "WHEN MATCHED AND s.v > 0 THEN UPDATE SET x.v = s.v "
        "WHEN MATCHED THEN UPDATE SET x.s = s.s"
    ))
    got = {r.k: (r.v, r.s) for r in t.snapshot(spark).collect()}
    assert got == {1: (10, "a"), 2: (99, "b"), 3: (30, "c")}

    # conditional then unconditional DELETE: both claim matched rows
    t2 = _mk(spark, tmp_path, name="t2")
    execute_dml(spark, t2, (
        "MERGE INTO t2 x USING dup_src s ON x.k = s.k "
        "WHEN MATCHED AND s.v > 0 THEN DELETE "
        "WHEN MATCHED THEN DELETE"
    ))
    assert sorted(r.k for r in t2.snapshot(spark).collect()) == [1, 3]

    # two NMBS deletes, conditional first: every unmatched target row
    # is claimed by one of them
    t3 = _mk(spark, tmp_path, name="t3")
    execute_dml(spark, t3, (
        "MERGE INTO t3 x USING dup_src s ON x.k = s.k "
        "WHEN MATCHED THEN UPDATE SET x.v = s.v "
        "WHEN NOT MATCHED BY SOURCE AND x.v < 15 THEN DELETE "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE"
    ))
    assert sorted(r.k for r in t3.snapshot(spark).collect()) == [2]

    # an unconditional clause followed by another of its group is
    # unreachable — refuses (Delta's ordering rule), never clobbers
    t4 = _mk(spark, tmp_path, name="t4")
    for stmt in (
        "MERGE INTO t4 x USING dup_src s ON x.k = s.k "
        "WHEN MATCHED THEN UPDATE SET x.v = s.v "
        "WHEN MATCHED THEN UPDATE SET x.s = s.s",
        "MERGE INTO t4 x USING dup_src s ON x.k = s.k "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED AND s.v > 0 THEN INSERT *",
    ):
        with pytest.raises(ValueError, match="unreachable"):
            execute_dml(spark, t4, stmt)

    # distinct kinds still compose (no false positives)
    t5 = _mk(spark, tmp_path, name="t5")
    v = execute_dml(
        spark, t5,
        "MERGE INTO t5 x USING dup_src s ON x.k = s.k "
        "WHEN MATCHED AND s.v < 0 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET x.v = s.v "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE AND x.k = 999 THEN DELETE",
    )
    assert v == 2
    got = {r.k: r.v for r in t5.snapshot(spark).collect()}
    assert got == {1: 10, 2: 99, 3: 30}


def test_sql_conditional_delete_unmatched_row_inserts(spark, tmp_path):
    """Delta scope on the SQL surface (r10 medium ADVICE): WHEN MATCHED
    AND flag THEN DELETE applies to MATCHED rows only, so a flagged row
    with no target match flows to the INSERT clause. Oracle below is
    the hand-derived Delta outcome."""
    t = _mk(spark, tmp_path, "dsc")
    spark.createDataFrame(
        [
            (2, 99, "B", True),    # matched + flagged -> deleted
            (3, 33, "C", False),   # matched, unflagged -> updated
            (8, 80, "new", True),  # UNMATCHED + flagged -> INSERTS (Delta)
            (9, 90, "n2", False),  # unmatched -> inserts
        ],
        "k long, v long, s string, _del boolean",
    ).createOrReplaceTempView("dsc_src")
    execute_dml(
        spark, t,
        "MERGE INTO dsc t USING dsc_src s ON t.k = s.k "
        "WHEN MATCHED AND s._del THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET t.v = s.v "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    got = {r.k: (r.v, r.s) for r in t.snapshot(spark).collect()}
    assert got == {
        1: (10, "a"),    # untouched
        3: (33, "c"),    # updated (v only)
        8: (80, "new"),  # flagged-but-unmatched: inserted, not dropped
        9: (90, "n2"),
    }


def test_merge_clauses_cdc_scope_unchanged(spark):
    """The library default (delete_scope='source') keeps the CDC
    contract: a delete-flagged row is a COMMAND and never inserts —
    pinned so the SQL-surface change can't leak into the library."""
    from etl_job_spark.operators.merge import merge_clauses

    target = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    source = spark.createDataFrame(
        [(2, 99, True), (8, 80, True), (9, 90, False)],
        "k long, v long, _del boolean",
    )
    out = merge_clauses(
        target, source, ["k"], update_cols=["v"], delete_pred="_del"
    )
    got = {r.k: r.v for r in out.collect()}
    assert got == {1: 10, 9: 90}  # k=8 flagged+unmatched: NOT inserted
    # Delta scope on the same inputs: k=8 inserts
    out2 = merge_clauses(
        target, source, ["k"], update_cols=["v"], delete_pred="_del",
        delete_scope="matched",
    )
    got2 = {r.k: r.v for r in out2.collect()}
    assert got2 == {1: 10, 8: 80, 9: 90}
    # scope validation
    with pytest.raises(ValueError, match="delete_scope"):
        merge_clauses(target, source, ["k"], update_cols=["v"],
                      delete_pred="_del", delete_scope="bogus")
    with pytest.raises(ValueError, match="clause-mode"):
        merge_clauses(target, source, ["k"], delete_pred="_del",
                      delete_scope="matched")


def test_sql_unconditional_delete_with_insert(spark, tmp_path):
    """WHEN MATCHED THEN DELETE + WHEN NOT MATCHED THEN INSERT — the
    Delta replace shape the r10 grammar refused: matched target rows
    drop, unmatched source rows insert."""
    t = _mk(spark, tmp_path, "repl")
    spark.createDataFrame(
        [(2, 200, "x"), (9, 900, "y")], "k long, v long, s string"
    ).createOrReplaceTempView("repl_src")
    execute_dml(
        spark, t,
        "MERGE INTO repl t USING repl_src s ON t.k = s.k "
        "WHEN MATCHED THEN DELETE "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    got = {r.k: (r.v, r.s) for r in t.snapshot(spark).collect()}
    assert got == {1: (10, "a"), 3: (30, "c"), 9: (900, "y")}
    # unconditional DELETE + an UPDATE clause is unreachable-update:
    # refuse (Delta rejects a non-final unconditional clause too)
    with pytest.raises(ValueError, match="unconditional"):
        execute_dml(
            spark, t,
            "MERGE INTO repl t USING repl_src s ON t.k = s.k "
            "WHEN MATCHED THEN DELETE "
            "WHEN MATCHED THEN UPDATE SET t.v = s.v",
        )


def test_sql_conditional_not_matched_insert(spark, tmp_path):
    """WHEN NOT MATCHED AND <cond> THEN INSERT (VERDICT r10 #3) —
    DuckDB runs the equivalent statement as the oracle."""
    import duckdb

    rows = [(1, 10), (2, 20)]
    src = [(2, 99), (8, 5), (9, 90)]
    t = _mk(spark, tmp_path, "gi", rows, "k long, v long")
    spark.createDataFrame(src, "k long, v long").createOrReplaceTempView("gi_src")
    execute_dml(
        spark, t,
        "MERGE INTO gi t USING gi_src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET t.v = s.v "
        "WHEN NOT MATCHED AND s.v >= 50 THEN INSERT *",
    )
    got = {r.k: r.v for r in t.snapshot(spark).collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tgt AS SELECT * FROM (VALUES "
        + ", ".join(f"({k}, {v})" for k, v in rows) + ") x(k, v)"
    )
    con.execute(
        "CREATE TABLE s AS SELECT * FROM (VALUES "
        + ", ".join(f"({k}, {v})" for k, v in src) + ") x(k, v)"
    )
    con.execute("UPDATE tgt SET v = s.v FROM s WHERE tgt.k = s.k")
    con.execute(
        "INSERT INTO tgt SELECT k, v FROM s WHERE v >= 50 "
        "AND k NOT IN (SELECT k FROM tgt)"
    )
    want = dict(con.execute("SELECT k, v FROM tgt").fetchall())
    assert got == want == {1: 10, 2: 99, 9: 90}  # k=8 gated out

    # column-list variant takes the condition too
    execute_dml(
        spark, t,
        "MERGE INTO gi t USING gi_src s ON t.k = s.k "
        "WHEN NOT MATCHED AND s.v < 50 THEN INSERT (k, v) VALUES (s.k, s.v)",
    )
    got2 = {r.k: r.v for r in t.snapshot(spark).collect()}
    assert got2 == {**want, 8: 5}
    # a target-side reference in the condition refuses loudly (no
    # target row exists for an unmatched key — Delta's rule)
    with pytest.raises(ValueError, match="only"):
        execute_dml(
            spark, t,
            "MERGE INTO gi x USING gi_src s ON x.k = s.k "
            "WHEN NOT MATCHED AND x.v > 0 THEN INSERT *",
        )


def test_library_insert_pred_paths(spark, tmp_path):
    """when_not_matched_insert_pred through ManifestTable.merge on all
    three code paths: existing table with touched files, existing
    table with NOTHING matched-prunable, and first commit."""
    t = ManifestTable(str(tmp_path / "ip"))
    src1 = spark.createDataFrame([(1, 10), (2, 3)], "k long, v long")
    # first-commit path: everything is unmatched; pred gates inserts
    t.merge(spark, src1, ["k"], when_matched_update=[],
            when_not_matched_insert_pred="v >= 5")
    assert {r.k for r in t.snapshot(spark).collect()} == {1}
    # touched path
    src2 = spark.createDataFrame(
        [(1, 99), (5, 50), (6, 2)], "k long, v long"
    )
    t.merge(spark, src2, ["k"], when_matched_update=["v"],
            when_not_matched_insert_pred="source.v >= 5")
    got = {r.k: r.v for r in t.snapshot(spark).collect()}
    assert got == {1: 99, 5: 50}  # 6 gated out, 1 updated
    # NULL condition = not inserted
    src3 = spark.createDataFrame(
        [(7, None)], "k long, v long"
    )
    t.merge(spark, src3, ["k"], when_matched_update=["v"],
            when_not_matched_insert_pred="v >= 5")
    assert 7 not in {r.k for r in t.snapshot(spark).collect()}


def test_case_insensitive_source_refs(spark, tmp_path):
    """r10 low ADVICE: SET t.c = s.C — valid under Spark's
    case-insensitive resolution — stays the identity (narrow-source)
    shape, and expression-mode source.C resolves to column c."""
    t = _mk(spark, tmp_path, "ci", [(1, 10), (2, 20)], "k long, v long")
    spark.createDataFrame(
        [(2, 7)], "k long, v long"
    ).createOrReplaceTempView("ci_src")
    # identity despite case mismatch
    execute_dml(
        spark, t,
        "MERGE INTO ci t USING ci_src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET t.v = s.V",
    )
    assert {r.k: r.v for r in t.snapshot(spark).collect()} == {1: 10, 2: 7}
    # expression mode with a case-mismatched source ref
    execute_dml(
        spark, t,
        "MERGE INTO ci t USING ci_src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET t.v = t.v + s.V",
    )
    assert {r.k: r.v for r in t.snapshot(spark).collect()} == {1: 10, 2: 14}
    # a genuinely absent source column still refuses
    with pytest.raises(ValueError, match="not a\n?\\s*source column|not a source column"):
        execute_dml(
            spark, t,
            "MERGE INTO ci t USING ci_src s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET t.v = t.v + s.nope",
        )


def test_alter_drop_column_no_names_raises(spark, tmp_path):
    """r10 low ADVICE: DROP COLUMN with no column names raises the
    intended ValueError, not AttributeError."""
    t = _mk(spark, tmp_path, "ddl", [(1, 10)], "k long, v long")
    with pytest.raises(ValueError, match="supported form"):
        execute_dml(spark, t, "ALTER TABLE ddl DROP COLUMN")


def test_whole_table_update_via_where_true(spark, tmp_path):
    """VERDICT r10 #7: the WHERE-less refusal names the WHERE true
    workaround, and WHERE true actually works whole-table."""
    t = _mk(spark, tmp_path, "wt", [(1, 10), (2, 20)], "k long, v long")
    with pytest.raises(ValueError, match="WHERE true"):
        execute_dml(spark, t, "UPDATE wt SET v = 0")
    with pytest.raises(ValueError, match="WHERE true"):
        execute_dml(spark, t, "DELETE FROM wt")
    execute_dml(spark, t, "UPDATE wt SET v = v + 1 WHERE true")
    assert {r.v for r in t.snapshot(spark).collect()} == {11, 21}
    execute_dml(spark, t, "DELETE FROM wt WHERE true")
    assert t.snapshot(spark).count() == 0
