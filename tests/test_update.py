"""Row-level UPDATE (`ManifestTable.update_where`) and MERGE matched
clauses (`merge(when_matched_update/when_matched_delete/
insert_unmatched)`, relational core `operators.merge.merge_clauses`).

The table format's UPDATE verb: SQL UPDATE semantics (NULL predicate
keeps the row, simultaneous SET, cast-to-column-type), copy-on-write
planning pins (untouched files carried by reference; spec-form
predicates prune via partition/stats/blooms before any scan),
idempotency, constraints, renames, and the Delta-style clause merges
the reference's enrichment UPDATE-JOINs map onto
(kicc_to_tb_sales.py:109-134).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_job_spark.operators.merge import merge_clauses
from etl_job_spark.table import ConstraintViolationError, ManifestTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").cast("bigint").alias("k"),
        (F.col("id") % 4).cast("bigint").alias("g"),
        (F.col("id") * 10).cast("bigint").alias("v"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
    )


# ---------------------------------------------------------------------
# update_where
# ---------------------------------------------------------------------


def test_update_where_basic_and_sql_semantics(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "u"))
    t.overwrite(_df(spark, 0, 100))
    v = t.update_where(spark, {"v": "v + 1"}, "k < 10")
    assert v == 2
    got = {r.k: r.v for r in t.snapshot(spark).collect()}
    assert all(got[k] == k * 10 + 1 for k in range(10))
    assert all(got[k] == k * 10 for k in range(10, 100))
    # NULL predicate rows are KEPT unchanged (SQL UPDATE semantics)
    t2 = ManifestTable(str(tmp_path / "un"))
    t2.overwrite(
        spark.createDataFrame(
            [(1, None), (2, 5)], "k bigint, w bigint"
        )
    )
    t2.update_where(spark, {"k": "k + 100"}, "w > 0")
    assert sorted(r.k for r in t2.snapshot(spark).collect()) == [1, 102]


def test_update_where_simultaneous_assignment_and_cast(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "sw"))
    t.overwrite(_df(spark, 0, 20))
    # swap v and g: both SET expressions see the PRE-update row
    t.update_where(spark, {"v": "g", "g": "v"}, F.lit(True))
    got = {r.k: (r.g, r.v) for r in t.snapshot(spark).collect()}
    assert all(got[k] == (k * 10, k % 4) for k in range(20))
    # result is cast to the column's existing type (schema never moves)
    t.update_where(spark, {"s": "k * 1.5"}, "k = 1")  # double -> string
    man_schema = t.snapshot(spark).schema
    assert dict((f.name, f.dataType.simpleString()) for f in man_schema)["s"] == "string"
    assert {r.s for r in t.snapshot(spark).filter("k = 1").collect()} == {"1.5"}


def test_update_where_no_match_publishes_nothing(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "nm"))
    t.overwrite(_df(spark, 0, 10))
    v = t.latest_version()
    assert t.update_where(spark, {"v": "0"}, "k > 1000") == v
    assert t.latest_version() == v


def test_update_where_spec_prunes_untouched_files_by_reference(spark, tmp_path):
    """The 100 TB pin: a spec-form WHERE prunes cold files from
    partition values before any scan, and every untouched file is
    carried into the new manifest by reference (same path — never
    read, never rewritten)."""
    t = ManifestTable(str(tmp_path / "p"))
    t.overwrite(_df(spark, 0, 200).repartition(F.col("g")), partition_by=["g"])
    before = {e["path"] for e in t._read_manifest(t.latest_version())["files"]}
    cold_before = {
        e["path"]
        for e in t._read_manifest(t.latest_version())["files"]
        if e["partition"].get("g") != "1"
    }
    t.update_where(spark, {"v": "v + 7"}, [("g", "=", 1), ("k", "<", 50)])
    man = t._read_manifest(t.latest_version())
    after = {e["path"] for e in man["files"]}
    # every cold (g != 1) file survives with its identity intact
    assert cold_before <= after
    # at least one g=1 file was rewritten
    assert after - before
    got = {r.k: r.v for r in t.snapshot(spark).collect()}
    assert all(
        got[k] == (k * 10 + 7 if k % 4 == 1 and k < 50 else k * 10)
        for k in range(200)
    )


def test_update_where_is_idempotent_on_result(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "i"))
    t.overwrite(_df(spark, 0, 50))
    t.update_where(spark, {"v": F.lit(-1).cast("bigint")}, "g = 2")
    first = sorted((r.k, r.v) for r in t.snapshot(spark).collect())
    t.update_where(spark, {"v": F.lit(-1).cast("bigint")}, "g = 2")
    second = sorted((r.k, r.v) for r in t.snapshot(spark).collect())
    assert first == second


def test_update_where_validation_errors(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "e"))
    t.overwrite(_df(spark, 0, 10))
    with pytest.raises(ValueError, match="empty SET"):
        t.update_where(spark, {}, "k = 1")
    with pytest.raises(ValueError, match="not table columns"):
        t.update_where(spark, {"nope": "1"}, "k = 1")
    v = t.latest_version()
    t.alter_constraints(spark, add={"v_nonneg": "v >= 0"})
    with pytest.raises(ConstraintViolationError):
        t.update_where(spark, {"v": "-5"}, "k = 1")
    # failed update published nothing beyond the constraint commit
    assert t.latest_version() == v + 1
    assert t.snapshot(spark).filter("v < 0").count() == 0


def test_update_where_respects_renames_and_migrates_legacy_layout(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "r"))
    t.overwrite(_df(spark, 0, 40), partition_by=["g"])
    t.rename_column("v", "value")
    t.alter_partition_spec(["bucket(4, k)"])
    # logical names in both SET and WHERE; touched legacy files migrate
    t.update_where(spark, {"value": "value + 1"}, [("g", "=", 3)])
    got = {r.k: r.value for r in t.snapshot(spark).collect()}
    assert all(got[k] == k * 10 + (1 if k % 4 == 3 else 0) for k in range(40))
    man = t._read_manifest(t.latest_version())
    rewritten = [e for e in man["files"] if "k_bucket" in e["partition"]]
    assert rewritten  # rewrites landed under the CURRENT spec


def test_update_where_applies_deletion_vectors_first(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "dv"))
    t.overwrite(_df(spark, 0, 30))
    t.delete_where(spark, "k >= 20", mode="merge_on_read")
    t.update_where(spark, {"v": "v + 1"}, "g = 0")
    rows = t.snapshot(spark).collect()
    assert len(rows) == 20  # deleted rows stay deleted after the rewrite
    got = {r.k: r.v for r in rows}
    assert all(got[k] == k * 10 + (1 if k % 4 == 0 else 0) for k in range(20))


# ---------------------------------------------------------------------
# merge matched clauses
# ---------------------------------------------------------------------


def test_merge_clauses_update_subset_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k bigint, s string, v bigint"
    )
    src = spark.createDataFrame([(2, 99), (4, 44)], "k bigint, v bigint")
    out = merge_clauses(target, src, ["k"], update_cols=["v"]).collect()
    got = {r.k: (r.s, r.v) for r in out}
    # matched row: only v changes; unmatched source row inserts NULL-filled
    assert got == {1: ("a", 10), 2: ("b", 99), 3: ("c", 30), 4: (None, 44)}
    # pure UPDATE-JOIN: no inserts
    out2 = merge_clauses(
        target, src, ["k"], update_cols=["v"], insert_unmatched=False
    ).collect()
    assert {r.k: (r.s, r.v) for r in out2} == {1: ("a", 10), 2: ("b", 99), 3: ("c", 30)}
    # a source NULL is a legitimate SET NULL (marker, not null-ness)
    src_null = spark.createDataFrame([(1, None)], "k bigint, v bigint")
    out3 = merge_clauses(target, src_null, ["k"], update_cols=["v"]).collect()
    assert {r.k: r.v for r in out3}[1] is None
    # bad clause columns fail loudly
    with pytest.raises(ValueError, match="non-key target columns"):
        merge_clauses(target, src, ["k"], update_cols=["k"])
    with pytest.raises(ValueError, match="source lacks"):
        merge_clauses(target, src, ["k"], update_cols=["s"])


def test_merge_clauses_delete_pred_cdc(spark):
    target = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k bigint, v bigint"
    )
    # CDC batch: upsert k=1, delete k=2, delete absent k=9 (no-op)
    src = spark.createDataFrame(
        [(1, 11, False), (2, 0, True), (9, 0, True)],
        "k bigint, v bigint, _deleted boolean",
    )
    out = merge_clauses(
        target, src.select("k", "v", "_deleted"), ["k"],
        update_cols=["v"], delete_pred="_deleted",
    ).collect()
    assert {r.k: r.v for r in out} == {1: 11, 3: 30}


def test_merge_clauses_not_matched_by_source_delete(spark):
    target = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k bigint, v bigint"
    )
    src = spark.createDataFrame([(2, 99), (4, 44)], "k bigint, v bigint")
    # full sync: unmatched target rows all die
    out = merge_clauses(
        target, src, ["k"], update_cols=["v"], not_matched_by_source_delete=True
    ).collect()
    assert {r.k: r.v for r in out} == {2: 99, 4: 44}
    # predicate gates the by-source delete on the TARGET row
    out2 = merge_clauses(
        target, src, ["k"], not_matched_by_source_delete="v >= 30"
    ).collect()
    assert {r.k: r.v for r in out2} == {1: 10, 2: 99, 4: 44}
    # a delete-flagged source row still MATCHES (never by-source-deleted
    # twice, never resurrected)
    src_cdc = spark.createDataFrame(
        [(2, 0, True)], "k bigint, v bigint, _del boolean"
    )
    out3 = merge_clauses(
        target, src_cdc, ["k"], update_cols=["v"], delete_pred="_del",
        not_matched_by_source_delete="v >= 30",
    ).collect()
    # k=2 deleted by the matched clause; k=3 by the by-source clause
    assert {r.k: r.v for r in out3} == {1: 10}


def test_manifest_merge_not_matched_by_source_disables_pruning(spark, tmp_path):
    """Full-sync MERGE must delete unmatched rows even in partitions
    the source never mentions — a carried-by-reference file would
    silently keep rows the clause deletes, so pruning is disabled."""
    t = ManifestTable(str(tmp_path / "fs"))
    t.overwrite(_df(spark, 0, 80).repartition(F.col("g")), partition_by=["g"])
    # source lives entirely in g=1; full sync keeps ONLY its keys
    src = spark.range(0, 80).filter(F.col("id") % 4 == 1).select(
        F.col("id").alias("k"), F.lit(1).cast("bigint").alias("g"),
        (F.col("id") * 10).alias("v"), F.concat(F.lit("s"), F.col("id")).alias("s"),
    )
    t.merge(spark, src, keys=["k"], not_matched_by_source_delete=True)
    got = sorted(r.k for r in t.snapshot(spark).collect())
    assert got == [k for k in range(80) if k % 4 == 1]


def test_manifest_merge_when_matched_update_narrow_source(spark, tmp_path):
    """The reference's enrichment layer as a table-format statement:
    a narrow (key, enrichment-col) source updates ONE column of the
    matching rows; cold files carry by reference."""
    t = ManifestTable(str(tmp_path / "m"))
    t.overwrite(_df(spark, 0, 100).repartition(F.col("g")), partition_by=["g"])
    before = {e["path"] for e in t._read_manifest(t.latest_version())["files"]}
    # narrow source: only keys + the enrichment column, single partition
    src = spark.range(0, 100).filter((F.col("id") % 4 == 2) & (F.col("id") < 40)).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("g"),
        F.lit("enriched").alias("s"),
    )
    t.merge(spark, src, keys=["k", "g"], when_matched_update=["s"],
            insert_unmatched=False)
    got = {r.k: (r.s, r.v) for r in t.snapshot(spark).collect()}
    assert len(got) == 100  # pure UPDATE-JOIN: no inserts, no deletes
    for k in range(100):
        want_s = "enriched" if (k % 4 == 2 and k < 40) else f"s{k}"
        assert got[k] == (want_s, k * 10)  # v untouched everywhere
    man = t._read_manifest(t.latest_version())
    after = {e["path"] for e in man["files"]}
    cold = {p for p in before if "/g=2/" not in f"/{p}"}
    # files of other partitions carried by reference
    assert all(p in after for p in cold if "g=2" not in p)


def test_manifest_merge_matched_delete_and_insert(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "cd"))
    t.overwrite(_df(spark, 0, 20))
    src = spark.createDataFrame(
        [(1, 1, 111, "x", False), (2, 2, 0, "", True), (50, 2, 500, "new", False)],
        "k bigint, g bigint, v bigint, s string, _del boolean",
    )
    t.merge(spark, src.select("k", "g", "v", "s", "_del"), keys=["k"],
            when_matched_update=["v"], when_matched_delete="_del")
    got = {r.k: r.v for r in t.snapshot(spark).collect()}
    assert 2 not in got            # matched delete
    assert got[1] == 111           # matched update (v only)
    assert got[50] == 500          # unmatched insert
    assert len(got) == 20          # 20 - 1 deleted + 1 inserted
    # _del is NOT a table column: clause merges never evolve schema
    assert "_del" not in t.snapshot(spark).columns


def test_manifest_merge_clause_validates_rewritten_rows(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "cv"))
    t.overwrite(_df(spark, 0, 10))
    t.alter_constraints(spark, add={"v_nonneg": "v >= 0"})
    src = spark.createDataFrame([(1, -5)], "k bigint, v bigint")
    with pytest.raises(ConstraintViolationError):
        t.merge(spark, src, keys=["k"], when_matched_update=["v"],
                insert_unmatched=False)
    # a narrow source does NOT trip constraints on columns it omits
    src_ok = spark.createDataFrame([(1, 77)], "k bigint, v bigint")
    t.merge(spark, src_ok, keys=["k"], when_matched_update=["v"],
            insert_unmatched=False)
    assert {r.v for r in t.snapshot(spark).filter("k = 1").collect()} == {77}


def test_manifest_merge_clause_no_touch_paths(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "nt"))
    t.overwrite(_df(spark, 0, 10))
    v = t.latest_version()
    # pure UPDATE-JOIN matching nothing publishes nothing
    src = spark.createDataFrame([(999, 1)], "k bigint, v bigint")
    assert t.merge(spark, src, keys=["k"], when_matched_update=["v"],
                   insert_unmatched=False) == v
    # with inserts allowed, the unmatched row lands NULL-filled
    t.merge(spark, src, keys=["k"], when_matched_update=["v"])
    row = t.snapshot(spark).filter("k = 999").collect()[0]
    assert row.v == 1 and row.s is None


# ---------------------------------------------------------------------
# round-10 clause surface: empty SET, expression SET, cross-branch
# duplicate keys, WHEN NOT MATCHED BY SOURCE THEN UPDATE, first-commit
# CDC-flag hygiene
# ---------------------------------------------------------------------


def test_merge_clauses_empty_update_is_noop_matched(spark):
    """update_cols=[] is SQL MERGE with no WHEN MATCHED THEN UPDATE:
    matched rows pass through untouched, unmatched still insert —
    NOT whole-row replacement (the r9 ADVICE high finding)."""
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k bigint, s string, v bigint"
    )
    src = spark.createDataFrame([(2,), (4,)], "k bigint")
    out = merge_clauses(target, src, ["k"], update_cols=[]).collect()
    got = {r.k: (r.s, r.v) for r in out}
    assert got == {1: ("a", 10), 2: ("b", 20), 4: (None, None)}


def test_merge_clauses_expression_set(spark):
    """Dict-mode SET: expressions over the joined row — bare names are
    TARGET columns, source.<name> the source row; simultaneous
    assignment; results cast to the column dtype."""
    target = spark.createDataFrame(
        [(1, 100, 5), (2, 200, 7)], "k bigint, total bigint, n bigint"
    )
    src = spark.createDataFrame([(2, 42), (9, 1)], "k bigint, delta bigint")
    out = merge_clauses(
        target, src, ["k"],
        update_cols={"total": "total + source.delta", "n": "n * 2"},
        insert_unmatched=False,
    ).collect()
    assert {r.k: (r.total, r.n) for r in out} == {1: (100, 5), 2: (242, 14)}
    # simultaneous: both RHS see pre-update values
    out2 = merge_clauses(
        target, src, ["k"],
        update_cols={"total": "n", "n": "total"},
        insert_unmatched=False,
    ).collect()
    assert {r.k: (r.total, r.n) for r in out2} == {1: (100, 5), 2: (7, 200)}
    # cast to target dtype: a double expression lands as bigint
    out3 = merge_clauses(
        target, src, ["k"],
        update_cols={"total": "total * 1.5"}, insert_unmatched=False,
    ).collect()
    assert {r.k: r.total for r in out3} == {1: 100, 2: 300}
    # inserts still work in expression mode (whole source row aligns)
    src_wide = spark.createDataFrame(
        [(2, 42, 9), (7, 0, 70)], "k bigint, delta bigint, total bigint"
    )
    out4 = merge_clauses(
        target, src_wide, ["k"], update_cols={"total": "total + source.delta"},
    ).collect()
    got = {r.k: (r.total, r.n) for r in out4}
    assert got == {1: (100, 5), 2: (242, 7), 7: (70, None)}
    # refusals: unknown source column, non-string value, key assignment
    with pytest.raises(ValueError, match="source.missing"):
        merge_clauses(target, src, ["k"], update_cols={"total": "source.missing"})
    with pytest.raises(TypeError, match="SQL strings"):
        merge_clauses(target, src, ["k"], update_cols={"total": F.lit(1)})
    with pytest.raises(ValueError, match="non-key target columns"):
        merge_clauses(target, src, ["k"], update_cols={"k": "source.delta"})


def test_merge_clauses_cross_branch_duplicate_key_raises(spark):
    """A source carrying one key BOTH delete-flagged and unflagged with
    no order_col is ambiguous (the unflagged row would vanish in
    update mode, resurrect in upsert mode — r9 Wrong #1): raise, like
    Delta's MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW."""
    target = spark.createDataFrame([(1, 10), (2, 20)], "k bigint, v bigint")
    src = spark.createDataFrame(
        [(2, 0, True), (2, 99, False)], "k bigint, v bigint, _del boolean"
    )
    with pytest.raises(ValueError, match="both delete-flagged and unflagged"):
        merge_clauses(target, src, ["k"], update_cols=["v"], delete_pred="_del")
    with pytest.raises(ValueError, match="both delete-flagged and unflagged"):
        merge_clauses(target, src, ["k"], delete_pred="_del")
    # an order_col arbitrates: last writer wins, no raise
    src_ord = spark.createDataFrame(
        [(2, 0, True, 1), (2, 99, False, 2)],
        "k bigint, v bigint, _del boolean, seq bigint",
    )
    out = merge_clauses(
        target, src_ord, ["k"], order_col="seq",
        update_cols=["v"], delete_pred="_del",
    ).collect()
    assert {r.k: r.v for r in out} == {1: 10, 2: 99}
    # same-branch duplicates (both flagged) stay fine without order_col
    src_same = spark.createDataFrame(
        [(2, 0, True), (2, 1, True)], "k bigint, v bigint, _del boolean"
    )
    out2 = merge_clauses(
        target, src_same, ["k"], update_cols=["v"], delete_pred="_del"
    ).collect()
    assert {r.k: r.v for r in out2} == {1: 10}


def test_merge_clauses_not_matched_by_source_update(spark):
    """Delta's WHEN NOT MATCHED BY SOURCE THEN UPDATE SET: unmatched
    target rows take target-row expressions, gated by the optional
    predicate; the by-source DELETE clause wins on rows both claim."""
    target = spark.createDataFrame(
        [(1, 10, True), (2, 20, True), (3, 30, True), (4, 40, True)],
        "k bigint, v bigint, active boolean",
    )
    src = spark.createDataFrame([(2,), (3,)], "k bigint")
    out = merge_clauses(
        target, src, ["k"], update_cols=[],
        not_matched_by_source_update={"active": "false", "v": "v + 1000"},
        not_matched_by_source_update_pred="v < 40",
    ).collect()
    assert {r.k: (r.v, r.active) for r in out} == {
        1: (1010, False), 2: (20, True), 3: (30, True), 4: (40, True),
    }
    # combined with the delete clause: delete first, update the rest
    out2 = merge_clauses(
        target, src, ["k"], update_cols=[],
        not_matched_by_source_delete="v < 20",
        not_matched_by_source_update={"active": "false"},
    ).collect()
    assert {r.k: (r.v, r.active) for r in out2} == {
        2: (20, True), 3: (30, True), 4: (40, False),
    }
    # key / unknown columns refuse
    with pytest.raises(ValueError, match="non-key target columns"):
        merge_clauses(
            target, src, ["k"], update_cols=[],
            not_matched_by_source_update={"k": "0"},
        )


def test_manifest_merge_nmbs_update_disables_pruning(spark, tmp_path):
    """The by-source UPDATE clause, like the DELETE one, must reach
    rows in partitions the source never mentions."""
    t = ManifestTable(str(tmp_path / "nu"))
    t.overwrite(_df(spark, 0, 80).repartition(F.col("g")), partition_by=["g"])
    # source lives entirely in g=1; unmatched rows everywhere get v=-1
    src = spark.range(0, 80).filter(F.col("id") % 4 == 1).select(
        F.col("id").alias("k"), F.lit(1).cast("bigint").alias("g"),
    )
    t.merge(
        spark, src, keys=["k"], when_matched_update=[],
        insert_unmatched=False,
        not_matched_by_source_update={"v": "-1"},
    )
    got = {r.k: r.v for r in t.snapshot(spark).collect()}
    assert len(got) == 80
    for k in range(80):
        assert got[k] == (k * 10 if k % 4 == 1 else -1), k


def test_manifest_merge_first_commit_drops_cdc_flag(spark, tmp_path):
    """A clause merge that CREATES the table must not bake the CDC
    tombstone column into the schema (r9 ADVICE medium): merges
    against an existing table keep the flag out, so the first commit
    must too — a restarted stream's first batch and its tenth see the
    same schema."""
    t = ManifestTable(str(tmp_path / "fresh"))
    src = spark.createDataFrame(
        [(1, 10, False), (2, 20, True), (3, 30, False)],
        "k bigint, v bigint, _deleted boolean",
    )
    t.merge(spark, src, keys=["k"], when_matched_delete="_deleted")
    snap = t.snapshot(spark)
    assert "_deleted" not in snap.columns
    assert {r.k: r.v for r in snap.collect()} == {1: 10, 3: 30}
    # the SECOND batch (existing-table path) agrees on the schema
    src2 = spark.createDataFrame(
        [(3, 0, True), (4, 40, False)], "k bigint, v bigint, _deleted boolean"
    )
    t.merge(spark, src2, keys=["k"], when_matched_delete="_deleted")
    snap2 = t.snapshot(spark)
    assert "_deleted" not in snap2.columns
    assert {r.k: r.v for r in snap2.collect()} == {1: 10, 4: 40}
    # an EXPRESSION delete_pred (not a plain column name) leaves the
    # source untouched on first commit — only the documented CDC
    # column shape is merge metadata
    t2 = ManifestTable(str(tmp_path / "fresh2"))
    t2.merge(spark, src, keys=["k"], when_matched_delete="_deleted = true")
    assert "_deleted" in t2.snapshot(spark).columns


def test_manifest_merge_expression_set_integration(spark, tmp_path):
    """Expression SET through ManifestTable.merge: CDC increments land
    transactionally, file pruning still keyed by the source."""
    t = ManifestTable(str(tmp_path / "exp"))
    t.overwrite(_df(spark, 0, 40))
    src = spark.createDataFrame(
        [(1, 5), (2, -3)], "k bigint, delta bigint"
    )
    t.merge(
        spark, src, keys=["k"],
        when_matched_update={"v": "v + source.delta"},
        insert_unmatched=False,
    )
    got = {r.k: r.v for r in t.snapshot(spark).collect()}
    assert got[1] == 15 and got[2] == 17
    assert all(got[k] == k * 10 for k in range(3, 40))


def test_update_where_allmatch_fast_path(spark, tmp_path):
    """When metadata PROVES a whole file matches the spec (partition
    constant / stats range + zero nulls), update_where rewrites it
    without the hit-discovery scan (r9 nit): the allmatch split
    records every candidate as proved and the result is identical."""
    t = ManifestTable(str(tmp_path / "am"))
    t.overwrite(_df(spark, 0, 80).repartition(F.col("g")), partition_by=["g"])
    # predicate = a whole partition: every candidate file proves
    v = t.update_where(spark, {"s": "'bulk'"}, [("g", "=", 1)])
    plan = t.last_planning
    assert plan["op"] == "update-allmatch"
    assert plan["kept"] == plan["candidates"] and plan["kept"] > 0
    got = {r.k: r.s for r in t.snapshot(spark).collect()}
    for k in range(80):
        assert got[k] == ("bulk" if k % 4 == 1 else f"s{k}"), k
    assert v == 2
    # a range predicate over an unpartitioned column: only SOME files
    # prove; the rest go through the scan — result still exact
    t2 = ManifestTable(str(tmp_path / "am2"))
    t2.overwrite(_df(spark, 0, 100).repartitionByRange(4, F.col("k")))
    t2.update_where(spark, {"v": "v + 1"}, [("k", "<", 50)])
    got2 = {r.k: r.v for r in t2.snapshot(spark).collect()}
    for k in range(100):
        assert got2[k] == k * 10 + (1 if k < 50 else 0), k


def test_merge_clauses_insert_cols(spark):
    """Column-list INSERT at the relational level: listed columns take
    source values, others NULL; keys required; source must carry the
    listed columns."""
    target = spark.createDataFrame(
        [(1, "a", 10)], "k bigint, s string, v bigint"
    )
    src = spark.createDataFrame(
        [(1, "X", 11), (5, "y", 50)], "k bigint, s string, v bigint"
    )
    out = merge_clauses(
        target, src, ["k"], update_cols=["v"], insert_cols=["k", "v"]
    ).collect()
    got = {r.k: (r.s, r.v) for r in out}
    assert got == {1: ("a", 11), 5: (None, 50)}
    with pytest.raises(ValueError, match="every merge key"):
        merge_clauses(target, src, ["k"], update_cols=["v"], insert_cols=["v"])
    with pytest.raises(ValueError, match="not source columns"):
        merge_clauses(
            target,
            src.select("k", "v"),
            ["k"],
            update_cols=["v"],
            insert_cols=["k", "s"],
        )
    with pytest.raises(ValueError, match="clause-mode"):
        merge_clauses(target, src, ["k"], insert_cols=["k", "v"])


def test_merge_clauses_conditional_matched_update(spark):
    """Delta's WHEN MATCHED AND cond THEN UPDATE: the condition sees
    the joined row; failing/NULL rows keep their values and still
    never insert."""
    target = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")],
        "k bigint, v bigint, s string",
    )
    src = spark.createDataFrame(
        [(1, 11), (2, 5), (3, None), (9, 90)], "k bigint, v bigint"
    )
    # update only when the source value is larger than the target's
    out = merge_clauses(
        target, src, ["k"], update_cols=["v"],
        update_pred="source.v > v",
    ).collect()
    got = {r.k: (r.v, r.s) for r in out}
    assert got == {
        1: (11, "a"),   # 11 > 10: updated
        2: (20, "b"),   # 5 > 20 false: kept
        3: (30, "c"),   # NULL condition: kept
        9: (90, None),  # unmatched: inserted regardless of the gate
    }
    # expression-mode SET with a gate
    out2 = merge_clauses(
        target, src, ["k"],
        update_cols={"v": "v + source.v"},
        update_pred="s = 'a'",
        insert_unmatched=False,
    ).collect()
    assert {r.k: r.v for r in out2} == {1: 21, 2: 20, 3: 30}
    # guards
    with pytest.raises(ValueError, match="requires update_cols|gates"):
        merge_clauses(target, src, ["k"], update_pred="v > 0")
    with pytest.raises(TypeError, match="SQL string"):
        merge_clauses(
            target, src, ["k"], update_cols=["v"], update_pred=F.lit(True)
        )


def test_manifest_merge_conditional_matched_update_sql(spark, tmp_path):
    """The gated UPDATE through the table verb and the SQL grammar."""
    from etl_job_spark.sql import execute_dml

    t = ManifestTable(str(tmp_path / "gu"))
    t.overwrite(
        spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30)], "k bigint, v bigint"
        )
    )
    spark.createDataFrame(
        [(1, 100), (2, 1), (4, 40)], "k bigint, v bigint"
    ).createOrReplaceTempView("gu_src")
    execute_dml(
        spark, t,
        "MERGE INTO gu t USING gu_src s ON t.k = s.k "
        "WHEN MATCHED AND s.v > t.v THEN UPDATE SET t.v = s.v "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    got = {r.k: r.v for r in t.snapshot(spark).collect()}
    assert got == {1: 100, 2: 20, 3: 30, 4: 40}
