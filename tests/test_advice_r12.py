"""Round-11 ADVICE closures + the round-12 broadcast-ordered-MERGE
fast path (VERDICT r11 next-round #5):

- low: COPY INTO's ledger signature is nanosecond-mtime — a landed
  file rewritten in place with the same size within the same second
  now refuses instead of being silently skipped forever; ledgers
  written with the old whole-second signature still validate.
- low: copy_into glob-escapes the landing DIRECTORY, so metacharacter
  paths ('batch[1]') load instead of silently matching nothing.
- low: SQL ``INSERT INTO … REPLACE WHERE`` translates simple
  conjunctive predicates into the spec tuple form, so the
  metadata-only planning tier (partition/stats/bloom prune +
  all-match short-circuit) engages from SQL.
- low: the ordered MERGE uniqueness rule is now exactly Delta's
  MULTIPLE_SOURCE_ROW rule — only duplicates that MATCH a target row
  refuse; unmatched duplicates double-insert, and insert-only
  statements skip the probe.
- new: ``small_source`` replans the ordered engine's full-outer join
  as broadcast joins (left + semi + anti, every build side small) with
  identical results — a dim-sized two-clause MERGE against a big
  target no longer pays a sort-merge shuffle of the target.
"""

from __future__ import annotations

import contextlib
import io
import json
import os

import pytest

from etl_job_spark.operators.merge import merge_ordered
from etl_job_spark.sql import execute_dml
from etl_job_spark.table import ManifestTable, _manifest_name


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------------
# COPY INTO ledger: nanosecond signature + legacy whole-second compat
# ---------------------------------------------------------------------


def test_copy_into_detects_same_second_rewrite(spark, tmp_path):
    """A landed file rewritten in place with the SAME size and the same
    whole-second mtime must read as changed (the old int(st_mtime)
    signature could not see it)."""
    land = tmp_path / "land"
    land.mkdir()
    spark.createDataFrame([(1, "a")], "k int, v string").coalesce(1).write.parquet(
        str(land / "batch1")
    )
    t = ManifestTable(str(tmp_path / "t"))
    t.copy_into(spark, str(land))
    f = next(
        str(p) for p in (land / "batch1").iterdir() if p.name.endswith(".parquet")
    )
    st = os.stat(f)
    data = open(f, "rb").read()
    with open(f, "wb") as fh:
        fh.write(data)  # same bytes → same size
    # same whole second, different nanoseconds — the in-place rewrite
    # the ADVICE flagged as invisible
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000))
    with pytest.raises(ValueError, match="changed in place"):
        t.copy_into(spark, str(land))


def test_copy_into_accepts_legacy_second_ledger(spark, tmp_path):
    """A ledger written by the pre-ns engine recorded [size,
    int(mtime)]; an unchanged file must still read as loaded (no
    spurious 'changed' refusal on upgrade)."""
    land = tmp_path / "land"
    land.mkdir()
    spark.createDataFrame([(1, "a")], "k int, v string").coalesce(1).write.parquet(
        str(land / "batch1")
    )
    t = ManifestTable(str(tmp_path / "t"))
    v = t.copy_into(spark, str(land))
    # rewrite the committed ledger to the legacy whole-second form, as
    # an old engine version would have written it
    mpath = os.path.join(t.manifest_dir, _manifest_name(v))
    man = json.load(open(mpath))
    man["copy_ledger"] = {
        k: [size, ns // 1_000_000_000] for k, (size, ns) in man["copy_ledger"].items()
    }
    with open(mpath, "w") as fh:
        json.dump(man, fh)
    t2 = ManifestTable(t.path)
    assert t2.copy_into(spark, str(land)) == v  # metadata no-op, no refusal


def test_copy_into_glob_metacharacter_directory(spark, tmp_path):
    land = tmp_path / "batch[1]"
    land.mkdir()
    spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string").coalesce(
        1
    ).write.parquet(str(land / "day1"))
    t = ManifestTable(str(tmp_path / "t"))
    t.copy_into(spark, str(land))
    assert _rows(t.snapshot(spark)) == [(1, "a"), (2, "b")]


# ---------------------------------------------------------------------
# SQL REPLACE WHERE: the spec-form metadata tier engages from SQL
# ---------------------------------------------------------------------


def test_sql_replace_where_plans_from_metadata(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    df = spark.createDataFrame(
        [(p, k, k * 10) for p in ("a", "b", "c") for k in range(3)],
        "p string, k int, v int",
    )
    t.overwrite(df, partition_by=["p"])
    spark.createDataFrame(
        [("a", 7, 700)], "p string, k int, v int"
    ).createOrReplaceTempView("rw12_src")
    execute_dml(
        spark, t, "INSERT INTO tbl REPLACE WHERE p = 'a' SELECT * FROM rw12_src"
    )
    # the canonical whole-partition replace proved its files from
    # metadata alone — no discovery scan (ADVICE r11: the SQL route
    # used to hand a string and always scan)
    assert t.last_planning["op"] == "replace-allmatch"
    assert _rows(t.snapshot(spark)) == sorted(
        [("a", 7, 700)] + [(p, k, k * 10) for p in ("b", "c") for k in range(3)]
    )
    # richer predicates still work through the string fallback
    spark.createDataFrame(
        [("b", 0, 1)], "p string, k int, v int"
    ).createOrReplaceTempView("rw12_src2")
    execute_dml(
        spark,
        t,
        "INSERT INTO tbl REPLACE WHERE p = 'b' AND k + 0 = 0 "
        "SELECT * FROM rw12_src2",
    )
    got = dict(((p, k), v) for p, k, v in _rows(t.snapshot(spark)))
    assert got[("b", 0)] == 1 and got[("b", 1)] == 10


# ---------------------------------------------------------------------
# Ordered MERGE: Delta's exact MULTIPLE_SOURCE_ROW rule
# ---------------------------------------------------------------------


def _tgt(spark):
    return spark.createDataFrame(
        [(1, 10, 100), (2, 20, 200)], "k int, v int, w int"
    )


def test_unmatched_duplicates_double_insert(spark):
    """Delta legally double-inserts duplicate keys that match nothing;
    the blanket refusal was stricter than the semantics advertised."""
    src = spark.createDataFrame(
        [(9, 1, "I"), (9, 2, "I"), (1, 5, "U")], "k int, v int, op string"
    )
    out = merge_ordered(
        _tgt(spark),
        src,
        ["k"],
        [("update", None, ["v"]), ("insert", None, ["k", "v"])],
    ).collect()
    assert sorted(r.v for r in out if r.k == 9) == [1, 2]  # both inserted
    assert [r.v for r in out if r.k == 1] == [5]


def test_matched_duplicates_still_refuse(spark):
    src = spark.createDataFrame([(1, 1), (1, 2)], "k int, v int")
    with pytest.raises(ValueError, match="duplicate keys that match"):
        merge_ordered(_tgt(spark), src, ["k"], [("update", None, ["v"])])


def test_insert_only_skips_uniqueness_probe(spark):
    """An insert-only statement can never double-fire a matched clause;
    duplicates (even ones matching a target key — they just don't
    insert) pass without the probe job."""
    src = spark.createDataFrame([(1, 1), (1, 2), (9, 9)], "k int, v int")
    out = merge_ordered(
        _tgt(spark), src, ["k"], [("insert", None, ["k", "v"])]
    ).collect()
    assert sorted(r.v for r in out if r.k == 9) == [9]
    assert sorted(r.v for r in out if r.k == 1) == [10]  # target row untouched


# ---------------------------------------------------------------------
# Broadcast-eligible ordered MERGE (VERDICT r11 #5)
# ---------------------------------------------------------------------

_CLAUSES = [
    ("update", "source.v > 0", ["v"]),
    ("delete", "source.w < 0"),
    ("update", None, {"w": "w + source.v"}),
    ("insert", "v > 0", ["k", "v"]),
    ("insert", None, None),
    ("by_source_delete", "w < 0"),
]


def _batches(spark):
    tgt = spark.createDataFrame(
        [(k, k, 100 - 30 * k) for k in range(8)], "k int, v int, w int"
    )
    src = spark.createDataFrame(
        [(0, 5, 1), (1, -1, -9), (2, 0, 3), (10, 4, 4), (11, -2, 5)],
        "k int, v int, w int",
    )
    return tgt, src


def test_small_source_plan_broadcasts_and_matches_full_outer(spark):
    tgt, src = _batches(spark)
    full = merge_ordered(tgt, src, ["k"], _CLAUSES)
    fast = merge_ordered(tgt, src, ["k"], _CLAUSES, small_source=True)
    assert _rows(fast) == _rows(full)
    p = _plan(fast)
    assert "BroadcastHashJoin" in p
    # the big (target) side never sort-merge joins
    assert "SortMergeJoin" not in p


def test_table_ordered_merge_takes_broadcast_plan(spark, tmp_path):
    """Table-level: a dim-sized two-clause MERGE commits the identical
    state the full-outer route would, and the probe routes it through
    the broadcast plan."""
    t = ManifestTable(str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame(
            [(k, f"p{k % 3}", float(k)) for k in range(50)], "k int, p string, v double"
        ),
        partition_by=["p"],
    )
    src = spark.createDataFrame(
        [(1, "p1", 100.0), (99, "p0", 9.0)], "k int, p string, v double"
    )
    t.merge(
        spark,
        src,
        keys=["k"],
        clauses=[
            ("update", "source.v > 50", ["v"]),
            ("update", None, {"v": "v + source.v"}),
            ("insert", None, None),
        ],
    )
    got = {r.k: r.v for r in t.snapshot(spark).collect()}
    assert got[1] == 100.0 and got[99] == 9.0 and got[2] == 2.0
    assert len(got) == 51
