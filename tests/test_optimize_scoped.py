"""Partition-scoped OPTIMIZE (VERDICT r10 next-round #6):
``OPTIMIZE t WHERE <pred>`` / ``compact_small_files(predicates=…)``
bounds the bin-pack to files the spec-form predicate can touch — the
manifest-diff pin shows every out-of-scope file carried by reference."""

from __future__ import annotations

import pytest

from etl_job_spark.sql import _parse_spec_predicate, execute_dml
from etl_job_spark.table import ManifestTable


def _paths(t, version=None):
    v = version if version is not None else t.latest_version()
    return {e["path"] for e in t._read_manifest(v)["files"]}


def _frag(spark, tmp_path, name):
    """A day-partitioned table fragmented by four tiny appends."""
    t = ManifestTable(str(tmp_path / name))
    mk = lambda lo, hi, d: spark.range(lo, hi).selectExpr(  # noqa: E731
        "id as k", f"'{d}' as dy"
    )
    t.overwrite(mk(0, 5, "2024-01-01"), partition_by=["dy"])
    for i in range(4):
        t.append(
            mk(10 + i, 11 + i, "2024-01-01").unionAll(mk(50 + i, 51 + i, "2024-01-02"))
        )
    return t


def test_parse_spec_predicate():
    assert _parse_spec_predicate("dy = '2024-01-01'") == [
        ("dy", "=", "2024-01-01")
    ]
    assert _parse_spec_predicate(
        "k BETWEEN 3 AND 7 AND dy IN ('a', 'b') AND v >= 1.5 "
        "AND t IS NOT NULL AND u IS NULL"
    ) == [
        ("k", "between", (3, 7)),
        ("dy", "in", ["a", "b"]),
        ("v", ">=", 1.5),
        ("t", "not_null"),
        ("u", "is_null"),
    ]
    with pytest.raises(ValueError, match="provable from file metadata"):
        _parse_spec_predicate("dy = 'a' OR dy = 'b'")
    with pytest.raises(ValueError, match="provable from file metadata"):
        _parse_spec_predicate("lower(dy) = 'a'")
    with pytest.raises(ValueError, match="literal"):
        _parse_spec_predicate("k = other_col")


def test_scoped_optimize_touches_only_matching_partition(spark, tmp_path):
    t = _frag(spark, tmp_path, "hot")
    before = _paths(t)
    day1 = {p for p in before if "dy=2024-01-01" in p}
    day2 = {p for p in before if "dy=2024-01-02" in p}
    assert len(day1) >= 5 and len(day2) >= 4  # fragmented both days
    v = t.compact_small_files(spark, predicates=[("dy", "=", "2024-01-01")])
    after = _paths(t, v)
    # the manifest-diff pin: every 2024-01-02 file carried BY REFERENCE
    assert {p for p in after if "dy=2024-01-02" in p} == day2
    # the hot partition packed into fewer, fresh files
    new_day1 = {p for p in after if "dy=2024-01-01" in p}
    assert new_day1.isdisjoint(day1)
    assert len(new_day1) < len(day1)
    # rows intact
    got = sorted(r.k for r in t.snapshot(spark).collect())
    assert got == sorted(list(range(5)) + [10, 11, 12, 13, 50, 51, 52, 53])
    # operation records the scope
    assert "predicates" in t._read_raw_manifest(v)["operation"]


def test_scoped_optimize_by_key_range_stats(spark, tmp_path):
    """Unpartitioned table: the scope reasons from footer stats — a
    key-range predicate exempts files provably outside it."""
    t = ManifestTable(str(tmp_path / "rng"))
    t.overwrite(spark.range(0, 100).repartitionByRange(2, "id").selectExpr("id as k"))
    for i in range(3):
        t.append(spark.range(1000 + i, 1001 + i).selectExpr("id as k"))
    before = _paths(t)
    low_files = {
        e["path"]
        for e in t._read_manifest(t.latest_version())["files"]
        if e["stats"]["k"]["max"] < 1000
    }
    v = t.compact_small_files(spark, predicates=[("k", ">=", 1000)])
    after = _paths(t, v)
    assert low_files <= after  # sub-1000 files untouched
    assert len(after) < len(before)


def test_scoped_optimize_sql_route(spark, tmp_path):
    t = _frag(spark, tmp_path, "sqlopt")
    before = _paths(t)
    day2 = {p for p in before if "dy=2024-01-02" in p}
    v = execute_dml(spark, t, "OPTIMIZE sqlopt WHERE dy = '2024-01-01'")
    assert {p for p in _paths(t, v) if "dy=2024-01-02" in p} == day2
    with pytest.raises(ValueError, match="pick one"):
        execute_dml(spark, t, "OPTIMIZE sqlopt WHERE dy = 'x' ZORDER BY (k)")
    # a scope matching nothing fragmented is a no-op (same version)
    assert execute_dml(spark, t, "OPTIMIZE sqlopt WHERE dy = '1999-01-01'") == v
