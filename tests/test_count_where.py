"""count_where: exact predicate counts whose interior is answered
from metadata — all-match files contribute footer live-row counts,
only boundary files are scanned."""

import decimal

from pyspark.sql import functions as F

from etl_job_spark.table import ManifestTable


def _mk_clustered(spark, path, n=1000, files=10):
    t = ManifestTable(str(path))
    t.overwrite(
        spark.range(0, n)
        .selectExpr("id as k", "if(id % 9 = 0, null, concat('v', id)) as v")
        .repartitionByRange(files, "k")
        .sortWithinPartitions("k")
    )
    return t


def test_range_count_metadata_interior(spark, tmp_path):
    t = _mk_clustered(spark, tmp_path / "t")
    got = t.count_where(spark, [("k", "between", (150, 840))])
    assert got == t.snapshot(spark).filter("k between 150 and 840").count() == 691
    plan = t.last_count_plan
    # interior files counted from footers; at most the two boundary
    # files (plus none pruned wrongly) scanned
    assert plan["metadata_files"] >= 5
    assert plan["scanned_files"] <= 2
    assert plan["metadata_rows"] + 0 <= got

    # a window aligned exactly on file boundaries scans nothing
    man = t._read_manifest(t.latest_version())
    s = man["files"][3]["stats"]["k"]
    got2 = t.count_where(spark, [("k", "between", (s["min"], s["max"]))])
    assert got2 == s["max"] - s["min"] + 1
    assert t.last_count_plan["scanned_files"] == 0


def test_null_rows_force_boundary_scan_for_ranges(spark, tmp_path):
    """A file holding NULLs in the predicate column can never be
    all-match for a comparison (NULL fails every comparison) — it must
    be scanned, and the count stays exact."""
    t = ManifestTable(str(tmp_path / "n"))
    t.overwrite(
        spark.range(0, 300)
        .selectExpr("id as k", "if(id % 10 = 0, null, id) as m")
        .repartitionByRange(3, "k")
        .sortWithinPartitions("k")
    )
    got = t.count_where(spark, [("m", ">=", 0)])
    assert got == 270  # the 30 NULL rows don't match
    assert t.last_count_plan["metadata_files"] == 0  # every file has NULLs
    assert t.last_count_plan["scanned_files"] == 3


def test_nullness_counts(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "z"))
    t.overwrite(
        spark.range(0, 100).selectExpr("id as k", "concat('v', id) as v").coalesce(1)
    )
    t.append(spark.range(100, 160).selectExpr("id as k", "cast(null as string) as v").coalesce(1))
    assert t.count_where(spark, [("v", "is_null")]) == 60
    assert t.last_count_plan["scanned_files"] == 0  # both files provable
    assert t.count_where(spark, [("v", "not_null")]) == 100
    assert t.last_count_plan["scanned_files"] == 0


def test_partition_equality_count_is_pure_metadata(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "p"))
    df = spark.createDataFrame(
        [(i, f"d{i % 4}") for i in range(400)], "k long, dy string"
    )
    t.overwrite(df.repartition(F.col("dy")), partition_by=["dy"])
    got = t.count_where(spark, [("dy", "=", "d2")])
    assert got == 100
    assert t.last_count_plan["scanned_files"] == 0
    assert t.last_count_plan["metadata_files"] >= 1


def test_count_with_deletion_vectors_stays_exact(spark, tmp_path):
    t = _mk_clustered(spark, tmp_path / "dv", n=500, files=5)
    t.delete_keys(spark, "k", [5, 6, 250, 499], mode="merge_on_read")
    got = t.count_where(spark, [("k", ">=", 0)])
    assert got == 496
    # all-match files contribute live rows (rows - dv) without a scan
    assert t.last_count_plan["scanned_files"] == 0
    got = t.count_where(spark, [("k", "between", (200, 300))])
    assert got == t.snapshot(spark).filter("k between 200 and 300").count() == 100


def test_any_of_and_decimal_and_empty(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "d"))
    t.overwrite(
        spark.range(0, 400)
        .selectExpr("id as k", "cast(cast(id as string) || '.50' as decimal(10,2)) as amt")
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k")
    )
    got = t.count_where(
        spark, any_of=[[("k", "<", 50)], [("k", ">=", 380)]]
    )
    assert got == 70
    # decimal range through exact encodings
    got = t.count_where(
        spark, [("amt", "between", (decimal.Decimal("100.50"), decimal.Decimal("199.50")))]
    )
    assert got == 100
    assert t.count_where(spark, [("k", ">", 10_000)]) == 0
    assert t.last_count_plan["pruned_candidates"] == 0
