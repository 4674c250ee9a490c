"""merge_upsert unit + property tests (SURVEY.md §5 items 2-3).

Covers every K3 branch from FIXTURES.md "Merge-test deltas": update
path, insert path, intra-batch duplicate keys (last-writer-wins), and
the idempotency property (merging the same batch twice ≡ once).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_job_spark.operators.merge import merge_upsert

COLS = ["sp_code", "sale_date", "amt"]


def _df(spark, rows):
    return spark.createDataFrame(rows, "sp_code string, sale_date string, amt double")


def _sorted(df):
    return sorted(tuple(r) for r in df.select(*COLS).collect())


def test_update_insert_paths(spark):
    target = _df(spark, [("s1", "d1", 1.0), ("s1", "d2", 2.0), ("s2", "d1", 3.0)])
    source = _df(spark, [("s1", "d1", 10.0), ("s3", "d1", 30.0)])
    out = merge_upsert(target, source.withColumn("seq", F.lit(1)), ["sp_code", "sale_date"], "seq")
    assert _sorted(out) == [
        ("s1", "d1", 10.0),  # update path
        ("s1", "d2", 2.0),  # untouched
        ("s2", "d1", 3.0),  # untouched
        ("s3", "d1", 30.0),  # insert path
    ]


def test_last_writer_wins_within_batch(spark):
    target = _df(spark, [("s1", "d1", 1.0)])
    source = spark.createDataFrame(
        [("s1", "d1", 100.0, 1), ("s1", "d1", 200.0, 2), ("s9", "d9", 9.0, 1)],
        "sp_code string, sale_date string, amt double, seq int",
    )
    out = merge_upsert(target, source, ["sp_code", "sale_date"], order_col="seq")
    assert _sorted(out) == [("s1", "d1", 200.0), ("s9", "d9", 9.0)]


def test_idempotency(spark):
    target = _df(spark, [(f"s{i}", f"d{i % 3}", float(i)) for i in range(20)])
    source = _df(spark, [(f"s{i}", f"d{i % 3}", float(i * 10)) for i in range(5, 25)]).withColumn(
        "seq", F.lit(1)
    )
    once = merge_upsert(target, source, ["sp_code", "sale_date"], "seq")
    twice = merge_upsert(once, source, ["sp_code", "sale_date"], "seq")
    assert _sorted(once) == _sorted(twice)


def test_partition_pred_fast_path(spark):
    target = _df(spark, [("s1", "d1", 1.0), ("s1", "d2", 2.0), ("s2", "d9", 9.0)])
    source = _df(spark, [("s1", "d1", 10.0)]).withColumn("seq", F.lit(1))
    out = merge_upsert(
        target,
        source,
        ["sp_code", "sale_date"],
        "seq",
        partition_pred=F.col("sale_date") == "d1",
    )
    assert _sorted(out) == [("s1", "d1", 10.0), ("s1", "d2", 2.0), ("s2", "d9", 9.0)]


def test_recover_rename_commit_restores_stranded_old(spark, tmp_path):
    """Crash window repair: if a merge died between its two renames,
    the table is missing and the old data sits in .__old__ — recovery
    must restore it (and a rerun of the merge must then succeed)."""
    import os

    from etl_job_spark.operators.merge import merge_upsert_path, recover_rename_commit

    target = str(tmp_path / "mart")
    _df(spark, [("s1", "d1", 1.0)]).write.parquet(target)

    # simulate the crash: target renamed away, staging never promoted
    os.rename(target, target + ".__old__")
    os.makedirs(target + ".__staging__")

    assert recover_rename_commit(target) is True
    assert os.path.exists(target)
    assert not os.path.exists(target + ".__staging__")
    assert not os.path.exists(target + ".__old__")
    assert _sorted(spark.read.parquet(target)) == [("s1", "d1", 1.0)]

    # the interrupted merge is simply re-run — merge_upsert_path also
    # self-recovers, so this works even without the explicit call
    os.rename(target, target + ".__old__")
    src = _df(spark, [("s1", "d1", 7.0)])
    merge_upsert_path(spark, target, src, ["sp_code", "sale_date"])
    assert _sorted(spark.read.parquet(target)) == [("s1", "d1", 7.0)]
