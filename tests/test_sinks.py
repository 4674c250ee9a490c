"""Sink-layer tests: append/overwrite round-trips, dynamic partition
overwrite touching only the batch's partitions, dead-letter split,
observe-based audit metrics."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_job_spark import sinks


def _staging(spark, sf_dir, lo, hi):
    from etl_job_spark.plans.kicc import kicc_sales_data

    df = kicc_sales_data(spark, sf_dir)
    return df.filter(F.col("sale_date").between(lo, hi))


def test_append_then_overwrite_roundtrip(spark, sf_dir, tmp_path):
    path = str(tmp_path / "t")
    df = _staging(spark, sf_dir, "19950102", "19950131")
    sinks.append(df, path)
    sinks.append(df, path)
    assert spark.read.parquet(path).count() == 2 * df.count()
    sinks.overwrite(df, path)
    assert spark.read.parquet(path).count() == df.count()


def test_overwrite_partitions_touches_only_batch_partitions(spark, sf_dir, tmp_path):
    path = str(tmp_path / "mart")
    full = _staging(spark, sf_dir, "19950102", "19950228")
    sinks.overwrite(full, path, partition_by=["sale_date"])
    before = spark.read.parquet(path)
    n_before = before.count()

    # rewrite two days with doubled amounts; all other partitions must
    # be byte-identical (not rewritten, not dropped)
    patch = _staging(spark, sf_dir, "19950110", "19950111").withColumn(
        "total_amt", F.col("total_amt") * 2
    )
    sinks.overwrite_partitions(patch, path, partition_by=["sale_date"])

    after = spark.read.parquet(path)
    assert after.count() == n_before
    changed = after.filter(F.col("sale_date").isin("19950110", "19950111"))
    orig = full.filter(F.col("sale_date").isin("19950110", "19950111"))
    assert (
        changed.agg(F.sum(F.round(F.col("total_amt") * 100))).first()[0]
        == 2 * orig.agg(F.sum(F.round(F.col("total_amt") * 100))).first()[0]
    )
    untouched = after.filter(~F.col("sale_date").isin("19950110", "19950111"))
    assert untouched.count() == full.filter(
        ~F.col("sale_date").isin("19950110", "19950111")
    ).count()


def test_compact_reduces_files_preserves_data(spark, sf_dir, tmp_path):
    import glob

    path = str(tmp_path / "frag")
    df = _staging(spark, sf_dir, "19950102", "19950228")
    # fragment: many tiny files (as incremental merges would leave)
    df.repartition(24).write.parquet(path)
    before_files = len(glob.glob(path + "/part-*"))
    n_before = spark.read.parquet(path).count()
    checksum = spark.read.parquet(path).agg(
        F.sum(F.round(F.col("total_amt") * 100))
    ).first()[0]

    written = sinks.compact(spark, path, target_rows_per_file=1_000_000)
    after_files = len(glob.glob(path + "/part-*"))
    assert written == 1 and after_files == 1 < before_files
    after = spark.read.parquet(path)
    assert after.count() == n_before
    assert after.agg(F.sum(F.round(F.col("total_amt") * 100))).first()[0] == checksum


def test_split_quarantine(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "boom"), (3, None)], "id int, error string"
    )
    good, bad = sinks.split_quarantine(df)
    assert [r.id for r in good.orderBy("id").collect()] == [1, 3]
    assert "error" not in good.columns
    assert [r.id for r in bad.collect()] == [2]
    assert bad.first().error == "boom"


def test_with_audit_metrics(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "id int, name string"
    )
    observed, obs = sinks.with_audit(df)
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["n_rows"] == 3
    assert got["n_null_name"] == 1
    assert got["n_null_id"] == 0
