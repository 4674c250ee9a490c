"""Unified catalog: one logical name, any backend.

The core claim is backend transparency — a pipeline written against
``Catalog.load``/``Catalog.merge`` produces identical results whether
the table lives in a parquet directory, a ManifestTable, or a JDBC
database, with only the catalog spec (a JSON dict) changing.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from etl_job_spark.catalog import Catalog
from etl_job_spark.sources import jdbc
from etl_job_spark.table import ManifestTable

ROWS = [("000001", "19980101", 10.0), ("000002", "19980101", 20.0), ("000001", "19980102", 5.0)]
SCHEMA = "sp_code string, sale_date string, amt double"


def _totals(df):
    out = df.groupBy("sp_code").agg(F.sum("amt").alias("total"))
    return sorted((r.sp_code, float(r.total)) for r in out.collect())


@pytest.fixture(scope="module")
def backends(spark, tmp_path_factory):
    """The same logical table materialized in all three backends."""
    root = tmp_path_factory.mktemp("catalog")
    df = spark.createDataFrame(ROWS, SCHEMA)

    pq_path = str(root / "pq")
    df.write.parquet(pq_path)

    mt_path = str(root / "mt")
    ManifestTable(mt_path).overwrite(df)

    cfg = jdbc.derby_embedded(str(root / "derby" / "db"))
    jdbc.write_table(
        df, cfg, "sales", mode="overwrite",
        column_types="sp_code VARCHAR(16), sale_date VARCHAR(8), amt DOUBLE",
    )
    return {
        "parquet": {"backend": "parquet", "path": pq_path},
        "manifest": {"backend": "manifest", "path": mt_path},
        "jdbc": {"backend": "jdbc", "url": cfg.url, "driver": cfg.driver, "table": "sales"},
    }


def test_same_pipeline_any_backend(spark, backends):
    """One pipeline function, three backends, identical results —
    swapping storage is a catalog edit, not a code change."""
    expected = [("000001", 15.0), ("000002", 20.0)]
    for backend, spec in backends.items():
        cat = Catalog({"sales": spec})
        assert _totals(cat.load(spark, "sales")) == expected, backend


def test_merge_through_writable_backends(spark, backends):
    delta = spark.createDataFrame(
        [("000001", "19980101", 99.0), ("000003", "19980103", 7.0)], SCHEMA
    )
    for backend in ("manifest", "jdbc"):
        cat = Catalog({"sales": backends[backend]})
        cat.merge(spark, "sales", delta, keys=["sp_code", "sale_date"])
        got = dict()
        for r in cat.load(spark, "sales").collect():
            got[(r.sp_code, r.sale_date)] = float(r.amt)
        assert got[("000001", "19980101")] == 99.0, backend  # updated
        assert got[("000003", "19980103")] == 7.0, backend  # inserted
        assert got[("000002", "19980101")] == 20.0, backend  # untouched


def test_read_only_backends_reject_merge(spark, backends):
    cat = Catalog({"sales": backends["parquet"]})
    with pytest.raises(ValueError, match="read-only"):
        cat.merge(spark, "sales", cat.load(spark, "sales"), keys=["sp_code"])


def test_driver_backend_and_validation(spark, sf_dir):
    cat = Catalog({"nation": {"backend": "driver", "sf_dir": sf_dir, "table": "nation"}})
    assert cat.load(spark, "nation").count() == 25
    with pytest.raises(ValueError, match="unknown backend"):
        Catalog({"x": {"backend": "wat"}})
    with pytest.raises(ValueError, match="missing spec keys"):
        Catalog({"x": {"backend": "parquet"}})
    with pytest.raises(KeyError, match="unknown table"):
        cat.load(spark, "nope")


def test_catalog_cli_from_json_file(capsys, spark, backends, tmp_path):
    from etl_job_spark.__main__ import main

    cat_file = str(tmp_path / "cat.json")
    with open(cat_file, "w") as f:
        json.dump({"sales": backends["manifest"]}, f)

    assert main(["catalog", "names", "--catalog", cat_file]) == 0
    assert json.loads(capsys.readouterr().out) == ["sales"]

    assert main(["catalog", "show", "--catalog", cat_file, "--name", "sales"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["backend"] == "manifest" and len(out["rows"]) >= 3


def test_jdbc_overwrite_reading_itself_does_not_lose_data(spark, backends):
    """ADVICE r3: a truncate-overwrite whose source plan scans the SAME
    JDBC table must not truncate before the scan runs (lazy evaluation
    would read back an empty table — silent data loss). The catalog
    pins self-referencing frames executor-side before the truncate."""
    cat = Catalog({"sales": backends["jdbc"]})
    before = {
        (r.sp_code, r.sale_date): float(r.amt) for r in cat.load(spark, "sales").collect()
    }
    assert before
    # read-transform-overwrite of the same JDBC table — the
    # build_mart_store_catalog enrichment shape
    enriched = cat.load(spark, "sales").withColumn("amt", F.col("amt") + 1.0)
    cat.overwrite(spark, "sales", enriched)
    after = {
        (r.sp_code, r.sale_date): float(r.amt) for r in cat.load(spark, "sales").collect()
    }
    assert after == {k: v + 1.0 for k, v in before.items()}


def test_load_where_same_rows_every_backend(spark, backends):
    """Catalog.load(where=...) must return exactly the rows a plain
    load + filter returns, on every backend (manifest plans it as
    read-path file pruning, the others as a pushed-down filter) —
    compared against each backend's CURRENT content, since earlier
    tests legitimately merge into the shared fixture tables."""
    from etl_job_spark.table import predicate_column

    preds = [("sp_code", "=", "000001"), ("sale_date", ">=", "19980102")]
    for backend, spec in backends.items():
        cat = Catalog({"sales": spec})
        got = sorted(map(tuple, cat.load(spark, "sales", where=preds).collect()))
        exp = sorted(
            map(
                tuple,
                cat.load(spark, "sales").filter(predicate_column(preds)).collect(),
            )
        )
        assert got == exp and got, (backend, got, exp)
