"""CONVERT TO MANIFEST — in-place adoption of pre-existing parquet
(VERDICT r11 next-round #2): version 1 from a directory listing, files
carried by reference with footer stats, hive dirs becoming the raw
partition spec; zero data rewrite. Library, SQL, and CLI routes;
ambiguous layouts refuse loudly.
"""

from __future__ import annotations

import json

import pytest

from etl_job_spark.sql import execute_dml
from etl_job_spark.table import ManifestTable


def _rows(df, *cols):
    return sorted(tuple(r) for r in (df.select(*cols) if cols else df).collect())


def _mk_hive(spark, path, parts=("a", "b"), n=3):
    spark.createDataFrame(
        [(p, k, k * 10) for p in parts for k in range(n)],
        "p string, k int, v int",
    ).write.partitionBy("p").parquet(str(path))


def test_convert_reads_equal_raw_parquet(spark, tmp_path):
    src = tmp_path / "existing"
    _mk_hive(spark, src)
    t = ManifestTable.convert(spark, str(src))
    assert t.latest_version() == 1
    got = _rows(t.snapshot(spark), "k", "v", "p")
    raw = _rows(spark.read.parquet(str(src)).selectExpr("k", "v", "cast(p as string) p"))
    assert got == raw
    man = t._read_manifest(1)
    assert man["partition_by"] == ["p"]
    assert man["operation"]["op"] == "convert"
    # zero rewrite: every entry references the adopted file in place
    assert all(e["base"] == str(src) for e in man["files"])
    assert all(e["stats"] for e in man["files"])


def test_convert_pruning_works_immediately(spark, tmp_path):
    src = tmp_path / "existing"
    _mk_hive(spark, src, parts=("a", "b", "c"))
    t = ManifestTable.convert(spark, str(src))
    snap = t.snapshot_where(spark, [("p", "=", "a"), ("k", ">=", 1)])
    assert _rows(snap, "k", "p") == [(1, "a"), (2, "a")]
    # partition prune: only partition a's files survived planning
    assert t.last_planning["kept"] < t.last_planning["candidates"]


def test_convert_unpartitioned_and_writes_compose(spark, tmp_path):
    src = tmp_path / "flat"
    spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string").coalesce(
        1
    ).write.parquet(str(src))
    t = ManifestTable.convert(spark, str(src))
    assert _rows(t.snapshot(spark)) == [(1, "x"), (2, "y")]
    # the adopted table is a full citizen: append, merge, time travel
    t.append(spark.createDataFrame([(3, "z")], "k int, v string"))
    t.merge(spark, spark.createDataFrame([(1, "X")], "k int, v string"), keys=["k"])
    assert _rows(t.snapshot(spark)) == [(1, "X"), (2, "y"), (3, "z")]
    assert _rows(t.snapshot(spark, version=1)) == [(1, "x"), (2, "y")]


def test_convert_refusals(spark, tmp_path):
    src = tmp_path / "existing"
    _mk_hive(spark, src)
    with pytest.raises(ValueError, match="does not match the discovered"):
        ManifestTable.convert(spark, str(src), partition_by=["q"])
    ManifestTable.convert(spark, str(src))
    with pytest.raises(ValueError, match="already has committed"):
        ManifestTable.convert(spark, str(src))
    # mixed layouts refuse
    mixed = tmp_path / "mixed"
    spark.createDataFrame([("a", 1, 1)], "p string, k int, v int").write.partitionBy(
        "p"
    ).parquet(str(mixed))
    spark.createDataFrame([(9, 9)], "k int, v int").coalesce(1).write.mode(
        "append"
    ).parquet(str(mixed))
    with pytest.raises(ValueError, match="mixed partition layouts"):
        ManifestTable.convert(spark, str(mixed))
    with pytest.raises(FileNotFoundError, match="no parquet files"):
        ManifestTable.convert(spark, str(tmp_path / "empty_missing"))


def test_convert_sql_route(spark, tmp_path):
    src = tmp_path / "adopt_me"
    _mk_hive(spark, src)
    t = ManifestTable(str(src))
    v = execute_dml(
        spark, t, f"CONVERT TO MANIFEST {src} PARTITIONED BY (p)"
    )
    assert v == 1
    t2 = ManifestTable(str(src))
    assert t2._read_manifest(1)["partition_by"] == ["p"]
    assert len(_rows(t2.snapshot(spark))) == 6
    # a second CONVERT refuses (already a manifest table)
    with pytest.raises(ValueError, match="already has committed"):
        execute_dml(spark, t2, f"CONVERT TO MANIFEST {src}")


def test_convert_cli_route(spark, tmp_path, capsys):
    from etl_job_spark.__main__ import main

    src = tmp_path / "cli_adopt"
    _mk_hive(spark, src)
    rc = main(["table", "--path", str(src), "convert", "--partitioned-by", "p"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["version"] == 1 and out["partition_by"] == ["p"]


def test_convert_many_files_uses_distributed_stats(spark, tmp_path, monkeypatch):
    """Past the driver threshold, footer stats compute on executors —
    the 100k-file adoption path."""
    import etl_job_spark.table as table_mod

    src = tmp_path / "many"
    spark.range(0, 40).selectExpr(
        "cast(id % 8 as string) p", "cast(id as int) k", "cast(id * 2 as int) v"
    ).repartition(8, "p").write.partitionBy("p").parquet(str(src))
    monkeypatch.setattr(table_mod, "_DRIVER_STATS_MAX_FILES", 2)
    t = ManifestTable.convert(spark, str(src))
    man = t._read_manifest(1)
    assert sum(e["rows"] for e in man["files"]) == 40
    assert all(e["stats"].get("k") for e in man["files"])


def test_convert_through_catalog_and_txn_refusal(spark, tmp_path):
    """CONVERT under a TransactionalCatalog adopts onto the catalog's
    scoped store and becomes the table's pre-log starting state;
    inside BEGIN…COMMIT it refuses (adoption precedes transactional
    life — an in-txn convert would publish out of band)."""
    from etl_job_spark.sql import execute_sql, execute_sql_script
    from etl_job_spark.txn import TransactionalCatalog

    root = tmp_path / "cat"
    root.mkdir()
    _mk_hive(spark, root / "adopted")
    cat = TransactionalCatalog(str(root))
    out = execute_sql(
        spark, cat, f"CONVERT TO MANIFEST {root / 'adopted'} PARTITIONED BY (p)"
    )
    assert out == {"adopted": 1}
    # the adopted table is transactional from here on
    state = cat.commit(
        lambda txn: txn.sql("adopted", spark, "UPDATE adopted SET v = v + 1 WHERE k = 0")
    )
    assert state == {"adopted": 2}
    df = execute_sql(spark, cat, "SELECT v FROM adopted WHERE k = 0 AND p = 'a'")
    assert [r.v for r in df.collect()] == [1]
    # path outside the catalog refuses
    _mk_hive(spark, tmp_path / "elsewhere")
    with pytest.raises(ValueError, match="not the\n?.*catalog"):
        execute_sql(spark, cat, f"CONVERT TO MANIFEST {tmp_path / 'elsewhere'}")
    # inside a bracket refuses
    with pytest.raises(ValueError, match="inside BEGIN"):
        execute_sql_script(
            spark, cat,
            f"BEGIN; CONVERT TO MANIFEST {root / 'adopted'}; COMMIT;",
        )
