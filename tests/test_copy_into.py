"""COPY INTO — idempotent bulk file ingest (Delta's verb; the
exactly-once version of the reference's staging load,
load_sales_data.py). The loaded-files ledger rides the manifest and
lands in the SAME commit as the data, so any crash point leaves the
re-run safe; already-loaded files that changed in place refuse loudly.
"""

from __future__ import annotations

import os
import time

import pytest

from etl_job_spark.sql import execute_dml, statement_table
from etl_job_spark.table import ManifestTable


def _land(spark, path, rows):
    spark.createDataFrame(rows, "k int, v int").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_load_then_idempotent_rerun(spark, tmp_path):
    land = str(tmp_path / "landing")
    _land(spark, land + "/b1", [(1, 10), (2, 20)])
    t = ManifestTable(str(tmp_path / "t"))
    v1 = t.copy_into(spark, land)
    assert sorted((r.k, r.v) for r in t.snapshot(spark).collect()) == [
        (1, 10), (2, 20),
    ]
    # unchanged directory: metadata no-op, same version
    assert t.copy_into(spark, land) == v1
    # a new producer drop loads exactly the new file
    _land(spark, land + "/b2", [(3, 30)])
    v3 = t.copy_into(spark, land)
    assert v3 == v1 + 1
    assert sorted(r.k for r in t.snapshot(spark).collect()) == [1, 2, 3]


def test_ledger_survives_unrelated_commits(spark, tmp_path):
    land = str(tmp_path / "landing")
    _land(spark, land + "/b1", [(1, 10)])
    t = ManifestTable(str(tmp_path / "t"))
    v1 = t.copy_into(spark, land)
    # unrelated writes must carry the ledger forward (like the
    # streaming-txn ledger) — else the rerun would double-load b1
    t.append(spark.createDataFrame([(9, 90)], "k int, v int"))
    assert t.copy_into(spark, land) == v1 + 1  # the append's version
    assert sorted(r.k for r in t.snapshot(spark).collect()) == [1, 9]


def test_changed_file_refuses_force_reloads(spark, tmp_path):
    land = str(tmp_path / "landing")
    _land(spark, land + "/b1", [(1, 10)])
    t = ManifestTable(str(tmp_path / "t"))
    t.copy_into(spark, land)
    f1 = next(
        os.path.join(r, f)
        for r, _, fs in os.walk(land)
        for f in fs
        if f.endswith(".parquet")
    )
    time.sleep(1.1)  # mtime granularity
    os.utime(f1)
    with pytest.raises(ValueError, match="changed in place"):
        t.copy_into(spark, land)
    # FORCE reloads every matched file — duplicates by design
    t.copy_into(spark, land, force=True)
    assert sorted(r.k for r in t.snapshot(spark).collect()) == [1, 1]


def test_csv_enforces_committed_schema(spark, tmp_path):
    land = str(tmp_path / "csvland")
    os.makedirs(land)
    with open(os.path.join(land, "x.csv"), "w") as fh:
        fh.write("4,40\n5,50\n")
    t = ManifestTable(str(tmp_path / "t"))
    with pytest.raises(ValueError, match="committed schema"):
        t.copy_into(spark, land, file_format="csv")
    t.overwrite(spark.createDataFrame([(1, 10)], "k int, v int"))
    t.copy_into(spark, land, file_format="csv")
    assert sorted((r.k, r.v) for r in t.snapshot(spark).collect()) == [
        (1, 10), (4, 40), (5, 50),
    ]


def test_guarded_and_partitioned_copy(spark, tmp_path):
    land = str(tmp_path / "landing")
    _land(spark, land + "/b1", [(1, 10), (2, -5)])
    t = ManifestTable(str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame([(0, 1)], "k int, v int"),
        partition_by=["k"], bloom_cols=["v"],
    )
    t.alter_constraints(spark, add={"v_pos": "v > 0"})
    # the copy runs through the same guarded write path as append —
    # a violating landed file aborts with no visible version
    with pytest.raises(Exception, match="v_pos"):
        t.copy_into(spark, land)
    assert sorted(r.k for r in t.snapshot(spark).collect()) == [0]
    _land(spark, str(tmp_path / "ok") + "/b1", [(3, 30)])
    t.copy_into(spark, str(tmp_path / "ok"))
    man = t._read_manifest(t.latest_version())
    assert any("k=3" in e["path"] for e in man["files"])


def test_copy_into_inside_sql_transaction(spark, tmp_path):
    """COPY INTO chains inside execute_dml_txn: the load and a
    follow-up statement land as ONE record (data + ledger staged, not
    published, until the commit point)."""
    from etl_job_spark.sql import execute_dml_txn
    from etl_job_spark.txn import TransactionalCatalog

    land = str(tmp_path / "landing")
    _land(spark, land + "/b1", [(5, 50)])
    cat = TransactionalCatalog(str(tmp_path / "cat"))
    cat.commit(
        lambda txn: txn.overwrite(
            "dev", spark.createDataFrame([(1, 10)], "k int, v int")
        )
    )
    state = execute_dml_txn(spark, cat, [
        f"COPY INTO dev FROM '{land}' FILEFORMAT = PARQUET",
        "UPDATE dev SET v = 0 WHERE k = 5",
    ])
    rows = sorted(
        tuple(r)
        for r in cat.table("dev").snapshot(spark, state["dev"]).collect()
    )
    assert rows == [(1, 10), (5, 0)]


def test_sql_copy_into(spark, tmp_path):
    land = str(tmp_path / "landing")
    _land(spark, land + "/b1", [(1, 10)])
    t = ManifestTable(str(tmp_path / "tbl"))
    execute_dml(
        spark, t,
        f"COPY INTO tbl FROM '{land}' FILEFORMAT = PARQUET "
        "PATTERN = '*.parquet'",
    )
    assert [r.k for r in t.snapshot(spark).collect()] == [1]
    # FORCE suffix parses and reloads
    execute_dml(
        spark, t, f"COPY INTO tbl FROM '{land}' FILEFORMAT = PARQUET FORCE"
    )
    assert sorted(r.k for r in t.snapshot(spark).collect()) == [1, 1]
    assert statement_table(
        "COPY INTO mart FROM '/x' FILEFORMAT = PARQUET"
    ) == "mart"
