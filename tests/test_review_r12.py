"""Round-12 in-round review closures — each test pins one finding from
the adversarial pass over the round's diff:

1. column DEFAULTs follow their column's lifecycle (drop prunes,
   rename re-keys, overwrite keeps only surviving columns) — a
   dangling default used to crash every later append;
2. SELECT/time travel through execute_sql carries the resolved
   table's CommitStore (an in-memory catalog was unreadable);
3. CONVERT adopts directories whose paths carry glob metacharacters
   (the reader escape copy_into already had);
4. the SELECT rewriter never clobbers user temp views, keeps CTE
   shadowing, distinguishes sanitize-colliding table names, and keeps
   qualified column references resolvable via a back-alias;
5. user TBLPROPERTIES cannot shadow internal metadata keys;
6. one literal grammar serves DEFAULT and the spec-predicate parser.
"""

from __future__ import annotations

import pytest

from etl_job_spark.commit_store import InMemoryCommitStore
from etl_job_spark.sql import execute_dml, execute_sql
from etl_job_spark.table import ManifestTable
from etl_job_spark.txn import TransactionalCatalog


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# 1 ------------------------------------------------------------------


def test_default_lifecycle_follows_column(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame([(1, "a", 1.0)], "k int, s string, x double")
    )
    execute_dml(spark, t, "ALTER TABLE t ALTER COLUMN x SET DEFAULT 9.5")
    execute_dml(spark, t, "ALTER TABLE t ALTER COLUMN s SET DEFAULT 'd'")
    # drop prunes the dropped column's default; appends keep working
    t.alter_schema(spark, drop=["x"])
    assert "x" not in (t._read_manifest(t.latest_version()).get("defaults") or {})
    t.append(spark.createDataFrame([(2,)], "k int"))
    assert {r.s for r in t.snapshot(spark).filter("k = 2").collect()} == {"d"}
    # rename re-keys
    t.rename_column("s", "label")
    d = t._read_manifest(t.latest_version())["defaults"]
    assert d == {"label": "d"}
    t.append(spark.createDataFrame([(3,)], "k int"))
    assert t.snapshot(spark).filter("k = 3").first().label == "d"
    # overwrite keeps only surviving columns' defaults
    t.overwrite(spark.createDataFrame([(9, "z")], "k int, label string"))
    assert t._read_manifest(t.latest_version()).get("defaults") == {"label": "d"}
    t.overwrite(spark.createDataFrame([(9,)], "k int"))
    assert not t._read_manifest(t.latest_version()).get("defaults")
    t.append(spark.createDataFrame([(10,)], "k int"))  # no dangling crash


# 2 ------------------------------------------------------------------


def test_execute_sql_select_through_in_memory_store(spark, tmp_path):
    store = InMemoryCommitStore()
    cat = TransactionalCatalog(str(tmp_path), store=store)
    cat.commit(
        lambda txn: txn.overwrite(
            "m", spark.createDataFrame([(1, 10.0)], "k int, v double")
        )
    )
    cat.commit(
        lambda txn: txn.sql("m", spark, "UPDATE m SET v = 20.0 WHERE k = 1")
    )
    assert _rows(execute_sql(spark, cat, "SELECT k, v FROM m")) == [(1, 20.0)]
    assert _rows(
        execute_sql(spark, cat, "SELECT v FROM m VERSION AS OF 1")
    ) == [(10.0,)]


# 3 ------------------------------------------------------------------


def test_convert_directory_with_glob_metacharacters(spark, tmp_path):
    src = tmp_path / "drop[2026]"
    spark.createDataFrame(
        [("a", 1), ("b", 2)], "p string, k int"
    ).write.partitionBy("p").parquet(str(src))
    t = ManifestTable.convert(spark, str(src))
    assert _rows(t.snapshot(spark).select("k", "p")) == [(1, "a"), (2, "b")]
    assert _rows(t.snapshot_where(spark, [("p", "=", "b")]).select("k")) == [(2,)]


# 4 ------------------------------------------------------------------


def test_select_preserves_user_views_and_scoping(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "sales"))
    t.overwrite(spark.createDataFrame([(1, 100.0)], "k int, amt double"))
    # a user temp view named like the table survives a routed SELECT
    spark.createDataFrame([(999, 1.0)], "k int, amt double").createOrReplaceTempView(
        "sales"
    )
    got = execute_dml(spark, t, "SELECT k FROM sales").collect()
    assert [r.k for r in got] == [1]  # the TABLE resolved, not the view
    assert [r.k for r in spark.table("sales").collect()] == [999]  # view intact
    # qualified references resolve through the back-alias
    assert execute_dml(
        spark, t, "SELECT sales.amt FROM sales WHERE sales.k = 1"
    ).first().amt == 100.0
    # explicit aliases carry
    assert execute_dml(
        spark, t, "SELECT s.amt FROM sales s WHERE s.k = 1"
    ).first().amt == 100.0
    # a CTE sharing the name shadows the table, per SQL scoping
    n = execute_dml(
        spark,
        t,
        "WITH sales AS (SELECT 7 AS k) SELECT k FROM sales",
    ).first().k
    assert n == 7
    spark.catalog.dropTempView("sales")


def test_select_sanitize_collision_stays_distinct(spark, tmp_path):
    # two path-named tables whose basenames sanitize to one identifier
    t1 = ManifestTable(str(tmp_path / "a-b"))
    t1.overwrite(spark.createDataFrame([(1,)], "x int"))
    t2 = ManifestTable(str(tmp_path / "a_b"))
    t2.overwrite(spark.createDataFrame([(2,)], "x int"))
    assert execute_dml(spark, t1, "SELECT x FROM `a-b`").first().x == 1
    assert execute_dml(spark, t2, "SELECT x FROM a_b").first().x == 2
    # and again in reverse order: no stale-view bleed between them
    assert execute_dml(spark, t1, "SELECT x FROM `a-b`").first().x == 1


# 5 ------------------------------------------------------------------


def test_reserved_tblproperties_keys_refuse(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([(1,)], "k int"))
    with pytest.raises(ValueError, match="reserved"):
        execute_dml(
            spark, t, "ALTER TABLE t SET TBLPROPERTIES ('partition_by' = 'x')"
        )
    with pytest.raises(ValueError, match="reserved"):
        t.alter_tblproperties(unset=["constraints"], unset_must_exist=False)
    # the suggested namespaced spelling works
    execute_dml(
        spark, t, "ALTER TABLE t SET TBLPROPERTIES ('user.partition_by' = 'x')"
    )
    assert t.tblproperties() == {"user.partition_by": "x"}


# 6 ------------------------------------------------------------------


def test_shared_literal_grammar(spark, tmp_path):
    from etl_job_spark.sql import _parse_spec_predicate, _sql_literal

    assert _sql_literal("'it''s'") == "it's"
    assert _sql_literal('"x"') == "x"
    assert _sql_literal("NULL") is None
    with pytest.raises(ValueError, match="IS \\[NOT\\] NULL"):
        _parse_spec_predicate("k = NULL")
    assert _parse_spec_predicate("k = 'a''b'") == [("k", "=", "a'b")]


# protocol versioning (round 12, late) ---------------------------------


def test_manifest_protocol_refusals(spark, tmp_path):
    """Commits stamp the minimum reader/writer protocol; an engine
    refuses manifests whose features it predates instead of misreading
    them (Delta's minReaderVersion/minWriterVersion shape)."""
    import json
    import os

    from etl_job_spark.table import _MANIFEST_DIR, _manifest_name

    t = ManifestTable(str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([(1,)], "k int"))
    man = t._read_raw_manifest(1)
    assert man["protocol"] == {"reader": 1, "writer": 1}
    # a future-reader manifest refuses on read
    fut = dict(man)
    fut["version"] = 2
    fut["base_version"] = 1
    fut["protocol"] = {"reader": 99, "writer": 99}
    with open(os.path.join(t.manifest_dir, _manifest_name(2)), "w") as f:
        json.dump(fut, f)
    t2 = ManifestTable(t.path)
    with pytest.raises(RuntimeError, match="reader\n?.*protocol 99"):
        t2.snapshot(spark)
    # a future-WRITER table still reads at old reader protocol, but
    # refuses writes from this engine
    fut["protocol"] = {"reader": 1, "writer": 99}
    with open(os.path.join(t.manifest_dir, _manifest_name(2)), "w") as f:
        json.dump(fut, f)
    t3 = ManifestTable(t.path)
    assert t3.snapshot(spark).count() == 1  # readable
    with pytest.raises(RuntimeError, match="writer protocol"):
        t3.append(spark.createDataFrame([(2,)], "k int"))
    # pre-protocol manifests (no stamp) default to (1,1) and work
    legacy = {k: v for k, v in man.items() if k != "protocol"}
    with open(os.path.join(t.manifest_dir, _manifest_name(2)), "w") as f:
        json.dump({**legacy, "version": 2, "base_version": 1}, f)
    t4 = ManifestTable(t.path)
    assert t4.snapshot(spark).count() == 1
    t4.append(spark.createDataFrame([(2,)], "k int"))
    assert t4.snapshot(spark).count() == 2


# DROP TABLE + SHOW TABLES (round 12, late) -----------------------------


def test_drop_table_and_show_tables(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "victim"))
    t.overwrite(spark.createDataFrame([(1,)], "k int"))
    assert execute_dml(spark, t, "DROP TABLE victim") == 0
    import os

    assert not os.path.exists(t.path)
    # IF EXISTS no-ops on a missing table; plain DROP refuses
    t2 = ManifestTable(str(tmp_path / "victim"))
    assert execute_dml(spark, t2, "DROP TABLE IF EXISTS victim") == 0
    with pytest.raises(FileNotFoundError):
        execute_dml(spark, t2, "DROP TABLE victim")
    # the guard refuses rmtree of a non-table directory
    (tmp_path / "not_a_table").mkdir()
    (tmp_path / "not_a_table" / "precious.txt").write_text("keep me")
    t3 = ManifestTable(str(tmp_path / "not_a_table"))
    with pytest.raises(FileNotFoundError, match="refusing"):
        t3.drop()
    assert (tmp_path / "not_a_table" / "precious.txt").exists()


def test_catalog_show_tables_and_drop_guard(spark, tmp_path):
    from etl_job_spark.sql import execute_sql_script

    root = tmp_path / "cat"
    root.mkdir()
    cat = TransactionalCatalog(str(root))
    cat.commit(
        lambda txn: txn.overwrite("m", spark.createDataFrame([(1,)], "k int"))
    )
    # a table created OUTSIDE the log (CONVERT-style pre-life)
    free = ManifestTable(str(root / "freestanding"))
    free.overwrite(spark.createDataFrame([(2,)], "k int"))
    shown = {r.table_name: r.version for r in execute_sql(spark, cat, "SHOW TABLES").collect()}
    assert shown == {"m": 1, "freestanding": 1}
    # log-enrolled tables refuse DROP; pre-life tables drop fine
    with pytest.raises(ValueError, match="transaction log references"):
        execute_sql(spark, cat, "DROP TABLE m")
    out = execute_sql(spark, cat, "DROP TABLE freestanding")
    assert out == {"freestanding": 0}
    shown = {r.table_name for r in execute_sql(spark, cat, "SHOW TABLES").collect()}
    assert shown == {"m"}
    # script routing: SHOW TABLES is read-only, DROP refuses in-bracket
    seen = []
    execute_sql_script(
        spark, cat, "SHOW TABLES",
        select_handler=lambda st, df: seen.append(df.count()),
    )
    assert seen == [1]
    with pytest.raises(ValueError, match="inside BEGIN"):
        execute_sql_script(spark, cat, "BEGIN; DROP TABLE x; COMMIT")
