"""CLI smoke tests — in-process via main(argv) (a subprocess would pay
a fresh JVM per test; the argument wiring is what's under test)."""

from __future__ import annotations

import json

from etl_job_spark.__main__ import main


def test_list_queries(capsys):
    assert main(["list-queries"]) == 0
    names = json.loads(capsys.readouterr().out)
    assert "pricing_summary" in names and len(names) >= 50


def test_unknown_query_is_error(capsys, spark):
    # note: passes through get_spark(); session reuse keeps it fast
    assert main(["query", "--name", "nope"]) == 2


def test_query_and_mart_prod(capsys, spark, sf_dir, tmp_path):
    assert main(["query", "--name", "top_orders", "--sf-dir", sf_dir, "--limit", "3"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["query"] == "top_orders" and out["n_preview"] == 3

    mart = str(tmp_path / "prod")
    assert main(
        ["mart-prod", "--sf-dir", sf_dir, "--out", mart, "--from", "19980101", "--to", "19980131"]
    ) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["rows"] > 0


def test_table_subcommands(capsys, spark, tmp_path):
    from etl_job_spark.table import ManifestTable

    path = str(tmp_path / "tbl")
    t = ManifestTable(path)
    t.overwrite(spark.createDataFrame([("a", 1.0)], "k string, v double"))
    t.merge(spark, spark.createDataFrame([("a", 2.0), ("b", 3.0)], "k string, v double"), keys=["k"])

    assert main(["table", "versions", "--path", path]) == 0
    assert json.loads(capsys.readouterr().out)["versions"] == [1, 2]

    assert main(["table", "show", "--path", path]) == 0
    rows = json.loads(capsys.readouterr().out)["rows"]
    assert sorted((r["k"], r["v"]) for r in rows) == [("a", 2.0), ("b", 3.0)]

    assert main(["table", "diff", "--path", path]) == 0
    d = json.loads(capsys.readouterr().out)
    changes = sorted((r["k"], r["v"], r["_change"]) for r in d["rows"])
    assert ("b", 3.0, "upsert") in changes

    assert main(["table", "compact", "--path", path]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["version"] == 3  # compact commits a new version
    assert main(["table", "show", "--path", path]) == 0
    rows = json.loads(capsys.readouterr().out)["rows"]
    assert sorted((r["k"], r["v"]) for r in rows) == [("a", 2.0), ("b", 3.0)]

    assert main(["table", "history", "--path", path]) == 0
    hist = json.loads(capsys.readouterr().out)["history"]
    assert [h["version"] for h in hist] == [1, 2, 3]
    assert hist[0]["operation"]["op"] == "overwrite"
    assert hist[1]["operation"]["op"] == "merge"
    assert hist[2]["operation"]["op"] == "compact"
    assert hist[2]["rows"] == 2  # footer row counts survive into the trail

    assert main(["table", "restore", "--path", path, "--version", "1"]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["restored"] == 1 and res["version"] == 4
    assert main(["table", "show", "--path", path]) == 0
    rows = json.loads(capsys.readouterr().out)["rows"]
    assert sorted((r["k"], r["v"]) for r in rows) == [("a", 1.0)]  # pre-merge state

    assert main(["table", "vacuum", "--path", path, "--keep-last", "1"]) == 0
    assert json.loads(capsys.readouterr().out)["deleted_files"] >= 1


def test_table_delete_keys_cli(capsys, spark, tmp_path):
    from etl_job_spark.table import ManifestTable

    path = str(tmp_path / "tbl_dk")
    t = ManifestTable(path)
    t.overwrite(
        spark.createDataFrame([(i, f"p{i}") for i in range(20)], "k long, p string"),
        bloom_cols=["k"],
    )
    assert main(["table", "delete-keys", "--path", path,
                 "--key-col", "k", "--keys", "3, 7"]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["n_keys"] == 2 and res["version"] == 2
    kept = {r["k"] for r in t.snapshot(spark).collect()}
    assert kept == set(range(20)) - {3, 7}
    # missing args is a usage error, not a crash
    assert main(["table", "delete-keys", "--path", path]) == 2


def test_table_update_cli(capsys, spark, tmp_path):
    from etl_job_spark.table import ManifestTable

    path = str(tmp_path / "tbl_up")
    t = ManifestTable(path)
    t.overwrite(
        spark.createDataFrame(
            [(i, i % 3, i * 10) for i in range(30)], "k long, g long, v long"
        )
    )
    assert main(["table", "update", "--path", path,
                 "--set", "v=v + 1", "--where", "g = 1"]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["version"] == 2 and res["set"] == ["v"]
    got = {r["k"]: r["v"] for r in t.snapshot(spark).collect()}
    assert all(got[k] == k * 10 + (1 if k % 3 == 1 else 0) for k in range(30))
    # predicate-spec form plans through the pruning path
    assert main(["table", "update", "--path", path,
                 "--set", "v=0", "--predicates", '[["k", "=", 5]]']) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["version"] == 3
    assert {r["v"] for r in t.snapshot(spark).collect() if r["k"] == 5} == {0}
    # usage errors, not crashes
    assert main(["table", "update", "--path", path, "--set", "v=0"]) == 2
    assert main(["table", "update", "--path", path, "--where", "g = 1"]) == 2
    assert main(["table", "update", "--path", path,
                 "--set", "nonsense", "--where", "g = 1"]) == 2


def test_table_constraints_cli(capsys, spark, tmp_path):
    from etl_job_spark.table import ManifestTable

    path = str(tmp_path / "tbl_ct")
    ManifestTable(path).overwrite(
        spark.createDataFrame([(1, 2.0)], "k long, v double")
    )
    assert main(["table", "constraints", "--path", path,
                 "--add", "v_pos=v > 0"]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["added"] == ["v_pos"] and res["version"] == 2
    # listing mode
    assert main(["table", "constraints", "--path", path]) == 0
    assert json.loads(capsys.readouterr().out)["constraints"] == {"v_pos": "v > 0"}
    # malformed spec is a usage error
    assert main(["table", "constraints", "--path", path, "--add", "nonsense"]) == 2


def test_table_delete_keys_cli_resolves_column_type(capsys, spark, tmp_path):
    """--keys tokens parse by the TABLE's column type, not token shape:
    a sniffed int 123 against a string key column would let Spark's
    numeric coercion also match '0123' (and disable all pruning)."""
    from etl_job_spark.table import ManifestTable

    path = str(tmp_path / "tbl_dk_str")
    t = ManifestTable(path)
    t.overwrite(
        spark.createDataFrame([("123", 1), ("0123", 2)], "k string, v long"),
        bloom_cols=["k"],
    )
    assert main(["table", "delete-keys", "--path", path,
                 "--key-col", "k", "--keys", "123"]) == 0
    capsys.readouterr()
    assert {r["k"] for r in t.snapshot(spark).collect()} == {"0123"}
    # unparseable token against an int column: usage error, not a crash
    path2 = str(tmp_path / "tbl_dk_int")
    ManifestTable(path2).overwrite(
        spark.createDataFrame([(1, "a")], "k long, p string")
    )
    assert main(["table", "delete-keys", "--path", path2,
                 "--key-col", "k", "--keys", "xyz"]) == 2
    # unknown key column: usage error
    assert main(["table", "delete-keys", "--path", path2,
                 "--key-col", "nope", "--keys", "1"]) == 2


def test_table_read_and_rows_cli(capsys, spark, tmp_path):
    from etl_job_spark.table import ManifestTable

    path = str(tmp_path / "tbl_read")
    t = ManifestTable(path)
    t.overwrite(
        spark.createDataFrame(
            [("d1", 1, 10.0), ("d1", 2, 20.0), ("d2", 3, 30.0)],
            "dy string, k long, v double",
        ).repartition(2),
        partition_by=["dy"],
    )
    preds = '[["dy","=","d1"],["k",">=",2]]'
    assert main(["table", "read", "--path", path, "--predicates", preds]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["n_preview"] == 1 and res["rows"][0]["k"] == 2
    # rows: metadata-only count
    assert main(["table", "rows", "--path", path]) == 0
    assert json.loads(capsys.readouterr().out)["rows"] == 3
    # malformed predicates: usage error
    assert main(["table", "read", "--path", path, "--predicates", "not json"]) == 2
    assert main(["table", "read", "--path", path]) == 2


def test_table_rename_and_drop_cols_cli(capsys, spark, tmp_path):
    import json

    from etl_job_spark.table import ManifestTable

    path = str(tmp_path / "t")
    t = ManifestTable(path)
    t.overwrite(spark.range(0, 20).selectExpr("id as k", "id * 2 as v", "id % 3 as g"))
    assert main(["table", "rename", "--path", path,
                 "--from-col", "v", "--to-col", "val"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["renamed"] == {"v": "val"}
    assert t.snapshot(spark).columns == ["k", "val", "g"]
    # pruned read speaks the new name through the CLI spec path
    assert main(["table", "read", "--path", path,
                 "--predicates", '[["val", "between", [0, 6]]]']) == 0
    assert main(["table", "drop-cols", "--path", path, "--cols", "g"]) == 0
    assert t.snapshot(spark).columns == ["k", "val"]
    # missing args are loud exits, not tracebacks
    assert main(["table", "rename", "--path", path]) == 2
    assert main(["table", "drop-cols", "--path", path]) == 2
    # the files metadata table prints one JSON row per file
    capsys.readouterr()  # drain earlier actions' output
    assert main(["table", "files", "--path", path, "--limit", "3"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out and all("live_rows" in json.loads(l) for l in out)


def test_table_count_cli(capsys, spark, tmp_path):
    from etl_job_spark.table import ManifestTable

    path = str(tmp_path / "tbl_count")
    t = ManifestTable(path)
    t.overwrite(
        spark.range(0, 200)
        .selectExpr("id as k", "if(id % 4 = 0, null, concat('u', id)) as u")
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k")
    )
    preds = '[["k","between",[50,149]]]'
    assert main(["table", "count", "--path", path, "--predicates", preds]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["count"] == 100
    assert res["plan"]["metadata_files"] >= 1
    # 2-element nullness spec parses through the CLI
    assert main(["table", "count", "--path", path, "--predicates", '[["u","is_null"]]']) == 0
    assert json.loads(capsys.readouterr().out)["count"] == 50
    assert main(["table", "count", "--path", path]) == 2


def test_table_agg_cli(capsys, spark, tmp_path):
    from etl_job_spark.table import ManifestTable

    path = str(tmp_path / "tbl_agg")
    ManifestTable(path).overwrite(
        spark.range(0, 50)
        .selectExpr("id as k", "if(id % 2 = 0, null, id * 10) as m")
        .coalesce(1)
    )
    assert main(["table", "agg", "--path", path, "--cols", "k,m"]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["rows"] == 50
    assert res["columns"]["m"]["non_null"] == 25
    assert res["columns"]["m"]["max"] == 490
    assert res["columns"]["m"]["metadata_only"] is True
    assert main(["table", "agg", "--path", path]) == 2


def test_table_sql_cli(capsys, spark, tmp_path):
    """One DML statement through the CLI: the reference's consumers
    run literal SQL from shell scripts — `table sql --statement`
    is that surface over the engine's table format."""
    from etl_job_spark.table import ManifestTable

    path = str(tmp_path / "tbl_sql")
    t = ManifestTable(path)
    t.overwrite(
        spark.createDataFrame(
            [(i, i % 3, i * 10) for i in range(12)], "k long, g long, v long"
        )
    )
    src = str(tmp_path / "dim.parquet")
    spark.createDataFrame([(1, 111), (4, 444)], "k long, v long").write.parquet(src)

    assert main(["table", "sql", "--path", path, "--statement",
                 "UPDATE tbl_sql SET v = v + 1 WHERE g = 0"]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["version"] == 2
    got = {r["k"]: r["v"] for r in t.snapshot(spark).collect()}
    assert all(got[k] == k * 10 + (1 if k % 3 == 0 else 0) for k in range(12))

    assert main(["table", "sql", "--path", path, "--views", f"dim={src}",
                 "--statement",
                 "MERGE INTO tbl_sql t USING dim s ON t.k = s.k "
                 "WHEN MATCHED THEN UPDATE SET t.v = s.v"]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["version"] == 3
    got = {r["k"]: r["v"] for r in t.snapshot(spark).collect()}
    assert got[1] == 111 and got[4] == 444

    assert main(["table", "sql", "--path", path, "--statement",
                 "INSERT INTO tbl_sql VALUES (100, 9, 1000)"]) == 0
    assert t.snapshot(spark).filter("k = 100").count() == 1

    # usage errors, not crashes
    assert main(["table", "sql", "--path", path]) == 2
    assert main(["table", "sql", "--path", path, "--views", "bad",
                 "--statement", "DELETE FROM tbl_sql WHERE k = 0"]) == 2
