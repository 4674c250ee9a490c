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
