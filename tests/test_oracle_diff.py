"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 — the same gate the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from etl_job_spark.plans.registry import ORACLE, QUERIES
from tests.oracle import assert_matches, run_oracle


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, sf_dir, name):
    spark_df = QUERIES[name](spark, sf_dir)
    oracle_pdf = run_oracle(ORACLE[name], sf_dir)
    assert_matches(spark_df, oracle_pdf, name)
    assert len(oracle_pdf.columns) > 0


def test_all_queries_have_entries():
    assert set(ORACLE) <= set(QUERIES)
    assert len(QUERIES) >= 10
