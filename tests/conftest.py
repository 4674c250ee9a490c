from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TESTS = os.path.join(_REPO, "tests")
# executor python workers must be able to import the repo package and
# the test modules whose closures ship to them (mapInPandas transports)
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in [_REPO, _TESTS, os.environ.get("PYTHONPATH", "")] if p
)


@pytest.fixture(scope="session")
def spark():
    from etl_job_spark.session import get_spark

    spark = get_spark("etl-job-spark-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
