from __future__ import annotations

import pytest

from search_ingest_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # pinned JVM error file: a silent JVM death under the full suite
    # then leaves an hs_err report instead of a Connection-refused
    # cascade (faulthandler for Python workers is on in get_spark)
    import os

    os.environ.setdefault(
        "SPARK_SUBMIT_OPTS", "-XX:ErrorFile=/tmp/hs_err_tests_%p.log")
    s = get_spark("tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def documents_smoke(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


@pytest.fixture(scope="session")
def documents_correct(spark):
    return spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
