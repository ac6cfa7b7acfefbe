from __future__ import annotations

import pytest

from serverless_mapreduce_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
