from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_TEST_DIR = os.environ.get("OKSS_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from orders_kafka_streams_spark.session import get_spark

    cpus = int(os.environ.get("OKSS_TEST_CPUS", "8"))
    spark = get_spark("okss-tests", cpus=cpus, shuffle_partitions=cpus)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_TEST_DIR
