import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import rasgoql_spark as rql

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = rql.default_spark(app_name="rasgoql_spark_tests", shuffle_partitions=4,
                              master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def session(spark):
    return rql.RasgoSession(spark, data_dir=SF_DIR)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-scale sweeps / renderer replays excluded from the "
        "default gate run (see tests/slow_tests.txt)",
    )


def _slow_entries():
    path = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    exact, prefixes = set(), []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if line.endswith("*"):
                prefixes.append(line[:-1])
            else:
                exact.add(line)
    return exact, prefixes


def pytest_collection_modifyitems(config, items):
    exact, prefixes = _slow_entries()
    slow = pytest.mark.slow
    for item in items:
        nid = item.nodeid
        if nid in exact or any(nid.startswith(p) for p in prefixes):
            item.add_marker(slow)
