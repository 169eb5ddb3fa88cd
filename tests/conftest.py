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
