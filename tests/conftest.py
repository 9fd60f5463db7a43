import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyperustats_spark.session import get_spark
from pyperustats_spark.sources.registry import load_tables
from pyperustats_spark.streaming.protobuf_compat import enable_protobuf

# Must run BEFORE the first SparkSession launches its JVM: Python
# workers inherit PYTHONPATH / the protobuf version-check opt-out from
# the JVM's environment, which inherits this process's. Makes the TWS
# state-server worker runnable off the on-disk vendored protobuf (see
# streaming/protobuf_compat.py); a no-op where protobuf is healthy.
PROTOBUF_MODE = enable_protobuf()

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pyperustats-tests", master="local[4]",
                  shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    return load_tables(spark, SF_DIR)
