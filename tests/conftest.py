import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from hadoop_based_distributed_batch_processing_system_spark.session import get_spark

    spark = get_spark(app_name="hbdbps-tests", master="local[8]", shuffle_partitions=8)
    yield spark
    spark.stop()
