import os

import pytest

from implementing_scds_in_hive_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # 8 local threads by default: r14 measured 32-thread CPU-bound
    # phases collapsing into scheduling thrash when the oversubscribed
    # host grants fewer real CPUs (BENCH_r14_c8 beat the 32-core run on
    # every query). Override with SCD_TEST_CPUS to experiment.
    spark = get_spark("scd-tests", cpus=int(os.environ.get("SCD_TEST_CPUS", "8")))
    yield spark
    spark.stop()


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
