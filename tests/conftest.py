import pytest

from implementing_scds_in_hive_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("scd-tests", cpus=8)
    yield spark
    spark.stop()


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
