import os

import pytest

from pandarallel_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("pandarallel_spark_tests", cpus=8, driver_memory="8g")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
