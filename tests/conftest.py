import pytest

from hri_flink_pipeline_core_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hri-spark-tests", cpus=8)
    yield s


SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf001():
    return SF001


@pytest.fixture(scope="session")
def sf01():
    return SF01
