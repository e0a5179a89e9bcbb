import os

import pytest

SF_DIR = os.environ.get("QWS_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from quickwit_spark.session import get_spark

    s = get_spark("quickwit_spark_tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
