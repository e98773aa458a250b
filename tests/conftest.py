import os

import pytest


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from datasketches_java_spark.session import get_spark

    s = get_spark(app="tests", cores=8, shuffle_partitions=16)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def smoke_sf_dir():
    return "/root/testdata/sf0.001"
