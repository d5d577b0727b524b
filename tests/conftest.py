import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from inclusionreferenceskg_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "4g")
    session = get_spark("irkg-tests", master="local[4]", shuffle_partitions=8)
    yield session
    session.stop()


@pytest.fixture(scope="session")
def sf_dir():
    d = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(d):
        pytest.skip(f"testdata dir {d} not available")
    return d
