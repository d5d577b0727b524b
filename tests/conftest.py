import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from inclusionreferenceskg_spark.session import get_spark

    # 6g: ~350 tests share this session and many persist()/cache();
    # under 4g + co-tenant load the storage pressure produced a rare
    # one-off py4j failure in full-suite runs (graph_sssp oracle row)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "6g")
    session = get_spark("irkg-tests", master="local[4]", shuffle_partitions=8)
    yield session
    session.stop()


@pytest.fixture(scope="session")
def sf_dir():
    d = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(d):
        pytest.skip(f"testdata dir {d} not available")
    return d
