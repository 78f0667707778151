import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_map_reduce_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="gmrs-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_ORACLE


@pytest.fixture(autouse=True)
def _release_tracked_caches():
    """Caller-owned persist lifecycle (registry.track_cache): tests are
    the caller, so free each test's tracked frames after it runs."""
    yield
    from go_map_reduce_spark.registry import release_caches

    release_caches()
