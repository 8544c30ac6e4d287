import pytest

from workstealing_spatial_join_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("wssj-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
