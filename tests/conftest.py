import pytest


@pytest.fixture(scope="session")
def spark():
    from raster_tools_spark.session import get_spark

    s = get_spark(master="local[8]", app_name="pytest")
    yield s
    s.stop()
