import pytest


@pytest.fixture(scope="session")
def spark():
    from gocrd_spark.session import get_spark

    session = get_spark(master="local[4]", app_name="gocrd-tests", shuffle_partitions=8)
    yield session
    session.stop()
