import pytest

from ducklake_kafka_connect_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="ducklake-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
