import pytest

from ethereum_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="eth-etl-spark-tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture()
def tmp_table(tmp_path):
    return str(tmp_path / "pages_table")
