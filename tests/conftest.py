import pytest

from ena_database_build_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("ena-spark-tests", master="local[4]", shuffle_partitions=4)
    yield spark
