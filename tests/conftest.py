import pytest


@pytest.fixture(scope="session")
def spark():
    from pandora_apache_avro_idl_to_apache_parquet_spark.session import get_spark

    sp = get_spark(app="pytest", master="local[8]", shuffle_partitions=8)
    sp.sparkContext.setLogLevel("ERROR")
    yield sp
