import pytest
from pyspark.sql import SparkSession

from covid19_spark.streaming.tws_delta import ensure_protobuf_env

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # must precede JVM launch so Python workers inherit the protobuf bridge
    ensure_protobuf_env()
    s = (
        SparkSession.builder.master("local[4]")
        .appName("covid19_spark_tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
