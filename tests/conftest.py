import os

import pytest
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
SF_DIR_ORACLE = "/root/testdata/sf0.01"


def build_spark(app: str = "kolang-spark-tests", shuffle_partitions: int = 8) -> SparkSession:
    return (
        SparkSession.builder.master("local[4]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


@pytest.fixture(scope="session")
def spark():
    s = build_spark()
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
