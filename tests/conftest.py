from __future__ import annotations

import pytest

from slurm2sql_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="slurm2sql_spark_tests",
        shuffle_partitions=8,
        # The reference pins TZ=Europe/Helsinki for its local-time
        # timestamp tests (reference test.py:23-24); we pin the session
        # zone instead of the process zone.
        tz="Europe/Helsinki",
    )
    yield spark


def one_value(spark, expr_builder, value: str | None):
    """Evaluate a single converter expression against one string value."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(value,)], "x string")
    return df.select(expr_builder(F.col("x")).alias("out")).collect()[0]["out"]
