"""SURVEY §2.7 free-addition: approximate distinct counting.

No SQL oracle (HLL sketches differ across engines), so the property is
pinned here instead: approx_count_distinct must land within its
configured relative standard deviation of the exact count, and must be
deterministic for a given input (Spark's HLL++ is seed-free).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata absent")
def test_approx_count_distinct_within_rsd(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exact = ev.select(F.countDistinct("user_id")).collect()[0][0]
    rsd = 0.02
    approx = ev.select(
        F.approx_count_distinct("user_id", rsd=rsd)
    ).collect()[0][0]
    assert abs(approx - exact) <= max(1, 4 * rsd * exact)
    # deterministic: same input -> same sketch -> same estimate
    again = ev.select(
        F.approx_count_distinct("user_id", rsd=rsd)
    ).collect()[0][0]
    assert again == approx
