"""Converter truth tables, mirroring reference test.py:287-327."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from slurm2sql_spark.functions import converters as C
from slurm2sql_spark.functions.tres import tres_field
from tests.conftest import one_value


def batch(spark, expr_builder, values):
    df = spark.createDataFrame([(v,) for v in values], "x string")
    rows = df.select(
        F.monotonically_increasing_id().alias("i"),
        expr_builder(F.col("x")).alias("out"),
    ).collect()
    return [r["out"] for r in rows]


# Binary units: reference test.py:287-300
BINARY_CASES = [
    ("2", 2.0),
    ("2k", 2048.0),
    ("2K", 2048.0),
    ("2M", 2.0 * 2**20),
    ("2G", 2.0 * 2**30),
    ("2T", 2.0 * 2**40),
    ("2P", 2.0 * 2**50),
    ("2.5K", 2.5 * 1024),
    ("0.00K", 0.0),
    ("", None),
    (None, None),
]

# Metric units: reference test.py:302-315
METRIC_CASES = [
    ("2", 2.0),
    ("2k", 2000.0),
    ("2K", 2000.0),
    ("2M", 2_000_000.0),
    ("2G", 2_000_000_000.0),
    ("2T", 2_000_000_000_000.0),
    ("2P", 2_000_000_000_000_000.0),
    ("2.5k", 2500.0),
    ("", None),
]

# Duration grammar: reference test.py:317-327
SLURMTIME_CASES = [
    ("10", 600.0),                       # bare number = minutes
    ("10:10", 610.0),
    ("3:10:10", 3 * 3600 + 610.0),
    ("3-13", 3 * 86400 + 13 * 3600.0),
    ("3-13:10", 3 * 86400 + 13 * 3600 + 600.0),
    ("3-13:10:10", 3 * 86400 + 13 * 3600 + 610.0),
    ("00:15.057", 15.057),               # fractional seconds
    ("UNLIMITED", None),
    ("Partition_Limit", None),
    ("", None),
    (None, None),
]


def test_float_bytes(spark):
    vals = [v for v, _ in BINARY_CASES]
    got = batch(spark, C.float_bytes, vals)
    for (v, want), g in zip(BINARY_CASES, got):
        assert g == want, f"float_bytes({v!r}) = {g!r}, want {want!r}"


def test_int_bytes(spark):
    # Mantissa truncates BEFORE scaling (reference slurm2sql.py:149-151:
    # int(float('2.5')) * 1024 = 2048) — and bare values truncate too.
    got = batch(spark, C.int_bytes, ["2.5K", "2M", "", "3.9"])
    assert got == [2048, 2 * 2**20, None, 3]


def test_float_metric(spark):
    vals = [v for v, _ in METRIC_CASES]
    got = batch(spark, C.float_metric, vals)
    for (v, want), g in zip(METRIC_CASES, got):
        assert g == want, f"float_metric({v!r}) = {g!r}, want {want!r}"


def test_int_metric(spark):
    # int(float('2.5')) * 1000 = 2000 (reference slurm2sql.py:162-164).
    got = batch(spark, C.int_metric, ["2.5k", "3", "1.54M"])
    assert got == [2000, 3, 1_000_000]


def test_slurmtime(spark):
    vals = [v for v, _ in SLURMTIME_CASES]
    got = batch(spark, C.slurmtime, vals)
    for (v, want), g in zip(SLURMTIME_CASES, got):
        if want is None:
            assert g is None, f"slurmtime({v!r}) = {g!r}, want None"
        else:
            assert g == pytest.approx(want), f"slurmtime({v!r}) = {g!r}, want {want}"


def test_slurmmem(spark):
    got = batch(spark, C.slurmmem, ["2G", "2Gn", "2Gc", "500K", "", "0"])
    assert got == [2.0 * 2**30, 2.0 * 2**30, 2.0 * 2**30, 500.0 * 1024, None, 0.0]


def test_unixtime(spark):
    # Session TZ pinned Europe/Helsinki (conftest): 1970-01-01T03:00:00
    # is +02:00 in winter -> 3600 (reference FIXTURES F3 semantics).
    assert one_value(spark, C.unixtime, "1970-01-01T03:00:00") == 3600
    assert one_value(spark, C.unixtime, "Unknown") is None
    assert one_value(spark, C.unixtime, "None") is None
    assert one_value(spark, C.unixtime, "") is None


def test_null_guards(spark):
    assert one_value(spark, C.nullint, "") is None
    assert one_value(spark, C.nullint, "42") == 42
    assert one_value(spark, C.nullstr, "") is None
    assert one_value(spark, C.nullstr, "x") == "x"
    assert one_value(spark, C.nullstr_strip, "  x ") == "x"
    assert one_value(spark, C.str_unknown, "Unknown") is None
    assert one_value(spark, C.str_unknown, "ok") == "ok"


def test_tres_field(spark):
    tres = "cpu=2,mem=10G,gres/gpu=1,gres/gpuutil=23,billing=3"
    df = spark.createDataFrame([(tres,)], "t string")
    row = df.select(
        tres_field("t", "cpu", C.int_metric).alias("cpu"),
        tres_field("t", "mem", C.float_bytes).alias("mem"),
        tres_field("t", "gres/gpu", C.float_metric).alias("gpu"),
        tres_field(
            "t", "gres/gpuutil", C.float_metric, wrap=lambda c: c / 100.0
        ).alias("gpuutil"),
        tres_field("t", "billing", C.int_metric).alias("billing"),
        tres_field("t", "fs/disk", C.float_bytes).alias("absent"),
    ).collect()[0]
    assert row["cpu"] == 2
    assert row["mem"] == 10.0 * 2**30
    assert row["gpu"] == 1.0
    assert row["gpuutil"] == pytest.approx(0.23)
    assert row["billing"] == 3
    assert row["absent"] is None


def test_slurm_timestamp_rewind(spark):
    # epoch 3600+5 rewound 5s -> 3600 -> 03:00 Helsinki winter (+02).
    df = spark.createDataFrame([(3605,)], "x long")
    got = df.select(C.slurm_timestamp("x").alias("o")).collect()[0]["o"]
    assert got == "1970-01-01T03:00:00"


def test_gpu_comment_parse(spark):
    from pyspark.sql import functions as F

    from slurm2sql_spark.functions.gpucomment import with_gpu_comment_columns

    rows = [
        (1, '{"gpu_mem_max": 12345, "ncpu": 2, "ngpu": 1, "gpu_util": 53.1}'),
        (2, ""),
        (3, "No GPU stats collected"),
        (4, "abort"),
        (5, "free text comment"),
        (6, "42"),  # JSON scalar, not an object
        (7, None),
    ]
    df = spark.createDataFrame(rows, "i long, Comment string")
    got = {
        r["i"]: (r["GPUMemComment"], r["GPUEffComment"], r["NGpusComment"])
        for r in with_gpu_comment_columns(df).collect()
    }
    assert got[1] == (12345 * 2.0**20, pytest.approx(0.531), 1)
    for i in (2, 3, 4, 5, 6, 7):
        assert got[i] == (None, None, None), (i, got[i])
