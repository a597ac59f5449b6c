"""Equality guards for the SQL-template construction fast path.

The converters and the transform stages build each expression tree once,
render it to SQL text, and replay later constructions via F.expr /
selectExpr (a prepared-statement trick that removes thousands of py4j
round trips per fresh plan — measured 3.4 s -> 0.4 s of driver time for
the flagship transform). These tests pin the only risk that introduces:
the rendered SQL must re-parse to the SAME semantics as the direct
Column build, for every decorated converter and for the whole transform.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from slurm2sql_spark.functions import converters as C
from slurm2sql_spark.functions import jobid as J

#: adversarial battery: empties, sentinels, every duration/unit/jobid
#: grammar shape, malformed values, negative numbers
VALUES = [
    "", None, "Unknown", "None", "UNLIMITED", "Partition_Limit",
    "1-02:03:04", "1-02:03", "02:03:04", "15:00", "90", "00:15.057",
    "2.5K", "3G", "100", "2.5k", "10Mn", "4Gc", "0", "x", "-5", "1.5",
    "2021-01-01T10:00:00", "123", "123_4.batch", "1000_2+3.1",
    "12[3-9]", "7.extern", "7.0", "0:9", "1:0", "   pad   ",
]

TEMPLATED_FNS = [
    C.int_, C.nullint, C.nullstr, C.nullstr_strip, C.unixtime,
    C.str_unknown, C.slurmtime, C.slurmmem, C.float_bytes, C.int_bytes,
    C.float_metric, C.int_metric,
    J.job_id_only, J.job_id_nostep, J.job_id_raw_only,
    J.array_task_id, J.job_step,
]


@pytest.mark.parametrize("fn", TEMPLATED_FNS, ids=lambda f: f.__name__)
def test_templated_converter_equals_direct_build(spark, fn):
    df = spark.createDataFrame([(v,) for v in VALUES], "x string")
    direct = [r[0] for r in df.select(fn.__wrapped__(F.col("x"))).collect()]
    first = [r[0] for r in df.select(fn(F.col("x"))).collect()]
    cached = [r[0] for r in df.select(fn(F.col("x"))).collect()]
    assert direct == first == cached


def test_transform_sql_path_equals_column_path(spark):
    """Whole-pipeline guard: the cached-selectExpr transform and the
    direct Column-API fallback must produce identical rows and schema
    on a synthesized sacct corpus."""
    from slurm2sql_spark.catalog import _sacct_raw_from_lineitem
    from slurm2sql_spark.operators import transform as T
    from slurm2sql_spark.schema import RAW_FIELDS

    raw = _sacct_raw_from_lineitem(spark, "/root/testdata/sf0.001")
    missing = [f for f in RAW_FIELDS if f not in set(raw.columns)]
    filled = raw.withColumns({f: F.lit(None).cast("string") for f in missing})

    fast = T.slurm_transform(raw, now=1_700_000_000)
    direct = T._transform_columns_path(filled, 1_700_000_000, False)
    assert fast.schema == direct.schema
    ra = sorted(map(tuple, fast.collect()))
    rb = sorted(map(tuple, direct.collect()))
    assert ra == rb and len(ra) > 0


def test_transform_jobs_only_consistent_across_paths(spark):
    from slurm2sql_spark.catalog import _sacct_raw_from_lineitem
    from slurm2sql_spark.operators import transform as T
    from slurm2sql_spark.schema import RAW_FIELDS

    raw = _sacct_raw_from_lineitem(spark, "/root/testdata/sf0.001")
    missing = [f for f in RAW_FIELDS if f not in set(raw.columns)]
    filled = raw.withColumns({f: F.lit(None).cast("string") for f in missing})
    fast = T.slurm_transform(raw, now=1_700_000_000, jobs_only=True)
    direct = T._transform_columns_path(filled, 1_700_000_000, True)
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, direct.collect())
    )
    assert fast.filter(F.col("JobStep").isNotNull()).count() == 0


def test_plan_cache_bounded(spark):
    """Schema-per-call callers must not grow the plan cache without
    bound (the guard clears at 64 entries)."""
    from slurm2sql_spark.operators import transform as T

    df = spark.createDataFrame([("1", "1")], "JobID string, JobIDRaw string")
    before = dict(T._PLAN_SQL_CACHE)
    for i in range(3):
        extra = df.withColumn(f"extra{i}", F.lit("x"))
        T.slurm_transform(extra, now=1)
    assert len(T._PLAN_SQL_CACHE) <= 64
    T._PLAN_SQL_CACHE.clear()
    T._PLAN_SQL_CACHE.update(before)


def test_backtick_in_passthrough_column_name(spark):
    """Column names come from the sacct dump header, so a header field
    containing a backtick must render to valid selectExpr SQL (doubled
    backtick), not a misparse."""
    from slurm2sql_spark.operators import transform as T

    from pyspark.sql import types as ST

    schema = ST.StructType(
        [
            ST.StructField("JobID", ST.StringType()),
            ST.StructField("JobIDRaw", ST.StringType()),
            ST.StructField("we`ird", ST.StringType()),
        ]
    )
    df = spark.createDataFrame([("1", "1", "weird")], schema)
    # the odd column rides through stages 1-3 as a quoted passthrough
    # (the final projection prunes to the COLUMNS registry); an
    # unescaped backtick raises ParseException in the first selectExpr
    out = T.slurm_transform(df, now=1_700_000_000)
    assert out.first().JobID == "1"
    assert "we`ird" not in out.columns  # pruned by the final projection
