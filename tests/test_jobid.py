"""JobID grammar truth table, mirroring reference test.py:387-414."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from slurm2sql_spark.functions import jobid as J

# (jobid, jobid_only, array_task_id, job_step, jobid_nostep)
CASES = [
    ("1000", 1000, None, None, "1000"),
    ("1000.batch", 1000, None, "batch", "1000"),
    ("1000.0", 1000, None, "0", "1000"),
    ("1000_2", 1000, 2, None, "1000_2"),
    ("1000_2.batch", 1000, 2, "batch", "1000_2"),
    ("1000_2.11", 1000, 2, "11", "1000_2"),
    ("1000_[2-5]", 1000, None, None, "1000"),
    ("7099567_5035", 7099567, 5035, None, "7099567_5035"),
    ("1000_2+3", 1000, 2, None, "1000_2"),
    ("1000+2.3", 1000, None, "3", "1000"),
    ("1000+1", 1000, None, None, "1000"),
    ("1000+1.batch", 1000, None, "batch", "1000"),
    ("1000_2+3.1", 1000, 2, "1", "1000_2"),
]


@pytest.mark.parametrize("jid,only,task,step,nostep", CASES)
def test_jobid_grammar(spark, jid, only, task, step, nostep):
    df = spark.createDataFrame([(jid,)], "j string")
    row = df.select(
        J.job_id_only("j").alias("only"),
        J.array_task_id("j").alias("task"),
        J.job_step("j").alias("step"),
        J.job_id_nostep("j").alias("nostep"),
    ).collect()[0]
    assert row["only"] == only
    assert row["task"] == task
    assert row["step"] == step
    assert row["nostep"] == nostep
