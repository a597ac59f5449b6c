"""Converter Column-expression library.

Every converter from the reference's scalar registry (reference
slurm2sql.py:40-197) re-expressed as a pure ``pyspark.sql.Column``
builder — JVM-side, whole-stage-codegen'd, no Python UDFs. Each takes a
column (name or Column) of raw sacct text and returns a typed Column.
"""

from slurm2sql_spark.functions.converters import (  # noqa: F401
    float_bytes,
    float_metric,
    int_,
    int_bytes,
    int_metric,
    nullint,
    nullstr,
    nullstr_strip,
    slurm_timestamp,
    slurmmem,
    slurmtime,
    str_unknown,
    unixtime,
)
from slurm2sql_spark.functions.tres import tres_field  # noqa: F401
from slurm2sql_spark.functions.jobid import (  # noqa: F401
    array_task_id,
    job_id_nostep,
    job_id_only,
    job_step,
)
