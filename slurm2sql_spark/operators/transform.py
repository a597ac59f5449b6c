"""The ingest projection: raw sacct text -> typed ``slurm`` DataFrame.

This is the Spark re-expression of the reference's row loop + converter
registry (reference slurm2sql.py:1008-1034, COLUMNS at 580-687): one wide
``select`` of ~70 Column expressions that Catalyst fuses into a single
whole-stage-codegen'd projection. No Python runs per row — at 100 TB this
is a pure map stage with no shuffle.

Missing input columns (schema evolution, e.g. post-20.11 sacct without
``ReqGRES``, reference slurm2sql.py:311-324 and test.py:373-380) become
NULL-typed literals, so converters degrade to NULL instead of failing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from slurm2sql_spark.functions import converters as C
from slurm2sql_spark.functions import jobid as J
from slurm2sql_spark.functions.tres import tres_field
from slurm2sql_spark.schema import RAW_FIELDS

__all__ = ["slurm_transform", "slurm_columns"]


def _default_time(now: Column) -> Column:
    """Latest-active time (reference slurmDefaultTime, slurm2sql.py:205-219):
    ``End`` if known, else *now* for running jobs, else ``Submit``."""
    # Branching mirrors the reference exactly: *any* End except the
    # literal 'Unknown' (including '') short-circuits to unixtime(End);
    # likewise any Start except 'Unknown' means "running" -> now. A
    # missing column behaves like '' (the reference's defaultdict(str)).
    end, start = F.col("End"), F.col("Start")
    return (
        F.when(end.isNull() | (end != "Unknown"), C.unixtime(end))
        .when(start.isNull() | (start != "Unknown"), now)
        .otherwise(C.unixtime(F.col("Submit")))
    )


def _cpu_eff() -> Column:
    """Step CPU efficiency = TRESUsageInTot[cpu] / (Elapsed * AllocTRES[cpu])
    (reference slurmCPUEff, slurm2sql.py:510-544). The reference returns
    Python NaN on a zero denominator, which SQLite then stores as NULL —
    we emit NULL directly."""
    walltime = C.slurmtime(F.col("Elapsed"))
    cpu_alloc = tres_field("AllocTRES", "cpu", C.int_metric)
    cpu_used = tres_field("TRESUsageInTot", "cpu", C.slurmtime)
    return F.when(
        walltime.isNull() | (walltime == 0.0), F.lit(None).cast("double")
    ).otherwise(cpu_used / F.nullif(walltime * cpu_alloc, F.lit(0.0)))


def _mem_eff() -> Column:
    """TRESUsageInTot[mem] / AllocTRES[mem]; 0-alloc -> NULL
    (reference slurmMemEff2, slurm2sql.py:492-508)."""
    used = tres_field("TRESUsageInTot", "mem", C.float_bytes)
    alloc = tres_field("AllocTRES", "mem", C.float_bytes)
    return used / F.nullif(alloc, F.lit(0.0))


def _gpu_eff() -> Column:
    """(TRESUsageInTot[gres/gpuutil]/100) / AllocTRES[gres/gpu]
    (reference slurmGPUEff2, slurm2sql.py:395-407)."""
    used = tres_field("TRESUsageInTot", "gres/gpuutil", C.float_metric)
    alloc = tres_field("AllocTRES", "gres/gpu", C.float_metric)
    return (used / F.lit(100.0)) / F.nullif(alloc, F.lit(0.0))


def _mem_node() -> Column:
    """ReqMem (total across nodes) / NNodes; 0 cpus -> 0, 0 nodes -> NULL
    (reference slurmMemNode, slurm2sql.py:267-278)."""
    ncpus = F.col("NCPUS").cast("long")
    nnodes = F.col("NNodes").cast("long")
    return F.when(
        F.col("ReqMem").isNull() | (F.col("ReqMem") == ""), F.lit(None).cast("double")
    ).when(ncpus == 0, F.lit(0.0)).otherwise(
        C.slurmmem(F.col("ReqMem")) / F.nullif(nnodes, F.lit(0)).cast("double")
    )


def _mem_cpu() -> Column:
    """ReqMem / NCPUS; zero nodes or cpus -> NULL (reference
    slurmMemCPU, slurm2sql.py:280-291)."""
    ncpus = F.col("NCPUS").cast("long")
    nnodes = F.col("NNodes").cast("long")
    return F.when(
        F.col("ReqMem").isNull() | (F.col("ReqMem") == "") | (nnodes == 0),
        F.lit(None).cast("double"),
    ).otherwise(C.slurmmem(F.col("ReqMem")) / F.nullif(ncpus, F.lit(0)).cast("double"))


def slurm_columns(now: int | None = None) -> list[Column]:
    """The full output projection, in the reference registry's column
    order (reference slurm2sql.py:580-687). ``now`` injects a fixed
    "current time" for the running-job ``Time`` column (nondeterministic
    otherwise; the reference tests tolerate +-5 s, test.py:139-141)."""
    now_col = (
        F.lit(now).cast("long")
        if now is not None
        else F.unix_timestamp(F.current_timestamp())
    )
    jid = F.col("JobID")
    exit_parts = F.split(F.col("ExitCode"), ":")
    nullexit = F.col("ExitCode").isNull() | (F.col("ExitCode") == "")
    return [
        # Identity (reference slurm2sql.py:586-594; grammar 412-462)
        jid.alias("JobID"),
        J.job_id_nostep(jid).alias("JobIDnostep"),
        J.job_id_only(jid).alias("JobIDonly"),
        J.job_step(jid).alias("JobStep"),
        J.array_task_id(jid).alias("ArrayTaskID"),
        J.job_id_raw_only(F.col("JobIDRaw")).alias("JobIDRawonly"),
        # Metadata
        C.nullstr("JobName").alias("JobName"),
        C.nullstr("User").alias("User"),
        C.nullstr("Group").alias("Group"),
        C.nullstr("Account").alias("Account"),
        C.nullstr("SubmitLine").alias("SubmitLine"),
        tres_field("AllocTRES", "billing", C.int_metric).alias("Billing"),
        # Times (reference slurm2sql.py:205-253, 607-615)
        C.nullstr("State").alias("State"),
        C.slurmtime("Timelimit").alias("Timelimit"),
        C.slurmtime("Elapsed").alias("Elapsed"),
        _default_time(now_col).alias("Time"),
        C.unixtime("Submit").alias("Submit"),
        C.unixtime("Start").alias("Start"),
        C.unixtime("End").alias("End"),
        (C.unixtime("Start") - C.unixtime("Submit")).alias("QueueTime"),
        C.nullstr("Partition").alias("Partition"),
        # Exit codes (reference slurm2sql.py:553-572)
        C.nullstr("ExitCode").alias("ExitCodeRaw"),
        F.when(nullexit, F.lit(None).cast("long"))
        .otherwise(F.element_at(exit_parts, 1).cast("long"))
        .alias("ExitCode"),
        F.when(nullexit, F.lit(None).cast("long"))
        .otherwise(F.element_at(exit_parts, 2).cast("long"))
        .alias("ExitSignal"),
        C.nullstr("NodeList").alias("NodeList"),
        C.nullint("Priority").alias("Priority"),
        C.nullint("ConsumedEnergyRaw").alias("ConsumedEnergy"),
        # Node counts
        C.int_bytes("ReqNodes").alias("ReqNodes"),
        C.nullint("NNodes").alias("NNodes"),
        C.nullint("AllocNodes").alias("AllocNodes"),
        # TRES passthrough
        C.nullstr("ReqTRES").alias("ReqTRES"),
        C.nullint("NTasks").alias("NTasks"),
        C.nullstr("AllocTRES").alias("AllocTRES"),
        C.nullstr("TRESUsageInTot").alias("TRESUsageInTot"),
        C.nullstr("TRESUsageOutTot").alias("TRESUsageOutTot"),
        # CPU (reference slurm2sql.py:639-650; TotalCPU comes from the
        # TRESUsageInTot cpu= field, not sacct's TotalCPU column — 643)
        C.nullint("NCPUS").alias("NCPUS"),
        C.nullint("ReqCPUS").alias("ReqCPUS"),
        C.nullint("AllocCPUS").alias("AllocCPUS"),
        C.slurmtime("CPUTime").alias("CPUTime"),
        tres_field("TRESUsageInTot", "cpu", C.slurmtime).alias("TotalCPU"),
        C.slurmtime("UserCPU").alias("UserCPU"),
        C.slurmtime("SystemCPU").alias("SystemCPU"),
        _cpu_eff().alias("CPUEff"),
        C.slurmtime("MinCPU").alias("MinCPU"),
        C.nullstr("MinCPUNode").alias("MinCPUNode"),
        C.nullstr("MinCPUTask").alias("MinCPUTask"),
        # Memory (reference slurm2sql.py:652-665)
        tres_field("TRESUsageInTot", "mem", C.float_bytes).alias("TotalMem"),
        tres_field("AllocTRES", "mem", C.float_bytes).alias("AllocMem"),
        _mem_eff().alias("MemEff"),
        C.float_bytes("ReqMem").alias("ReqMem"),
        _mem_node().alias("ReqMemNode"),
        _mem_cpu().alias("ReqMemCPU"),
        C.slurmmem("AveRSS").alias("AveRSS"),
        C.slurmmem("MaxRSS").alias("MaxRSS"),
        C.nullstr("MaxRSSNode").alias("MaxRSSNode"),
        C.nullstr("MaxRSSTask").alias("MaxRSSTask"),
        C.int_metric("MaxPages").alias("MaxPages"),
        C.slurmmem("MaxVMSize").alias("MaxVMSize"),
        # Disk (reference slurm2sql.py:667-673)
        C.int_bytes("AveDiskRead").alias("AveDiskRead"),
        C.int_bytes("AveDiskWrite").alias("AveDiskWrite"),
        C.int_bytes("MaxDiskRead").alias("MaxDiskRead"),
        C.int_bytes("MaxDiskWrite").alias("MaxDiskWrite"),
        tres_field("TRESUsageInTot", "fs/disk", C.float_bytes).alias("TotDiskRead"),
        tres_field("TRESUsageOutTot", "fs/disk", C.float_bytes).alias("TotDiskWrite"),
        # GPU (reference slurm2sql.py:676-686)
        tres_field("ReqTRES", "gres/gpu", C.float_metric).alias("ReqGPUS"),
        C.nullstr_strip("Comment").alias("Comment"),
        _gpu_eff().alias("GpuEff"),
        tres_field("AllocTRES", "gres/gpu", C.float_metric).alias("NGpus"),
        F.nullif(
            F.regexp_extract(F.col("AllocTRES"), r"\bgres/gpu:([^=]+)=", 1), F.lit("")
        ).alias("GpuType"),
        tres_field("TRESUsageInTot", "gres/gpuutil", C.float_metric, scale=0.01).alias(
            "GpuUtil"
        ),
        tres_field("TRESUsageInTot", "gres/gpumem", C.float_metric).alias("GpuMem"),
        tres_field("TRESUsageInTot", "gres/gpuutil", C.float_metric).alias("GpuUtilTot"),
        tres_field("TRESUsageInTot", "gres/gpumem", C.float_metric).alias("GpuMemTot"),
    ]


def slurm_transform(
    raw: DataFrame, now: int | None = None, jobs_only: bool = False
) -> DataFrame:
    """Raw string-typed sacct DataFrame -> typed ``slurm`` DataFrame.

    ``jobs_only`` drops step rows during ingest (reference --jobs-only,
    slurm2sql.py:720-721 and 1010-1014).
    """
    present = set(raw.columns)
    missing = [f for f in RAW_FIELDS if f not in present]
    if missing:
        raw = raw.withColumns(
            {f: F.lit(None).cast("string") for f in missing}
        )
    out = raw.select(*slurm_columns(now=now))
    if jobs_only:
        out = out.filter(F.col("JobStep").isNull())
    return out
