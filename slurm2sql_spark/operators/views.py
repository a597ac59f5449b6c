"""The reference's SQL views as DataFrame builders.

- ``allocations`` / ``steps``: JobStep IS NULL / NOT NULL filters
  (reference slurm2sql.py:948-949).
- ``eff``: the flagship per-job aggregation — steps rolled up to jobs by
  ``JobIDnostep`` with 28 output expressions (reference
  slurm2sql.py:950-987).
- ``user_rollup``: the seff ``--aggregate-user`` second-level aggregation
  with elapsed*cpu-weighted efficiencies (reference slurm2sql.py:1299-1323).

Scale notes: ``eff`` groups on JobIDnostep — essentially unique per job,
so cardinality is high and the shuffle is well spread (no skew). The
reference's two correlated scalar subqueries (slurm2sql.py:954, 957) —
"pull JobName/State from the allocation row" — are expressed as
conditional aggregates *inside the same groupBy* (``max(CASE WHEN
JobStep IS NULL ...)``), so they cost zero extra shuffles instead of a
self-join. The user rollup input is one row per job, orders of magnitude
smaller than steps; a second small shuffle.

SQLite's bare (non-aggregated) columns in the eff GROUP BY pick an
arbitrary row's value; we pin them to ``max`` for determinism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["allocations", "steps", "eff", "user_rollup"]


def allocations(slurm: DataFrame) -> DataFrame:
    """Job allocation rows only (reference slurm2sql.py:948)."""
    return slurm.filter(F.col("JobStep").isNull())


def steps(slurm: DataFrame) -> DataFrame:
    """Job step rows only (reference slurm2sql.py:949)."""
    return slurm.filter(F.col("JobStep").isNotNull())


def _alloc_only(col: str) -> Column:
    """Conditional-first: the allocation row's value, via aggregation —
    the decorrelated form of the reference's scalar subqueries
    (slurm2sql.py:954, 957)."""
    return F.max(F.when(F.col("JobStep").isNull(), F.col(col)))


def eff(slurm: DataFrame) -> DataFrame:
    """Per-job efficiency rollup (reference eff view, slurm2sql.py:950-987).

    One shuffle on the high-cardinality JobIDnostep key; all aggregates
    have map-side partial aggregation.
    """
    return slurm.groupBy(F.col("JobIDnostep").alias("JobID")).agg(
        F.max("User").alias("User"),
        F.max("Partition").alias("Partition"),
        _alloc_only("JobName").alias("JobName"),
        # group_concat(SubmitLine, '\n'): both engines are unordered; we
        # canonicalize by sorting for testability (SURVEY §7.4).
        F.concat_ws("\n", F.sort_array(F.collect_list("SubmitLine"))).alias(
            "SubmitLines"
        ),
        F.max("Account").alias("Account"),
        _alloc_only("State").alias("State"),
        F.max("NodeList").alias("NodeList"),
        F.max("Time").alias("Time"),
        F.max("Timelimit").alias("TimeLimit"),
        F.min("Start").alias("Start"),
        F.max("End").alias("End"),
        F.max("NNodes").alias("NNodes"),
        F.max("ReqTRES").alias("ReqTRES"),
        F.max("Elapsed").alias("Elapsed"),
        F.max("NCPUS").alias("NCPUS"),
        (F.sum("TotalCPU") / F.nullif(F.max("CPUTime"), F.lit(0.0))).alias("CPUeff"),
        F.max("CPUTime").alias("cpu_s_reserved"),
        F.sum("TotalCPU").alias("cpu_s_used"),
        F.max("ReqMemNode").alias("MemReq"),
        F.max("AllocMem").alias("AllocMem"),
        F.max("TotalMem").alias("TotalMem"),
        F.max("MaxRSS").alias("MaxRSS"),
        F.max("MemEff").alias("MemEff"),
        F.max(F.col("AllocMem") * F.col("Elapsed")).alias("mem_s_reserved"),
        F.max("NGpus").alias("NGpus"),
        F.max("GpuType").alias("GPUType"),
        (F.max("NGpus") * F.max("Elapsed")).alias("gpu_s_reserved"),
        (F.max("NGpus") * F.max("Elapsed") * F.max("GpuUtil")).alias("gpu_s_used"),
        (
            F.sum(F.col("GpuUtil") * F.col("Elapsed"))
            / F.nullif(F.max(F.col("NGpus") * F.col("Elapsed")), F.lit(0.0))
        ).alias("GpuEff"),
        F.max("GpuMem").alias("GpuMem"),
        F.max("MaxDiskRead").alias("MaxDiskRead"),
        F.max("MaxDiskWrite").alias("MaxDiskWrite"),
        F.sum("TotDiskRead").alias("TotDiskRead"),
        F.sum("TotDiskWrite").alias("TotDiskWrite"),
    )


def user_rollup(eff_df: DataFrame) -> DataFrame:
    """Per-user aggregation of the eff view (reference seff
    --aggregate-user, slurm2sql.py:1299-1323): counts, core/GPU days, and
    elapsed*ncpus-weighted efficiency means; I/O as GiB/s rates."""
    elapsed = F.col("Elapsed")
    ncpus = F.col("NCPUS")
    cpu_weight = F.sum(elapsed * ncpus)
    return eff_df.groupBy("User").agg(
        F.count(F.lit(1)).alias("NJobs"),
        (F.sum(elapsed) / F.lit(86400.0)).alias("ElapsedDays"),
        (F.sum(elapsed * ncpus) / F.lit(86400.0)).alias("CpuDays"),
        (F.sum(elapsed * ncpus * F.col("CPUeff")) / F.nullif(cpu_weight, F.lit(0.0))).alias(
            "CPUeff"
        ),
        (F.sum(elapsed * ncpus * F.col("MemEff")) / F.nullif(cpu_weight, F.lit(0.0))).alias(
            "MemEff"
        ),
        (F.sum(elapsed * F.col("NGpus")) / F.lit(86400.0)).alias("GpuDays"),
        (
            F.sum(elapsed * F.col("NGpus") * F.col("GpuEff"))
            / F.nullif(F.sum(elapsed * F.col("NGpus")), F.lit(0.0))
        ).alias("GpuEff"),
        (F.sum(F.col("TotDiskRead") / F.lit(1048576.0)) / F.nullif(F.sum(elapsed), F.lit(0.0))).alias(
            "ReadMiBps"
        ),
        (F.sum(F.col("TotDiskWrite") / F.lit(1048576.0)) / F.nullif(F.sum(elapsed), F.lit(0.0))).alias(
            "WriteMiBps"
        ),
    )
