"""Schemas: raw sacct input fields and the typed ``slurm`` output table.

The reference's schema *is* its COLUMNS registry (reference
slurm2sql.py:580-687): keys without ``_`` are requested from sacct, keys
with ``_`` are computed; COLUMNS_EXTRA (slurm2sql.py:690-695) are fetched
for derivation but not stored. The three-type system (int/real/text,
slurm2sql.py:40-45) maps to Long/Double/String; the README's promise that
DuckDB can open the output directly (README.rst:134-141) makes this a
fixed statically-typed schema — exactly a Spark ``StructType``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# sacct columns requested by the reference (non-underscore COLUMNS keys,
# reference slurm2sql.py:992) ...
SACCT_COLUMNS = (
    "JobName", "User", "Group", "Account", "SubmitLine", "State",
    "Timelimit", "Elapsed", "Submit", "Start", "End", "Partition",
    "ExitCode", "NodeList", "Priority", "ReqNodes", "NNodes",
    "AllocNodes", "ReqTRES", "NTasks", "AllocTRES", "TRESUsageInTot",
    "TRESUsageOutTot", "NCPUS", "ReqCPUS", "AllocCPUS", "CPUTime",
    "TotalCPU", "UserCPU", "SystemCPU", "MinCPU", "MinCPUNode",
    "MinCPUTask", "ReqMem", "AveRSS", "MaxRSS", "MaxRSSNode",
    "MaxRSSTask", "MaxPages", "MaxVMSize", "AveDiskRead",
    "AveDiskWrite", "MaxDiskRead", "MaxDiskWrite", "Comment",
)

# ... plus extras used only to derive computed columns
# (reference slurm2sql.py:690-695).
SACCT_COLUMNS_EXTRA = (
    "JobID", "JobIDRaw", "ConsumedEnergyRaw", "TRESUsageInAve",
    "TRESUsageOutTot",
)

#: Every raw text field the transform may reference.
RAW_FIELDS: tuple[str, ...] = tuple(
    dict.fromkeys(SACCT_COLUMNS + SACCT_COLUMNS_EXTRA)
)

#: Raw input schema: everything is text at the source (sacct/CSV).
RAW_SCHEMA = T.StructType(
    [T.StructField(f, T.StringType(), True) for f in RAW_FIELDS]
)

# Output table: (name, type) in the reference's registry order
# (reference slurm2sql.py:580-687, underscore stripped at 943/1017).
_L, _D, _S = T.LongType(), T.DoubleType(), T.StringType()
SLURM_FIELDS: tuple[tuple[str, T.DataType], ...] = (
    ("JobID", _S), ("JobIDnostep", _S), ("JobIDonly", _L),
    ("JobStep", _S), ("ArrayTaskID", _L), ("JobIDRawonly", _L),
    ("JobName", _S), ("User", _S), ("Group", _S), ("Account", _S),
    ("SubmitLine", _S), ("Billing", _L),
    ("State", _S), ("Timelimit", _D), ("Elapsed", _D),
    ("Time", _L), ("Submit", _L), ("Start", _L), ("End", _L),
    ("QueueTime", _L), ("Partition", _S),
    ("ExitCodeRaw", _S), ("ExitCode", _L), ("ExitSignal", _L),
    ("NodeList", _S), ("Priority", _L), ("ConsumedEnergy", _L),
    ("ReqNodes", _L), ("NNodes", _L), ("AllocNodes", _L),
    ("ReqTRES", _S), ("NTasks", _L), ("AllocTRES", _S),
    ("TRESUsageInTot", _S), ("TRESUsageOutTot", _S),
    ("NCPUS", _L), ("ReqCPUS", _L), ("AllocCPUS", _L),
    ("CPUTime", _D), ("TotalCPU", _D), ("UserCPU", _D),
    ("SystemCPU", _D), ("CPUEff", _D), ("MinCPU", _D),
    ("MinCPUNode", _S), ("MinCPUTask", _S),
    ("TotalMem", _D), ("AllocMem", _D), ("MemEff", _D),
    ("ReqMem", _D), ("ReqMemNode", _D), ("ReqMemCPU", _D),
    ("AveRSS", _D), ("MaxRSS", _D), ("MaxRSSNode", _S),
    ("MaxRSSTask", _S), ("MaxPages", _L), ("MaxVMSize", _D),
    ("AveDiskRead", _L), ("AveDiskWrite", _L),
    ("MaxDiskRead", _L), ("MaxDiskWrite", _L),
    ("TotDiskRead", _D), ("TotDiskWrite", _D),
    ("ReqGPUS", _D), ("Comment", _S), ("GpuEff", _D),
    ("NGpus", _D), ("GpuType", _S), ("GpuUtil", _D),
    ("GpuMem", _D), ("GpuUtilTot", _D), ("GpuMemTot", _D),
)

SLURM_SCHEMA = T.StructType(
    [T.StructField(n, t, True) for n, t in SLURM_FIELDS]
)
