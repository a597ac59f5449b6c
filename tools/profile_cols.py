"""Which transform column groups dominate? Narrow-select each group off
the full transform so Catalyst prunes the rest."""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from slurm2sql_spark import catalog
from slurm2sql_spark.operators.transform import slurm_transform

raw = catalog._sacct_raw_from_lineitem(spark, sf_dir)
slurm = slurm_transform(raw, now=1_700_000_000)


def t(label, df):
    df.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label:35s} {time.time()-t0:7.2f}s")


t("baseline JobID only", slurm.select("JobID"))
t("identity grammar (5 cols)", slurm.select("JobIDnostep", "JobIDonly", "JobStep", "ArrayTaskID", "JobIDRawonly"))
t("durations (6 cols)", slurm.select("Timelimit", "Elapsed", "CPUTime", "UserCPU", "SystemCPU", "MinCPU"))
t("timestamps (3 cols)", slurm.select("Submit", "Start", "End"))
t("tres-derived (11 cols)", slurm.select("TotalCPU", "TotalMem", "AllocMem", "NGpus", "GpuUtil", "GpuMem", "TotDiskRead", "TotDiskWrite", "ReqGPUS", "Billing", "CPUEff"))
t("mem (6 cols)", slurm.select("ReqMem", "AveRSS", "MaxRSS", "MaxVMSize", "MaxPages", "ReqMemNode"))
t("disk int (5 cols)", slurm.select("AveDiskRead", "AveDiskWrite", "MaxDiskRead", "MaxDiskWrite", "ReqNodes"))
t("misc (5 cols)", slurm.select("ExitCode", "ExitSignal", "GpuType", "Time", "QueueTime"))
t("full transform", slurm)
