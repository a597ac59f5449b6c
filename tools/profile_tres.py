"""Micro-profile the TRES column family: which subexpression is hot?"""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from slurm2sql_spark import catalog
from slurm2sql_spark.functions import converters as C
from slurm2sql_spark.operators.transform import slurm_transform

raw = catalog._sacct_raw_from_lineitem(spark, sf_dir)
slurm = slurm_transform(raw, now=1_700_000_000)


def t(label, df):
    df.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label:45s} {time.time()-t0:7.2f}s")


# raw-level experiments
tin = F.str_to_map(F.col("TRESUsageInTot"), F.lit(","), F.lit("="))
tal = F.str_to_map(F.col("AllocTRES"), F.lit(","), F.lit("="))

t("raw passthrough", raw.select("TRESUsageInTot", "AllocTRES"))
t("str_to_map x2 only", raw.select(tin.alias("a"), tal.alias("b")))
t("map lookups x5 (restaged)", raw.select(tin.alias("a"), tal.alias("b")).select(
    F.col("a")["cpu"], F.col("a")["mem"], F.col("a")["gres/gpuutil"],
    F.col("b")["mem"], F.col("b")["gres/gpu"]))
t("lookups+converters (restaged)", raw.select(tin.alias("a"), tal.alias("b")).select(
    C.slurmtime(F.col("a")["cpu"]), C.float_bytes(F.col("a")["mem"]),
    C.float_metric(F.col("a")["gres/gpuutil"]),
    C.float_bytes(F.col("b")["mem"]), C.float_metric(F.col("b")["gres/gpu"])))
# regex alternative (reference style)
def rx(src, field):
    return F.regexp_extract(F.col(src), r"\b" + field + r"=([^,]*)", 1)
t("regex x5 + converters", raw.select(
    C.slurmtime(rx("TRESUsageInTot", "cpu")),
    C.float_bytes(rx("TRESUsageInTot", "mem")),
    C.float_metric(rx("TRESUsageInTot", "gres/gpuutil")),
    C.float_bytes(rx("AllocTRES", "mem")),
    C.float_metric(rx("AllocTRES", "gres/gpu"))))

# via the real transform (what the catalog pays)
t("transform: TotalCPU only", slurm.select("TotalCPU"))
t("transform: TotalMem only", slurm.select("TotalMem"))
t("transform: 5 eff-needed tres cols", slurm.select("TotalCPU", "TotalMem", "AllocMem", "NGpus", "GpuUtil"))
t("transform: Billing only", slurm.select("Billing"))
t("transform: CPUEff only", slurm.select("CPUEff"))
t("transform: ReqGPUS only", slurm.select("ReqGPUS"))
t("transform: TotDiskRead/Write", slurm.select("TotDiskRead", "TotDiskWrite"))
