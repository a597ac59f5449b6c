"""Profile harness for the flagship sacct_eff path (round-2 perf work).

Usage: python tools/profile_eff.py [sf_dir]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from slurm2sql_spark import catalog


def t(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label:40s} {dt:7.2f}s  {out}")
    return dt


# warmup JVM on something small
t("warmup (count lineitem)", lambda: catalog._t(spark, sf_dir, "lineitem").count())

raw = catalog._sacct_raw_from_lineitem(spark, sf_dir)
t("raw synthesis -> noop write", lambda: raw.write.format("noop").mode("overwrite").save())

from slurm2sql_spark.operators.transform import slurm_transform
from slurm2sql_spark.operators.views import eff

slurm = slurm_transform(raw, now=1_700_000_000)
t("transform -> noop write", lambda: slurm.write.format("noop").mode("overwrite").save())

e = eff(slurm)
t("eff agg -> noop write", lambda: e.write.format("noop").mode("overwrite").save())

t("sacct_eff catalog (collect)", lambda: len(catalog.QUERIES["sacct_eff"].spark(spark, sf_dir).collect()))
t("sacct_user_rollup catalog (collect)", lambda: len(catalog.QUERIES["sacct_user_rollup"].spark(spark, sf_dir).collect()))
