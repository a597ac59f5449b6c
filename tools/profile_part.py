"""Scan parallelism: is the transform stage starved of partitions?"""
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
from slurm2sql_spark.operators.transform import slurm_transform
from slurm2sql_spark.operators.views import eff

li = catalog._t(spark, sf_dir, "lineitem")
print("lineitem scan partitions:", li.rdd.getNumPartitions())

raw = catalog._sacct_raw_from_lineitem(spark, sf_dir)
print("raw partitions:", raw.rdd.getNumPartitions())


def t(label, df):
    df.write.format("noop").mode("overwrite").save()
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label:45s} {time.time()-t0:7.2f}s")


slurm = slurm_transform(raw, now=1_700_000_000)
t("full transform (as-is)", slurm)

raw32 = catalog._sacct_raw_from_lineitem(spark, sf_dir)
raw32 = raw32.repartition(64)
t("full transform (repartition 64)", slurm_transform(raw32, now=1_700_000_000))

# repartition the narrow input instead (before string synthesis)
li_narrow = li.select("l_orderkey", "l_linenumber", "l_quantity").repartition(64)
# rebuild synthesis on the repartitioned narrow frame
import slurm2sql_spark.catalog as cat
t0 = time.time()
e = eff(slurm_transform(raw32, now=1_700_000_000))
e.write.format("noop").mode("overwrite").save()
print(f"{'eff on repartitioned raw':45s} {time.time()-t0:7.2f}s")
