"""Variants of _unit_scaled: where does the 0.75s/col go?"""
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

raw = catalog._sacct_raw_from_lineitem(spark, sf_dir)
tin = F.str_to_map(F.col("TRESUsageInTot"), F.lit(","), F.lit("="))
tal = F.str_to_map(F.col("AllocTRES"), F.lit(","), F.lit("="))
staged = raw.select(tin.alias("a"), tal.alias("b"))
cols5 = [F.col("a")["cpu"], F.col("a")["mem"], F.col("a")["gres/gpuutil"],
         F.col("b")["mem"], F.col("b")["gres/gpu"]]

d = "double"
_U = "kmgtpezy"


def cur(c, base=1024):
    unit = F.lower(c.substr(-1, 1))
    num_v = c.substr(F.lit(1), F.length(c) - 1).cast(d)
    raw_v = c.cast(d)
    k = F.instr(F.lit(_U), unit)
    f = (k > 0).cast(d)
    scale = F.pow(F.lit(float(base)), k.cast(d))
    value = f * F.coalesce(num_v, F.lit(0.0)) * scale + (1.0 - f) * F.coalesce(raw_v, F.lit(0.0))
    chosen_is_null = ((k > 0) & num_v.isNull()) | ((k <= 0) & raw_v.isNull())
    return value + F.when(chosen_is_null, F.lit(None).cast(d)).otherwise(F.lit(0.0))


def v_arr(c, base=1024):
    # pow -> array-literal lookup; instr on both-case alphabet avoids lower()
    unit = c.substr(-1, 1)
    num_v = c.substr(F.lit(1), F.length(c) - 1).cast(d)
    raw_v = c.cast(d)
    k = (F.instr(F.lit(_U + _U.upper()), unit) - 1) % 8 + 1  # hmm needs care
    scales = F.array(*[F.lit(float(base) ** i) for i in range(9)])
    kk = F.instr(F.lit(_U), F.lower(unit))
    f = (kk > 0).cast(d)
    value = f * F.coalesce(num_v, F.lit(0.0)) * F.element_at(scales, kk + 1) + (1.0 - f) * F.coalesce(raw_v, F.lit(0.0))
    chosen_is_null = ((kk > 0) & num_v.isNull()) | ((kk <= 0) & raw_v.isNull())
    return value + F.when(chosen_is_null, F.lit(None).cast(d)).otherwise(F.lit(0.0))


def t(label, df):
    df.write.format("noop").mode("overwrite").save()
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label:45s} {time.time()-t0:7.2f}s")


t("lookups only", staged.select(*cols5))
t("current x5", staged.select(*[cur(c).alias(f"c{i}") for i, c in enumerate(cols5)]))
t("arr-scale x5", staged.select(*[v_arr(c).alias(f"c{i}") for i, c in enumerate(cols5)]))
t("just cast x5", staged.select(*[c.cast(d).alias(f"c{i}") for i, c in enumerate(cols5)]))
t("substr+cast x5", staged.select(*[c.substr(F.lit(1), F.length(c) - 1).cast(d).alias(f"c{i}") for i, c in enumerate(cols5)]))

spark.conf.set("spark.sql.codegen.wholeStage", "false")
t("current x5 NO codegen", staged.select(*[cur(c).alias(f"c{i}") for i, c in enumerate(cols5)]))
spark.conf.set("spark.sql.codegen.wholeStage", "true")
