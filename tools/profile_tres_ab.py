"""A/B the flagship's TRES extraction at 100x: per-key anchored
regexps (shipping) vs one str_to_map per multi-key source column
(whole-stage codegen CSE builds each map once per row).

r10 verdict (SCALING.json sacct_eff.tres_ab_100x): 42.33 vs 40.26 s
min-of-3 — ~5%, inside the ambient drift band; per-key form kept
(prunes per-key for single-key consumers, no ANSI dup-key hazard).

Usage: python tools/profile_tres_ab.py [sf_dir]"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from slurm2sql_spark.session import get_spark
from slurm2sql_spark import catalog
from slurm2sql_spark.operators import transform as TR

spark = get_spark(app_name="tres_ab")
spark.sparkContext.setLogLevel("ERROR")
sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_x100"

orig_stage1 = TR._stage1_exprs

def map_stage1():
    tin = F.str_to_map(F.col("TRESUsageInTot"), F.lit(","), F.lit("="))
    tal = F.str_to_map(F.col("AllocTRES"), F.lit(","), F.lit("="))
    g = TR._tres_get
    def nn(m, k):
        # same map expression repeated per key: whole-stage codegen's
        # subexpression elimination builds the map ONCE per row
        return F.nullif(m[k], F.lit(""))
    return {
        "_tin_cpu": nn(tin, "cpu"),
        "_tin_mem": nn(tin, "mem"),
        "_tin_gpuutil": nn(tin, "gres/gpuutil"),
        "_tin_gpumem": nn(tin, "gres/gpumem"),
        "_tin_fsdisk": nn(tin, "fs/disk"),
        "_tal_cpu": nn(tal, "cpu"),
        "_tal_mem": nn(tal, "mem"),
        "_tal_gpu": nn(tal, "gres/gpu"),
        "_tal_billing": nn(tal, "billing"),
        "_tout_fsdisk": g("TRESUsageOutTot", "fs/disk"),
        "_treq_gpu": g("ReqTRES", "gres/gpu"),
    }

def run(name):
    q = catalog.QUERIES["sacct_eff"].spark
    # warm
    q(spark, "/root/testdata/sf0.01").write.mode("overwrite").format("noop").save()
    catalog.drop_caches()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        q(spark, sf).write.mode("overwrite").format("noop").save()
        ts.append(time.perf_counter() - t0)
        catalog.drop_caches()
    print(f"{name}: min {min(ts):.2f}s all {[round(t,2) for t in ts]}")

run("A per-key regex")
TR._stage1_exprs = map_stage1
try:
    run("B str_to_map")
finally:
    TR._stage1_exprs = orig_stage1
