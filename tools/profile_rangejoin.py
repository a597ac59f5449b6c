"""VERDICT r7 #8 — the ONE bounded attempt at the range-join family's
constant-factor residual (gap_100x ~10.8-11.7 vs DuckDB IEJoin; plan
already minimal per the range_count control).

Lever: pre-bucketed sides. At 100 TB the events fact table would be
bucketed by user_id once at ingest; both range-join inputs then read
with hash(user_id) output partitioning, and EnsureRequirements drops
BOTH exchanges of the (user_id, bin) equi-join — HashPartitioning on a
subset of the clustering keys satisfies ClusteredDistribution. This
script measures whether zero-exchange execution moves the 100x wall
time, charging the bucketed write separately (it amortizes across every
downstream query of a real ingest, not per query).

Usage: python tools/profile_rangejoin.py  (x100 corpus must exist —
run tools/bench_scaling.py --x100 first). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

SRC = os.environ.get("SPARK_GRAFT_SCALE_DST100", "/tmp/spark_graft_x100")
WAREHOUSE = "/tmp/spark_graft_rj_bucketed"
BUCKETS = 32
PASSES = 3
BIN = 600_000_000  # same 10-min bins as the catalog entry


def frames(spark, src):
    from slurm2sql_spark.catalog import _ts_us

    ev = spark.read.parquet(f"{src}/events.parquet")
    ts = _ts_us(ev)
    win = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("window_id"),
        ts.alias("w_start"),
        (ts + F.floor(F.col("value") * F.lit(60000000.0)).cast("long")).alias(
            "w_end"
        ),
    )
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id", ts.alias("err_ts")
    )
    return err, win


def joined(err, win):
    from slurm2sql_spark.operators.rangejoin import range_join

    j = range_join(
        err, win, point="err_ts", start="w_start", end="w_end",
        by="user_id", bin_size=BIN,
    )
    return j.groupBy("window_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_errors")
    )


def run(df, passes=PASSES):
    times = []
    for _ in range(passes):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        times.append(round(time.perf_counter() - t0, 3))
    return times


def main():
    from slurm2sql_spark.session import get_spark
    from slurm2sql_spark.sinks.parquet_sink import write_bucketed

    spark = get_spark(app_name="profile_rangejoin")
    spark.sparkContext.setLogLevel("ERROR")
    # Zero-exchange bucketed joins need subset-key co-partitioning
    # (now a session default; set explicitly for driver-owned sessions)
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")

    err, win = frames(spark, SRC)

    # baseline: the shipped plan (shuffles both sides on (user, bin))
    base = joined(err, win)
    run(base, passes=1)  # JIT warmup
    t_base = run(base)

    # bucketed: both sides hash-clustered by user_id at "ingest"
    t0 = time.perf_counter()
    os.makedirs(WAREHOUSE, exist_ok=True)
    write_bucketed(err, "rj_err_b", f"{WAREHOUSE}/err", "user_id", BUCKETS)
    write_bucketed(win, "rj_win_b", f"{WAREHOUSE}/win", "user_id", BUCKETS)
    t_prep = round(time.perf_counter() - t0, 3)

    errb = spark.table("rj_err_b")
    winb = spark.table("rj_win_b")
    bucketed = joined(errb, winb)
    run(bucketed, passes=1)
    t_buck = run(bucketed)

    def exchanges(df):
        df.write.mode("overwrite").format("noop").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange hashpartitioning")

    out = {
        "src": SRC,
        "baseline_sec": t_base,
        "bucketed_sec": t_buck,
        "bucketed_prep_sec": t_prep,
        "baseline_min": min(t_base),
        "bucketed_min": min(t_buck),
        "speedup": round(min(t_base) / min(t_buck), 2),
        "exchanges_baseline": exchanges(base),
        "exchanges_bucketed": exchanges(bucketed),
        "buckets": BUCKETS,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
