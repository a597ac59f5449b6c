"""A/B for the r16 export_stream micro-batch packing (VERDICT r15 #2):
distributed 3-exchange shape (SPARK_GRAFT_EXPORT_LOCAL_CAP=0) vs the
driver-local pack_assign_local path, toggled per pass INSIDE one
session so the comparison is same-JVM, same-ambient.

Also dumps the micro-batch physical plans to plans/r16/:
- export_batch_distributed.txt — the write frame behind write_sharded
  (two window exchanges + the write repartition)
- export_batch_local.txt — the local path's two frames (the
  zero-exchange collect projection and the LocalTableScan write)

Usage: python tools/bench_export_batch.py [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.01"


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from slurm2sql_spark import catalog
    from slurm2sql_spark.catalog import QUERIES
    from slurm2sql_spark.session import get_spark

    spark = get_spark(app_name="bench_export_batch")
    spark.sparkContext.setLogLevel("ERROR")

    spec = QUERIES["export_stream_parity"]

    def run(sf_dir):
        catalog.drop_caches()
        t0 = time.perf_counter()
        spec.spark(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        return time.perf_counter() - t0

    # warmup both modes at sf0.01
    for cap in ("0", "1000000"):
        os.environ["SPARK_GRAFT_EXPORT_LOCAL_CAP"] = cap
        run(WARM)

    walls = {"distributed": [], "local": []}
    for _ in range(passes):
        for mode, cap in (("distributed", "0"), ("local", "1000000")):
            os.environ["SPARK_GRAFT_EXPORT_LOCAL_CAP"] = cap
            walls[mode].append(round(run(SF), 3))
    os.environ.pop("SPARK_GRAFT_EXPORT_LOCAL_CAP", None)
    for mode, xs in walls.items():
        print(f"{mode}: min {min(xs):.3f}s  all {xs}")
    print(
        f"speedup {min(walls['distributed']) / min(walls['local']):.2f}x"
    )

    # plan evidence: rebuild the exact per-batch frames
    from pyspark.sql import functions as F

    from slurm2sql_spark.operators.packing import pack_sequences
    from slurm2sql_spark.operators.sharding import shard_assign
    from slurm2sql_spark.operators.textstats import quality_filter

    docs = catalog._t(spark, SF, "documents").filter(
        F.col("doc_id") % 3 == 0
    )
    qf = quality_filter(
        docs, "doc_id", "text", keep_cols=("source",),
        min_words=30, min_stop_hits=1,
    )
    kept = qf.filter(F.col("keep")).select("doc_id", "source", "n_words")
    packed = pack_sequences(
        kept, "doc_id", "n_words", budget=2048, shard_col="source"
    ).withColumnRenamed("shard", "src")
    extra = tuple(c for c in packed.columns if c != "id")
    assign = shard_assign(
        packed, "id", "n_tokens", 8, 4, "exs1", keep_cols=extra
    )
    dist_frame = (
        assign.select("id", *extra, "shard").repartition(8, "shard")
    )
    os.makedirs("plans/r16", exist_ok=True)
    with open("plans/r16/export_batch_distributed.txt", "w") as fh:
        fh.write(dist_frame._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        ))
    with open("plans/r16/export_batch_local.txt", "w") as fh:
        fh.write("-- collect side (one zero-exchange projection):\n")
        fh.write(kept.limit(1000001)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        ))
        fh.write("\n-- write side (local relation, zero exchange):\n")
        from pyspark.sql import types as T

        from slurm2sql_spark.operators.sharding import pack_assign_local

        import pyarrow as pa

        rows = [tuple(r) for r in kept.limit(1000001).collect()]
        assigned = pack_assign_local(rows, 2048, 8, 4, "exs1")
        schema = T.StructType(
            [
                T.StructField("id", kept.schema.fields[0].dataType, True),
                T.StructField("src", kept.schema.fields[1].dataType, True),
                T.StructField("n_tokens", T.LongType(), True),
                T.StructField("offset", T.LongType(), True),
                T.StructField("bin", T.LongType(), True),
                T.StructField("shard", T.LongType(), True),
            ]
        )
        cols = list(zip(*assigned)) if assigned else [[]] * 6
        tbl = pa.table(
            {
                "id": pa.array(cols[0], pa.int64()),
                "src": pa.array(cols[1], pa.string()),
                "n_tokens": pa.array(cols[2], pa.int64()),
                "offset": pa.array(cols[3], pa.int64()),
                "bin": pa.array(cols[4], pa.int64()),
                "shard": pa.array(cols[5], pa.int64()),
            }
        )
        ldf = spark.createDataFrame(tbl, schema).coalesce(1)
        fh.write(ldf._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        ))
    print("plans written to plans/r16/export_batch_{distributed,local}.txt")


if __name__ == "__main__":
    main()
