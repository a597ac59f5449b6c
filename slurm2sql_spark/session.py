"""SparkSession factory tuned for both local testing and cluster scale.

Local mode is a single JVM; the settings that matter there are shuffle
partition count (~cores) and driver memory. The same builder flags are
the right defaults on a real cluster: AQE re-plans skewed shuffles at
runtime, and Arrow keeps any pandas-UDF path vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "slurm2sql_spark",
    master: str | None = None,
    shuffle_partitions: str | int | None = None,
    tz: str = "UTC",
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-appropriate defaults.

    ``tz`` pins ``spark.sql.session.timeZone``: the reference parses
    sacct timestamps in the machine's local zone (reference
    slurm2sql.py:67-73); we make the zone explicit so results are
    reproducible and comparable against a UTC-naive oracle.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let a join reuse children co-partitioned on a SUBSET of its
        # keys (semantically safe: same subset-hash => same partition).
        # With the default (true), a table bucketed by user_id still
        # reshuffles for a join on (user_id, bin) — this flag is what
        # makes write_bucketed'd fact tables give ZERO-exchange range
        # joins (measured 1.8x on the 100x range-join corpus; see
        # tools/profile_rangejoin.py). Trade-off: partial-key
        # co-partitioning keeps the child's coarser partition count —
        # acceptable here because bucket counts are chosen ~cores.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        # Cost-based optimization ON by default (r10): free when no
        # catalog stats exist (parquet scans fall back to sizeInBytes),
        # and with analyze_table()'d tables it buys stats-driven join
        # reordering + static broadcast selection (measured: q7 2.47x,
        # q5 2.0x at the 100x corpus — CBO_r10.json; the q7 order was
        # also hand-applied so the statless path gets it).
        # UPGRADE HAZARD (ADVICE r10): a persistent metastore carrying
        # column stats computed by a pre-r10 deployment may include
        # TimestampNTZ column stats, which Spark 4.1's CBO
        # FilterEstimation MatchErrors on AT QUERY TIME once this flag
        # is on. Re-run sinks.parquet_sink.analyze_table (it drops and
        # recreates, clearing stale stats; new analyzes skip NTZ
        # columns) for every stats-bearing table on upgrade.
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.cbo.joinReorder.enabled", "true")
        .config("spark.sql.session.timeZone", tz)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # Pre-size the heap: growing from the tiny default -Xms to the
        # working size mid-query costs ~1s of GC/commit stalls on the
        # first large shuffle (measured on the sf0.1 flagship).
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", "-Xms4g"),
        )
        .config("spark.ui.enabled", "false")
        # Local benches read single small parquet files; the 128 MB
        # default split size would leave most cores idle during
        # CPU-heavy parse stages. ~1 MB splits parallelize a 10 MB file
        # across the machine. On a real cluster (many multi-hundred-MB
        # files) override back to the 128 MB default.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "1m"),
        )
        .config("spark.sql.files.openCostInBytes", "256k")
        # Engine semantics: the reference tolerates malformed values by
        # mapping them to NULL per-converter; we use try_* functions for
        # those paths explicitly, so ANSI mode stays off for SQLite-like
        # laxness on the remaining arithmetic (div-by-zero -> NULL).
        .config("spark.sql.ansi.enabled", "false")
        # Python DataSource filter pushdown (sacct source S7) is opt-in.
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, str(v))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
