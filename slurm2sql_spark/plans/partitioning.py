"""Partitioning utilities.

``fan_out`` addresses a local/small-file hazard: Spark splits parquet
scans at row-group boundaries, so a table written as one row group
yields a 1-3 partition scan no matter how many cores exist — and any
compute-heavy narrow stage downstream (string synthesis, parsing,
shingling, vector math) runs nearly serial. Measured on the sf0.1
bench: the full sacct transform drops 26.5s -> 4.6s once the input is
spread to 64 partitions (tools/profile_part.py).

At real scale the scan already has >= cluster-parallelism splits and
``fan_out`` is a no-op — it never *coalesces*, and the repartition it
inserts shuffles only the narrow pre-synthesis columns, so the cost is
a few MB even when it does fire.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["fan_out"]


def fan_out(df: DataFrame, factor: int = 2, target: int | None = None) -> DataFrame:
    """Spread ``df`` to at least cluster parallelism for a compute-heavy
    downstream stage; no-op when the plan already has enough partitions.

    ``factor`` multiplies ``defaultParallelism`` (2x gives stragglers a
    second wave). Checking the partition count forces physical planning
    of ``df`` — call this on a cheap scan/projection, not a deep plan.
    """
    spark = df.sparkSession
    want = target or spark.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() >= want:
        return df
    return df.repartition(want)
