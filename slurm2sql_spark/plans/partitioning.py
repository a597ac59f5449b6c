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


def fan_out(
    df: DataFrame,
    factor: int = 2,
    target: int | None = None,
    current_partitions: int | None = None,
    min_bytes: int | None = None,
) -> DataFrame:
    """Spread ``df`` to at least cluster parallelism for a compute-heavy
    downstream stage; no-op when the plan already has enough partitions.

    ``factor`` multiplies ``defaultParallelism`` (2x gives stragglers a
    second wave). Pass ``current_partitions`` when the caller already
    knows the scan's split count (e.g. from file sizes) — then nothing
    is planned at all. Otherwise the count is read from the JVM-side
    query plan without a Python RDD conversion; that still forces
    physical planning of ``df``, so call it on a cheap scan/projection,
    not a deep plan (under AQE a deep plan's shuffle stages would run).

    ``min_bytes`` (opt-in): skip the repartition entirely when the
    optimizer's size estimate for ``df`` is below this many bytes — an
    explicit ``repartition(n)`` is exempt from AQE coalescing, so on a
    tiny input the n-task shuffle is pure overhead (measured: the
    shingle kernel on a 0.6 MB corpus runs 0.4 s on its 3 scan splits
    vs 1.1-4.5 s fanned out to 64). Callers whose per-byte UDF cost is
    modest should pass this; compute-dense synthesis stages (the
    flagship's string-parse path) should not — there fan-out pays for
    itself well below any safe byte threshold. At cluster scale a big
    input has plenty of scan splits and ``fan_out`` no-ops anyway.
    """
    spark = df.sparkSession
    if min_bytes is not None and _plan_size_bytes(df) < min_bytes:
        return df
    want = target or spark.sparkContext.defaultParallelism * factor
    if current_partitions is None:
        current_partitions = _plan_partition_count(df)
    if current_partitions >= want:
        return df
    return df.repartition(want)


def _plan_size_bytes(df: DataFrame) -> int:
    """Optimizer size estimate (bytes) for ``df`` — file-size-derived
    for parquet scans, column-pruning-scaled for projections. Estimate
    quality is only used for a skip-the-shuffle heuristic; on failure
    (Spark Connect) returns a huge number so fan-out proceeds."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # pragma: no cover - connect-only fallback
        return 1 << 62


def _plan_partition_count(df: DataFrame) -> int:
    """Output-partition count of ``df``'s physical plan.

    Uses the JVM ``QueryExecution.toRdd`` (lazy RDD[InternalRow]) so no
    Python-side RDD conversion machinery (``DataFrame.rdd`` /
    ``javaToPython``) is ever built; falls back to ``df.rdd`` only if
    the internal accessor is unavailable (e.g. Spark Connect).
    """
    try:
        return df._jdf.queryExecution().toRdd().getNumPartitions()
    except AttributeError:  # pragma: no cover - connect-only fallback
        return df.rdd.getNumPartitions()
