"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join handling (enabled in ``session.get_spark``) splits
oversized shuffle partitions at runtime, which covers most cases. These
utilities are for the cases AQE can't fix:

- a single hot KEY inside one partition (AQE splits partitions, not
  keys), e.g. the empty-string JobName or one user owning 40% of rows;
- map-side pre-aggregation of a low-cardinality rollup where the final
  single-key reduce would bottleneck one task.

``salted_agg`` does the classic two-phase aggregate: groupBy
(key, salt) with partial aggregates, then re-aggregate by key — the
hot key's rows spread over ``salt_buckets`` tasks in phase 1 and phase
2 touches only ``keys x salt_buckets`` pre-aggregated rows.

``salted_broadcast_join`` handles a skewed LEFT side joined to a small
dim: no salting actually needed for correctness (broadcast joins don't
shuffle the left side at all) — the utility exists to make the intent
explicit and assert the dim IS broadcastable. For two LARGE tables with
a hot key, ``salt_explode_join`` salts the probe side and explodes the
build side ``salt_buckets`` ways on the hot keys only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salt_explode_join"]


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (phase1_fn, phase2_fn) where
    phase1 runs within (key, salt) groups and phase2 merges the
    partials. With a 2-tuple the source column defaults to the output
    name; encode a different source as ``"out:col"`` — e.g.
    ``{"n:JobID": (F.count, F.sum), "mx": (F.max, F.max)}`` counts
    ``JobID`` into output ``n`` and maxes column ``mx``. A 3-tuple
    ``(fn1, fn2, col)`` names the source explicitly.
    Only algebraic aggregates decompose this way — that is exactly the
    set that benefits (holistic aggregates like exact median can't be
    salted without a different algorithm).
    """
    salt = (F.spark_partition_id() * 131071 + F.monotonically_increasing_id()) % salt_buckets
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(*[fn1(c).alias(f"_p_{out}") for out, (fn1, _, c) in _norm(aggs).items()])
    )
    return phase1.groupBy(*key_cols).agg(
        *[
            fn2(f"_p_{out}").alias(out)
            for out, (_, fn2, c) in _norm(aggs).items()
        ]
    )


def _norm(aggs: dict) -> dict:
    """Accept (fn1, fn2) pairs keyed by output name — with the source
    column encoded as ``out:col``, defaulting to the output name — or
    (fn1, fn2, col) triples keyed by output name alone."""
    out = {}
    for name, spec in aggs.items():
        if len(spec) == 2:
            fn1, fn2 = spec
            name, _, col = name.partition(":")
            col = col or name
        else:
            fn1, fn2, col = spec
        out[name] = (fn1, fn2, col)
    return out


def salt_explode_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    hot_keys: list,
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join two large tables where ``key`` has a known hot-key set.

    Probe (left) rows with a hot key get a random-ish salt in
    [0, salt_buckets); build (right) rows with a hot key are exploded
    into ALL salt values; cold keys keep salt 0 on both sides. The join
    key becomes (key, salt): the hot key's rows spread across
    ``salt_buckets`` reducers instead of one. Memory cost: hot build
    rows are replicated ``salt_buckets`` times — keep ``hot_keys``
    small (it should be: that's what makes them hot).

    ``hot_keys`` typically comes from a cheap pre-scan
    (``df.groupBy(key).count().orderBy(desc("count")).limit(k)``) or
    from domain knowledge (the empty string, the service account).
    """
    hot = F.array(*[F.lit(k) for k in hot_keys])
    is_hot_l = F.array_contains(hot, F.col(key))
    lsalt = F.when(
        is_hot_l,
        (F.abs(F.xxhash64(F.monotonically_increasing_id())) % salt_buckets),
    ).otherwise(F.lit(0))
    l = left.withColumn("_salt", lsalt.cast("int"))

    is_hot_r = F.array_contains(hot, F.col(key))
    salts = F.when(
        is_hot_r, F.sequence(F.lit(0), F.lit(salt_buckets - 1))
    ).otherwise(F.array(F.lit(0)))
    r = right.withColumn("_salt", F.explode(salts)).withColumn(
        "_salt", F.col("_salt").cast("int")
    )

    out = l.join(r, [key, "_salt"])
    return out.drop("_salt")
