"""Deidentification: replace sensitive column values with stable
``<colname>_<i>`` pseudonyms (reference deidentify.py:7-47).

The reference's v2 builds a per-column ``{value: i}`` dict in driver
memory then rewrites row-by-row — it logs progress every 100k rows and
its v1 was retired as "not efficient enough for production"
(deidentify.py:14-15). The Spark formulation is the third iteration:
build the dictionary AS a DataFrame and apply it with joins — no
driver-side state, fully shuffle-parallel, and the dictionary doubles
as the reversible mapping table the reference never persists.

Scale design (the round-1 version used ``dense_rank`` over an
un-partitioned window — a single-partition sort that dies when a
near-unique column like SubmitLine makes the "dictionary" as large as
the table):

- ``value_dictionary`` numbers values with a PARTITIONED two-phase
  rank: range-partition by value, ``row_number`` within each partition,
  then add broadcast per-partition offsets. Global sort order, no
  single-partition stage, any cardinality.
- ``deidentify(numbering='auto')`` (default) measures each column's
  distinct count in ONE ``approx_count_distinct`` pass and picks per
  column: compact rank numbering + broadcast join when the dictionary
  is broadcastable, else an O(1)-per-row 64-bit hash pseudonym (no
  dictionary at all; collision odds ~n^2/2^65).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["value_dictionary", "deidentify"]

#: above this distinct-count the dictionary is not worth broadcasting;
#: auto mode switches the column to hash pseudonyms.
DEFAULT_HASH_THRESHOLD = 1_000_000


def value_dictionary(df: DataFrame, column: str) -> DataFrame:
    """Distinct non-null values -> ``(value, pseudonym)`` mapping with
    deterministic ``<column>_<i>`` numbering, i in value sort order
    (reference deidentify.py:19, 28-34 builds the same dict in Python).

    Numbering is a partitioned two-phase rank: range-partition the
    distinct values, rank locally, then add each partition's cumulative
    row-count offset (a tiny broadcast). The result equals a global
    ``dense_rank`` regardless of where the range boundaries land, so the
    output is deterministic even though the range partitioner samples.
    """
    distinct = (
        df.select(F.col(column).alias("value"))
        .filter(F.col("value").isNotNull())
        .distinct()
    )
    parts = distinct.repartitionByRange(F.col("value")).withColumn(
        "_pid", F.spark_partition_id()
    )
    local_w = Window.partitionBy("_pid").orderBy("value")
    local = parts.withColumn("_lrank", F.row_number().over(local_w) - 1)
    # per-partition offsets: as many rows as partitions. The running
    # sum over that tiny frame is a triangular self-join (p^2 rows for
    # p partitions, p <= a few hundred) — not a global-order window,
    # which would plan a single-partition WindowExec even though the
    # frame is small.
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    a, b = counts.alias("a"), counts.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_off"))
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .select(
            "value",
            F.concat_ws(
                "_", F.lit(column), (F.col("_lrank") + F.col("_off"))
            ).alias("pseudonym"),
        )
    )


def _hash_pseudonym(c: str):
    return F.when(
        F.col(c).isNotNull(),
        F.concat_ws("_", F.lit(c), F.conv(F.hex(F.xxhash64(F.col(c))), 16, 10)),
    )


#: the reference's sensitive-column list (deidentify.py:7)
DEFAULT_DEIDENTIFY_COLUMNS = ("JobName", "User", "Group", "SubmitLine", "Comment")


def deidentify(
    df: DataFrame,
    columns: tuple[str, ...] = DEFAULT_DEIDENTIFY_COLUMNS,
    numbering: str = "auto",
    hash_threshold: int = DEFAULT_HASH_THRESHOLD,
) -> DataFrame:
    """Rewrite each sensitive column to its pseudonym (reference
    deidentify.py:36-47 does this as an in-place sqlite UPDATE loop).

    ``numbering``:

    - ``'auto'`` (default): one ``approx_count_distinct`` pass over all
      target columns, then per column rank numbering when the
      dictionary fits ``hash_threshold``, hash pseudonyms otherwise.
    - ``'rank'``: force compact ids; still scales (partitioned rank)
      but pays a dictionary join per column.
    - ``'hash'``: force O(1) per-row pseudonyms, no ordering guarantee.
    """
    present = [c for c in columns if c in df.columns]
    if not present:
        return df

    if numbering == "auto":
        counts = (
            df.select(
                *[F.approx_count_distinct(c).alias(c) for c in present]
            ).first()
        )
        modes = {
            c: ("hash" if counts[c] > hash_threshold else "rank")
            for c in present
        }
    else:
        modes = {c: numbering for c in present}

    hash_cols = [c for c in present if modes[c] == "hash"]
    if hash_cols:
        df = df.withColumns({c: _hash_pseudonym(c) for c in hash_cols})

    for c in (c for c in present if modes[c] == "rank"):
        mapping = value_dictionary(df, c).withColumnsRenamed(
            {"value": f"_v_{c}", "pseudonym": f"_p_{c}"}
        )
        df = (
            df.join(F.broadcast(mapping), df[c] == mapping[f"_v_{c}"], "left")
            .withColumn(c, F.col(f"_p_{c}"))
            .drop(f"_v_{c}", f"_p_{c}")
        )
    return df
