"""Sequence packing: assign documents to fixed-token-budget training
bins by contiguous greedy packing within a shard.

The packing rule is the standard concat-and-chunk used for LLM
pretraining batches: within a shard, documents are laid out in a
deterministic order and a document belongs to the bin its FIRST token
lands in (documents may straddle bin boundaries; the trainer's loader
handles the split). That rule is exactly a running-sum window — fully
SQL-expressible, so the operator gets a real DuckDB oracle instead of a
rows-only check, and it is reproducible across engines and cluster
layouts (unlike first-fit heuristics over Spark partitions).

Scale shape: ONE window per shard (hash-partitioned shuffle on
``shard_col``, sort by the order column inside each partition). Shards
are the parallelism unit — size them like output files (thousands of
shards at 100 TB), never a single global ordering (a degenerate
one-shard corpus funnels into one task; pick a finer shard column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_sequences"]


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    shard_col: str,
) -> DataFrame:
    """Assign each document a (shard, bin, offset) under ``budget``
    tokens per bin.

    ``offset`` is the document's first-token position within its
    shard's concatenated stream (sum of prior docs' ``token_col`` in
    ``id_col`` order); ``bin`` is ``floor(offset / budget)``. Documents
    longer than the budget simply span bins — this operator is the
    deterministic placement index, not the splitter.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(F.col(token_col)).over(w), F.lit(0)).cast("long")
    return df.select(
        F.col(shard_col).alias("shard"),
        F.col(id_col).alias("id"),
        F.col(token_col).cast("long").alias("n_tokens"),
        offset.alias("offset"),
        F.floor(offset / F.lit(budget)).cast("long").alias("bin"),
    )
