"""Ordered funnel analysis over an event stream.

``funnel_stages``: how many users completed stage 1, then stage 2
AFTER stage 1, then stage 3 after stage 2, ... — the product-analytics
classic, with the ordering constraint that makes it more than a
per-type count (a purchase BEFORE the first view does not convert).

Spark-first shape: ONE shuffle+sort (partition by user, order by the
total event order), then k chained window expressions over that single
sorted partitioning — Catalyst plans all k windows in one Window
operator stack with no extra exchange, because every frame shares the
same partitioning and ordering. ``reached_k`` at a row = some
PRECEDING row already reached stage k-1 and this row is a stage-k
event; the per-user rollup is one map-side-combinable aggregate.

At 100 TB this is the minimal movement a funnel can do: events
shuffle once on user_id (the natural grain), and no self-joins —
the naive formulation (k-1 joins events-to-events on "later than the
user's stage-k-1 time") pays k-1 corpus joins for the same answer.
Skewed power users inflate a single partition's sort, not a reducer
key explosion; AQE's partition split handles it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["funnel_stages"]


def funnel_stages(
    events: DataFrame,
    user_col: str,
    type_col: str,
    order_cols: list[Column | str],
    stages: list[str],
) -> DataFrame:
    """Per-stage completion counts for an ordered ``stages`` funnel.

    ``order_cols`` must define a TOTAL order within a user (e.g.
    ``[ts, event_id]``) — ties would otherwise make "after" ambiguous
    and engine-dependent. Returns one row:
    ``(n_users, reached_<stage1>, reached_<stage2>, ...)`` where
    ``reached_<k>`` counts users with a stage-k event strictly after
    (in the total order) an event chain completing stages 1..k-1.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    prev = Window.partitionBy(user_col).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, -1
    )
    df = events
    flags = []
    for i, stage in enumerate(stages):
        is_stage = F.col(type_col) == stage
        if i == 0:
            flag = F.when(is_stage, F.lit(1)).otherwise(F.lit(0))
        else:
            prior = F.coalesce(
                F.max(flags[i - 1]).over(prev), F.lit(0)
            )
            flag = F.when(is_stage & (prior == 1), F.lit(1)).otherwise(
                F.lit(0)
            )
        name = f"_r{i}"
        df = df.withColumn(name, flag)
        flags.append(F.col(name))
    per_user = df.groupBy(user_col).agg(
        *[
            F.max(f"_r{i}").alias(f"_s{i}")
            for i in range(len(stages))
        ]
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        *[
            F.sum(f"_s{i}").cast("long").alias(f"reached_{stage}")
            for i, stage in enumerate(stages)
        ],
    )
