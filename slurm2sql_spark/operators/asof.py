"""Point-in-time (as-of) join — the feature-engineering primitive Spark
lacks as a built-in.

For each left ("probe") row, attach the single right ("build") row with
the greatest ``on`` value <= the probe's (direction='backward'), or the
smallest ``on`` >= it (direction='forward'), within the same ``by`` key
— optionally only if the time gap is within ``tolerance``.

Not in the reference surface (slurm2sql has no temporal join); included
as a training-data-pipeline operator (SURVEY §2.14 family): joining the
latest preceding context event onto each sample is the standard
point-in-time feature join.

Scale design — why not a range join:

- A naive ``l.by = r.by AND r.on <= l.on`` join is a range join: Spark
  plans it as a broadcast-nested-loop or a sort-merge with per-key
  cross-product tails (every probe row pairs with EVERY earlier build
  row before the aggregation picks one). At 100 TB that is quadratic in
  the per-key row count.
- This implementation is the union-tag trick: tag both sides, union on
  a shared spine, and resolve the match with ONE window pass —
  ``last(<build col>, ignorenulls=True)`` over rows-unbounded-preceding.
  Exactly one shuffle (hash-partition by ``by``, sort by ``on`` within
  partitions), no per-key blowup, and the sort is the same work a
  sort-merge join would do anyway. Wall cost is O(n log n) per key
  group; memory is streaming (rows-between window, no buffering of the
  whole frame).
- Key skew: a hot ``by`` key serializes its window like any windowed
  aggregate. Salting is NOT applicable (the window needs the key's full
  ordered history); for pathological keys, pre-aggregate the build side
  to one row per (by, on) first — `asof_join` does not do this for you
  because which duplicate survives is a caller decision.

Tie semantics match DuckDB's ASOF JOIN (``l.on >= r.on``): a build row
at exactly the probe's ``on`` is eligible. Among multiple build rows at
the same (by, on) the survivor follows ``tiebreak`` (last-by-tiebreak
for backward, first-by-tiebreak for forward); pass ``tiebreak`` for a
deterministic result, or pre-deduplicate the build side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]

_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str] | None = None,
    *,
    direction: str = "backward",
    tolerance: int | float | None = None,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_r",
    tiebreak: str | None = None,
    allow_global_window: bool = False,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the matched ``right``
    row's ``right_cols`` (suffixed on name collision) and
    ``<on><suffix>`` (the matched build timestamp; NULL when no match
    or outside ``tolerance``).

    ``on`` must be numeric-orderable and present on both sides (cast
    timestamps to epoch first). ``tolerance`` is in ``on`` units.

    ``by=None`` plans a GLOBAL window: one partition sorts the entire
    union — a single-reducer bottleneck this engine otherwise never
    plans. It raises unless ``allow_global_window=True`` is passed
    explicitly (legitimate only for driver-small frames).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by_cols = [by] if isinstance(by, str) else list(by or [])
    if not by_cols and not allow_global_window:
        raise ValueError(
            "asof_join with by=None sorts the whole union in ONE "
            "partition (global window). Pass allow_global_window=True "
            "only if both frames are small enough for a single task."
        )
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by_cols]
    payload = list(right_cols)

    out_name = {c: (c + suffix if c in left.columns else c) for c in payload}
    on_r = on + suffix
    if on_r in left.columns or set(out_name.values()) & set(left.columns):
        raise ValueError("suffixed right column collides with a left column")
    outs = [on_r, *out_name.values()]
    if len(set(outs)) != len(outs):
        # e.g. right has both `v` and `v_r` while left has `v`
        raise ValueError(
            "two right columns collide on the same suffixed output name"
        )

    # Shared spine: by + on + side + tiebreak + right payload (NULL on
    # the probe side) + left payload (NULL on the build side).
    left_payload = [c for c in left.columns if c not in by_cols and c != on]
    tb = [tiebreak] if tiebreak else []

    lt = left.select(
        *by_cols,
        F.col(on).alias(on),
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias("__r_" + c) for c in payload],
        *[
            F.lit(None).cast(dict(right.dtypes)[t]).alias("__tb")
            for t in tb
        ],
        *left_payload,
    )
    rt = right.select(
        *by_cols,
        F.col(on).alias(on),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias("__r_" + c) for c in payload],
        *[F.col(t).alias("__tb") for t in tb],
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left_payload
        ],
    )
    u = lt.unionByName(rt)

    # Backward: build rows sort BEFORE probe rows at equal `on` (side
    # 0 < 1 asc) so last() over unbounded-preceding includes the
    # equal-`on` build row -> `probe.on >= build.on`. Forward mirrors:
    # probe first at ties, first() over rows-following.
    if direction == "backward":
        order = [F.col(on).asc(), F.col(_SIDE).asc()] + [
            F.col("__tb").asc_nulls_first() for _ in tb
        ]
        frame = (Window.unboundedPreceding, Window.currentRow)
        pick = F.last
    else:
        order = [F.col(on).asc(), F.col(_SIDE).desc()] + [
            F.col("__tb").asc_nulls_last() for _ in tb
        ]
        frame = (Window.currentRow, Window.unboundedFollowing)
        pick = F.first
    w = (
        Window.partitionBy(*by_cols).orderBy(*order).rowsBetween(*frame)
        if by_cols
        else Window.orderBy(*order).rowsBetween(*frame)
    )

    # Resolve the match as ONE window expression over a struct of the
    # build row: the struct is non-null for every build row, so
    # ignoreNulls skips probe rows only — a NULL inside a matched build
    # payload column stays NULL instead of falling back to an older row.
    build = F.col(_SIDE) == 0
    row = F.when(
        build, F.struct(F.col(on).alias("__on"), *[F.col("__r_" + c) for c in payload])
    )
    m = pick(row, ignorenulls=True).over(w)
    m_on = m["__on"]
    gap = (F.col(on) - m_on) if direction == "backward" else (m_on - F.col(on))
    ok = m_on.isNotNull()
    if tolerance is not None:
        ok = ok & (gap <= F.lit(tolerance))

    out = u.withColumns(
        {
            on_r: F.when(ok, m_on),
            **{out_name[c]: F.when(ok, m["__r_" + c]) for c in payload},
        }
    )
    return out.filter(F.col(_SIDE) == 1).select(
        *by_cols, on, *left_payload, on_r, *[out_name[c] for c in payload]
    )
