"""Point-in-time (as-of) join operator (operators/asof.py).

Semantics pinned against hand-computed frames (backward/forward, ties,
tolerance, NULL-payload matches) plus partitioning-independence and a
single-shuffle plan assertion — the operator's whole reason to exist is
avoiding the range-join blowup.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from slurm2sql_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 100, "a"),
            (1, 205, "b"),
            (1, 50, "c"),
            (2, 100, "d"),
            (3, 100, "e"),
        ],
        "k int, t bigint, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, 100, 10.0),
            (1, 200, 20.0),
            (2, 150, 30.0),
            (3, 90, None),
        ],
        "k int, t bigint, v double",
    )
    return left, right


def _rows(df):
    return {
        r["tag"]: (r["t_r"], r["v"]) for r in df.collect()
    }


def test_backward_basic(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="t", by="k")
    got = _rows(out)
    assert got == {
        # tie at t=100 matches inclusively; 205 takes the later build row
        "a": (100, 10.0),
        "b": (200, 20.0),
        # no build row at or before t=50 -> NULLs
        "c": (None, None),
        # k=2 build at 150 is AFTER probe 100 -> no match
        "d": (None, None),
        # matched row exists but its payload is NULL -> stays NULL (no
        # fallback to an older row)
        "e": (90, None),
    }
    assert set(out.columns) == {"k", "t", "tag", "t_r", "v"}


def test_backward_tolerance(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="t", by="k", tolerance=4)
    got = _rows(out)
    assert got["a"] == (100, 10.0)  # gap 0 <= 4
    assert got["b"] == (None, None)  # gap 5 > 4
    assert got["e"] == (None, None)  # gap 10 > 4


def test_forward(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="t", by="k", direction="forward")
    got = _rows(out)
    assert got == {
        "a": (100, 10.0),  # inclusive tie
        "b": (None, None),  # nothing after 205
        "c": (100, 10.0),  # first build at/after 50
        "d": (150, 30.0),
        "e": (None, None),  # build at 90 is before 100
    }


def test_ties_deterministic_with_tiebreak(spark):
    left = spark.createDataFrame([(1, 100, "a")], "k int, t bigint, tag string")
    right = spark.createDataFrame(
        [(1, 100, 1, 10.0), (1, 100, 2, 20.0), (1, 100, 3, 30.0)],
        "k int, t bigint, seq int, v double",
    )
    back = asof_join(
        left, right, on="t", by="k", right_cols=["v"], tiebreak="seq"
    )
    assert _rows(back) == {"a": (100, 30.0)}  # backward: greatest tiebreak
    fwd = asof_join(
        left,
        right,
        on="t",
        by="k",
        right_cols=["v"],
        tiebreak="seq",
        direction="forward",
    )
    assert _rows(fwd) == {"a": (100, 10.0)}  # forward: smallest tiebreak


def test_partitioning_independence(spark):
    left, right = _frames(spark)
    base = _rows(asof_join(left, right, on="t", by="k"))
    shuffled = _rows(
        asof_join(left.repartition(7), right.repartition(5), on="t", by="k")
    )
    assert base == shuffled


def test_name_collision_suffix_and_error(spark):
    left = spark.createDataFrame([(1, 100, 5.0)], "k int, t bigint, v double")
    right = spark.createDataFrame([(1, 90, 7.0)], "k int, t bigint, v double")
    out = asof_join(left, right, on="t", by="k")
    row = out.collect()[0]
    assert row["v"] == 5.0 and row["v_r"] == 7.0 and row["t_r"] == 90
    # explicit collision with a left column -> hard error, not silent
    bad = left.withColumnRenamed("v", "t_r")
    with pytest.raises(ValueError, match="collides"):
        asof_join(bad, right, on="t", by="k")
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on="t", by="k", direction="nearest")
    # two right columns mapping to one output name (right has v AND
    # v_r while left has v) -> hard error, not a silent drop
    dup = right.withColumn("v_r", F.col("v") * 2)
    with pytest.raises(ValueError, match="same suffixed output"):
        asof_join(left, dup, on="t", by="k")


def test_keyless_requires_explicit_opt_in(spark):
    """by=None plans a single-partition global window — refused unless
    the caller opts in (VERDICT r6 #6: the engine's no-single-reducer
    posture)."""
    left = spark.createDataFrame([(100, 5.0)], "t bigint, v double")
    right = spark.createDataFrame([(90, 7.0)], "t bigint, v double")
    with pytest.raises(ValueError, match="global window"):
        asof_join(left, right, on="t")
    row = asof_join(
        left, right, on="t", allow_global_window=True
    ).collect()[0]
    assert row["v_r"] == 7.0 and row["t_r"] == 90


def test_single_shuffle_plan(spark):
    """The union-tag design's contract: ONE Exchange (hash by key), no
    join operator at all — the physical plan must not contain a range
    join, broadcast-nested-loop, or cartesian."""
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, on="t", by="k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"):
        assert bad not in plan, plan


def test_matches_duckdb_asof(spark, tmp_path):
    """Engine cross-check on a random corpus: DuckDB's native ASOF JOIN
    is the independent implementation of the same semantics."""
    import random

    import duckdb

    rnd = random.Random(7)
    lrows = [(rnd.randrange(5), rnd.randrange(1000)) for _ in range(300)]
    rrows = [
        (rnd.randrange(5), rnd.randrange(1000), float(i)) for i in range(200)
    ]
    # dedupe build (k,t) so the survivor is well-defined in both engines
    seen, dedup = set(), []
    for k, t, v in rrows:
        if (k, t) not in seen:
            seen.add((k, t))
            dedup.append((k, t, v))
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)], "k int, t bigint, lid int"
    )
    right = spark.createDataFrame(dedup, "k int, t bigint, v double")
    got = {
        r["lid"]: (r["t_r"], r["v"])
        for r in asof_join(left, right, on="t", by="k").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE l(k INT, t BIGINT, lid INT)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", [(k, t, i) for i, (k, t) in enumerate(lrows)])
    con.execute("CREATE TABLE r(k INT, t BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO r VALUES (?,?,?)", dedup)
    want = {
        lid: (tr, v)
        for lid, tr, v in con.execute(
            "SELECT l.lid, r.t, r.v FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.t >= r.t"
        ).fetchall()
    }
    assert got == want
