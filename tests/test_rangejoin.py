"""Binned range join (operators/rangejoin.py): semantics vs a
brute-force inequality join, exact integer binning on negative domains,
the fan-out guard, and the plan contract (equi-join, no nested loop).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from slurm2sql_spark.operators.rangejoin import range_join


def _random_case(spark, seed, lo=-500, hi=500):
    rnd = random.Random(seed)
    pts = [(rnd.randrange(3), rnd.randrange(lo, hi), i) for i in range(200)]
    ivs = []
    for j in range(60):
        s = rnd.randrange(lo, hi)
        ivs.append((rnd.randrange(3), s, s + rnd.randrange(0, 120), j))
    points = spark.createDataFrame(pts, "k int, p bigint, pid int")
    intervals = spark.createDataFrame(ivs, "k int, s bigint, e bigint, iid int")
    want = {
        (pid, iid)
        for k, p, pid in pts
        for k2, s, e, iid in ivs
        if k == k2 and s <= p <= e
    }
    return points, intervals, want


@pytest.mark.parametrize("bin_size", [1, 7, 64, 1000])
def test_matches_bruteforce(spark, bin_size):
    """Result is bin-size-independent and equal to the naive inequality
    join — including negative values (integer div binning, not floor)."""
    points, intervals, want = _random_case(spark, seed=bin_size)
    out = range_join(
        points, intervals, point="p", start="s", end="e", by="k",
        bin_size=bin_size,
    )
    got = {(r["pid"], r["iid"]) for r in out.collect()}
    assert got == want
    # exactly once per matching pair, never duplicated
    assert out.count() == len(want)


def test_unkeyed(spark):
    points = spark.createDataFrame([(5, 0), (50, 1)], "p bigint, pid int")
    intervals = spark.createDataFrame([(0, 10, 0)], "s bigint, e bigint, iid int")
    out = range_join(points, intervals, point="p", start="s", end="e", bin_size=4)
    assert [(r["pid"], r["iid"]) for r in out.collect()] == [(0, 0)]


def test_null_and_inverted_intervals_drop(spark):
    points = spark.createDataFrame([(5, 0), (None, 1)], "p bigint, pid int")
    intervals = spark.createDataFrame(
        [(0, 10, 0), (None, 10, 1), (8, 2, 2)], "s bigint, e bigint, iid int"
    )
    out = range_join(points, intervals, point="p", start="s", end="e", bin_size=4)
    assert {(r["pid"], r["iid"]) for r in out.collect()} == {(0, 0)}


def test_fanout_guard_raises(spark):
    points = spark.createDataFrame([(5, 0)], "p bigint, pid int")
    intervals = spark.createDataFrame([(0, 10_000_000, 0)], "s bigint, e bigint, iid int")
    out = range_join(
        points, intervals, point="p", start="s", end="e",
        bin_size=1, max_bins_per_interval=1000,
    )
    with pytest.raises(Exception, match="range_join: interval spans"):
        out.collect()


def test_arg_validation(spark):
    points = spark.createDataFrame([(5, 0)], "p bigint, pid int")
    intervals = spark.createDataFrame([(0, 10, 0)], "s bigint, e bigint, pid int")
    with pytest.raises(ValueError, match="collision"):
        range_join(points, intervals, point="p", start="s", end="e", bin_size=4)
    with pytest.raises(ValueError, match="positive"):
        range_join(
            points, intervals.withColumnRenamed("pid", "iid"),
            point="p", start="s", end="e", bin_size=0,
        )


def test_plan_is_equi_join(spark):
    """The whole point: the physical plan is a distributed equi-join,
    not a nested loop or cartesian."""
    points, intervals, _ = _random_case(spark, seed=1)
    plan = (
        range_join(points, intervals, point="p", start="s", end="e", by="k", bin_size=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in plan, plan
    assert "Join" in plan


def test_partitioning_independence(spark):
    points, intervals, want = _random_case(spark, seed=9)
    out = range_join(
        points.repartition(7), intervals.repartition(5),
        point="p", start="s", end="e", by="k", bin_size=32,
    )
    assert {(r["pid"], r["iid"]) for r in out.collect()} == want


def test_range_count_matches_bruteforce_counts(spark):
    """The sort-sweep count (running-count difference at boundaries)
    equals the brute-force per-interval count, including zero-count
    intervals, boundary inclusivity on both ends, and zero-length
    intervals."""
    from collections import Counter

    from slurm2sql_spark.operators.rangejoin import range_count

    points, intervals, want_pairs = _random_case(spark, seed=99)
    want = Counter(iid for _, iid in want_pairs)
    out = range_count(
        points.drop("pid"), intervals, point="p", start="s", end="e", by="k"
    )
    got = {r["iid"]: r["n"] for r in out.collect()}
    assert len(got) == intervals.count()  # zero-count intervals kept
    for iid, n in got.items():
        assert n == want.get(iid, 0), iid

    # pinpoint inclusivity: point exactly at start, at end, and a
    # zero-length interval at the point
    pts = spark.createDataFrame([(1, 10), (1, 20)], "k int, p bigint")
    ivs = spark.createDataFrame(
        [(1, 10, 20, 1), (1, 10, 10, 2), (1, 11, 19, 3)],
        "k int, s bigint, e bigint, iid int",
    )
    got = {
        r["iid"]: r["n"]
        for r in range_count(pts, ivs, point="p", start="s", end="e", by="k").collect()
    }
    assert got == {1: 2, 2: 1, 3: 0}


def test_range_count_requires_key_and_rejects_collisions(spark):
    import pytest as _pytest

    from slurm2sql_spark.operators.rangejoin import range_count

    pts = spark.createDataFrame([(1, 10)], "k int, p bigint")
    ivs = spark.createDataFrame([(1, 0, 20, 1)], "k int, s bigint, e bigint, iid int")
    with _pytest.raises(ValueError, match="by"):
        range_count(pts, ivs, point="p", start="s", end="e", by=[])
    bad = pts.withColumnRenamed("p", "iid")
    with _pytest.raises(ValueError, match="collision"):
        range_count(bad, ivs, point="iid", start="s", end="e", by="k")
    # reserved internal spine names on either side hard-error instead of
    # silently shadowing (__ts/__ok/__p/__cnt)
    with _pytest.raises(ValueError, match="reserved"):
        range_count(
            pts.withColumn("__ts", pts.p), ivs,
            point="p", start="s", end="e", by="k",
        )
    with _pytest.raises(ValueError, match="reserved"):
        range_count(
            pts, ivs.withColumn("__cnt", ivs.iid),
            point="p", start="s", end="e", by="k",
        )
    # count_col colliding with an interval payload column would emit a
    # duplicate output name
    with _pytest.raises(ValueError, match="count_col"):
        range_count(
            pts, ivs, point="p", start="s", end="e", by="k", count_col="iid"
        )


def test_range_count_single_shuffle_no_join(spark):
    """Plan contract: no join operator at all — one hash Exchange for
    the window sort plus the final aggregation's."""
    from slurm2sql_spark.operators.rangejoin import range_count

    pts = spark.createDataFrame([(1, 10)], "k int, p bigint")
    ivs = spark.createDataFrame([(1, 0, 20, 1)], "k int, s bigint, e bigint, iid int")
    plan = (
        range_count(pts, ivs, point="p", start="s", end="e", by="k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin",
                "CartesianProduct"):
        assert bad not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_range_count_null_keys_never_match(spark):
    """NULL by-keys must not match (range_join equi-join parity): a
    window PARTITION BY would group NULLs together without the guard."""
    from slurm2sql_spark.operators.rangejoin import range_count

    pts = spark.createDataFrame([(None, 15), (1, 15)], "k int, p bigint")
    ivs = spark.createDataFrame(
        [(None, 10, 20, 1), (1, 10, 20, 2)], "k int, s bigint, e bigint, iid int"
    )
    got = {
        r["iid"]: r["n"]
        for r in range_count(pts, ivs, point="p", start="s", end="e", by="k").collect()
    }
    # NULL-key interval dropped entirely; NULL-key point matches nothing
    assert got == {2: 1}
