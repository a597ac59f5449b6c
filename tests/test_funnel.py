"""Ordered funnel conversion (operators/funnel.py)."""

from __future__ import annotations

import pytest

from slurm2sql_spark.operators.funnel import funnel_stages


def _run(spark, rows, stages=("view", "click", "purchase")):
    ev = spark.createDataFrame(
        rows, "user_id int, event_type string, t long, event_id int"
    )
    out = funnel_stages(
        ev, "user_id", "event_type", ["t", "event_id"], list(stages)
    ).collect()[0]
    return {k: out[k] for k in out.asDict()}


def test_funnel_ordering_constraint(spark):
    rows = [
        # user 1: full ordered funnel
        (1, "view", 10, 1), (1, "click", 20, 2), (1, "purchase", 30, 3),
        # user 2: purchase BEFORE view -> only view converts
        (2, "purchase", 5, 4), (2, "view", 10, 5), (2, "click", 20, 6),
        # user 3: click before view -> view only
        (3, "click", 5, 7), (3, "view", 10, 8),
        # user 4: no funnel events at all
        (4, "error", 10, 9),
        # user 5: view -> purchase (skipped click): purchase must NOT count
        (5, "view", 10, 10), (5, "purchase", 20, 11),
    ]
    out = _run(spark, rows)
    assert out == {
        "n_users": 5,
        "reached_view": 4,
        "reached_click": 2,
        "reached_purchase": 1,
    }


def test_funnel_same_timestamp_ties_break_on_event_id(spark):
    # same ts: event_id order decides "after"
    rows = [
        (1, "view", 10, 1), (1, "click", 10, 2),   # click after view: ok
        (2, "click", 10, 1), (2, "view", 10, 2),   # click before view: no
    ]
    out = _run(spark, rows, stages=("view", "click"))
    assert out == {"n_users": 2, "reached_view": 2, "reached_click": 1}


def test_funnel_single_shuffle_plan(spark):
    rows = [(1, "view", 10, 1), (1, "click", 20, 2)]
    ev = spark.createDataFrame(
        rows, "user_id int, event_type string, t long, event_id int"
    )
    df = funnel_stages(
        ev, "user_id", "event_type", ["t", "event_id"],
        ["view", "click", "purchase"],
    )
    plan = (
        df._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    # one exchange for the user-partitioned sort; the final 1-row agg
    # adds a single-partition exchange — no self-joins anywhere
    assert "Join" not in plan
    assert plan.count("Exchange") - plan.count("ReusedExchange") <= 2


def test_funnel_validation(spark):
    ev = spark.createDataFrame(
        [(1, "view", 10, 1)],
        "user_id int, event_type string, t long, event_id int",
    )
    with pytest.raises(ValueError):
        funnel_stages(ev, "user_id", "event_type", ["t"], [])


@pytest.mark.slow
def test_funnel_matches_python_scan_property(spark):
    """Property: the chained-window funnel equals a naive per-user
    ordered Python scan on randomized event streams."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    cases = []
    ev_t = st.sampled_from(["view", "click", "purchase", "error"])

    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(1, 4), ev_t, st.integers(0, 20)),
            min_size=1,
            max_size=25,
        )
    )
    def _collect(evs):
        cases.append(evs)

    _collect()
    stages = ["view", "click", "purchase"]
    for evs in cases:
        rows = [(u, t, ts, i) for i, (u, t, ts) in enumerate(evs)]
        ev = spark.createDataFrame(
            rows, "user_id int, event_type string, t long, event_id int"
        )
        out = funnel_stages(
            ev, "user_id", "event_type", ["t", "event_id"], stages
        ).collect()[0]
        # reference: per-user ordered scan carrying the reached set
        per_user = {}
        for u, t, ts, i in sorted(rows, key=lambda r: (r[2], r[3])):
            reached = per_user.setdefault(u, set())
            for k, stage in enumerate(stages):
                if t == stage and (k == 0 or k - 1 in reached):
                    reached.add(k)
        want = {
            "n_users": len(per_user),
            **{
                f"reached_{s}": sum(
                    1 for r in per_user.values() if k in r
                )
                for k, s in enumerate(stages)
            },
        }
        got = {k: out[k] for k in out.asDict()}
        assert got == want, (rows, got, want)
