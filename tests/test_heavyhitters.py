"""Two-stage exact heavy hitters (operators/heavyhitters.py): the
memory-bounded escape hatch the exact single-pass aggregates document
(ngram_heavy_hitters' two-stage candidate protocol, made real)."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from slurm2sql_spark.operators.heavyhitters import (
    exact_topk_from_summaries,
    heavy_hitters_exact_topk,
    misra_gries_summaries,
)


def _corpus(spark, seed=7, n=20_000, vocab=400, zipf=1.4):
    rnd = random.Random(seed)
    weights = [1.0 / (i + 1) ** zipf for i in range(vocab)]
    items = rnd.choices([f"w{i}" for i in range(vocab)], weights, k=n)
    return spark.createDataFrame([(x,) for x in items], "item string")


def _exact_topk(df, k):
    rows = (
        df.groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return sorted(
        ((r["item"], r["n"]) for r in rows),
        key=lambda t: (-t[1], hashlib.md5(t[0].encode()).hexdigest()),
    )[:k]


def test_exact_topk_matches_groupby(spark):
    df = _corpus(spark)
    got = [
        (r["item"], r["n"])
        for r in heavy_hitters_exact_topk(df, "item", k=25, m=512).collect()
    ]
    assert got == _exact_topk(df, 25)


def test_fewer_distinct_than_k_is_trivially_exact(spark):
    df = spark.createDataFrame(
        [("a",), ("b",), ("a",), ("c",)], "item string"
    )
    got = [
        (r["item"], r["n"])
        for r in heavy_hitters_exact_topk(df, "item", k=10, m=64).collect()
    ]
    assert got == _exact_topk(df, 10)
    assert len(got) == 3


def test_small_m_returns_exact_or_raises(spark):
    """Exactness is structural: whenever the protocol RETURNS, the
    answer equals the full groupBy — a starved m may only raise."""
    df = _corpus(spark, seed=11, n=10_000, vocab=1500, zipf=1.1)
    want = _exact_topk(df, 10)
    try:
        got = [
            (r["item"], r["n"])
            for r in heavy_hitters_exact_topk(
                df, "item", k=10, m=32
            ).collect()
        ]
    except ValueError as e:
        assert "raise m" in str(e)
    else:
        assert got == want


def test_candidate_budget_raises_on_starved_m(spark):
    # near-uniform high-cardinality: tiny m cannot prune, the
    # candidate budget must refuse rather than re-create the blowup
    df = _corpus(spark, seed=3, n=8_000, vocab=4000, zipf=0.1)
    with pytest.raises(ValueError, match="raise m"):
        heavy_hitters_exact_topk(df, "item", k=5, m=8, max_candidates=16)


def test_absent_item_corner_never_returns_wrong_topk(spark):
    """ADVICE r14 #1 reproduction: one partition [a x5, b, c, d],
    m=2, k=2. The merged summary is {a:...} with D >= 1 and T <= D,
    so the true #2 item (c by md5 tie-break, count 1) is ABSENT from
    the summary and can never be a candidate. The protocol used to
    return [(a,5),(d,1)] — wrong — it must now raise instead (the
    k-th exact candidate count cannot beat D)."""
    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",), ("c",), ("d",)], "item string"
    ).coalesce(1)
    want = _exact_topk(df, 2)
    try:
        got = [
            (r["item"], r["n"])
            for r in heavy_hitters_exact_topk(df, "item", k=2, m=2).collect()
        ]
    except ValueError as e:
        assert "raise m" in str(e)
    else:
        assert got == want
    # and a sufficient m on the same data returns the exact answer
    ok = [
        (r["item"], r["n"])
        for r in heavy_hitters_exact_topk(df, "item", k=2, m=8).collect()
    ]
    assert ok == want


@pytest.mark.slow
def test_tied_kth_at_error_bound_raises_not_lies(spark):
    """Property sweep of the T <= D regime: for several skewed
    single-partition corpora with starved m, the protocol either
    raises or returns the exact md5-tie-broken top-k — never a
    silently wrong set."""
    for seed in (1, 2, 3, 4, 5):
        df = _corpus(spark, seed=seed, n=2_000, vocab=900, zipf=0.8)
        df = df.coalesce(1)
        want = _exact_topk(df, 5)
        try:
            got = [
                (r["item"], r["n"])
                for r in heavy_hitters_exact_topk(
                    df, "item", k=5, m=16
                ).collect()
            ]
        except ValueError as e:
            assert "raise m" in str(e)
        else:
            assert got == want, f"seed {seed}"


@pytest.mark.slow
def test_mg_bounds_hold_across_multi_batch_prunes(spark):
    """r15 regression: with prunes interleaved between Arrow batches
    IN ONE TASK, every counter must still satisfy mg <= true <= mg+D.
    (A stale dict-method binding once survived _mg_prune's dict
    replacement and re-added pre-prune counts — inflating mg past
    true and returning a wrong top-k at x100 URL grain. Forcing tiny
    Arrow batches on a single partition reproduces that interleaving
    at pytest scale.)"""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "500")
    try:
        # skewed head + wide tail, ONE partition, many 500-row batches
        df = _corpus(spark, seed=9, n=20_000, vocab=3_000, zipf=0.9)
        df = df.coalesce(1)
        true = {
            r["item"]: r["n"]
            for r in df.groupBy("item")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        s = misra_gries_summaries(df, "item", m=256)
        merged = {
            r["item"]: (r["mg"], r["d"])
            for r in s.groupBy("item")
            .agg(F.sum("mg").alias("mg"), F.sum("d").alias("d"))
            .collect()
        }
        D = merged.pop(None)[1]
        assert D > 0  # prunes actually happened
        for item, n in true.items():
            mg = merged.get(item, (0, 0))[0]
            assert mg <= n <= mg + D, (item, mg, n, D)
        # and the full protocol returns the exact top-k (or raises)
        want = _exact_topk(df, 10)
        try:
            got = [
                (r["item"], r["n"])
                for r in heavy_hitters_exact_topk(
                    df, "item", k=10, m=256
                ).collect()
            ]
        except ValueError as e:
            assert "raise m" in str(e)
        else:
            assert got == want
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_mg_merge_bounds_hold(spark):
    """Merged summary invariant: mg(x) <= true(x) <= mg(x) + D for
    every item (absent items count as mg 0)."""
    df = _corpus(spark, seed=5, n=5_000, vocab=300, zipf=1.0)
    true = {
        r["item"]: r["n"]
        for r in df.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    s = misra_gries_summaries(df, "item", m=64)
    merged = {
        r["item"]: (r["mg"], r["d"])
        for r in s.groupBy("item")
        .agg(F.sum("mg").alias("mg"), F.sum("d").alias("d"))
        .collect()
    }
    D = merged.pop(None)[1]
    for item, n in true.items():
        mg = merged.get(item, (0, 0))[0]
        assert mg <= n <= mg + D, (item, mg, n, D)


def test_summaries_merge_across_splits_like_across_tasks(spark):
    """Mergeable-summaries claim (the streaming entry's foundation):
    summaries computed on DISJOINT SPLITS of the corpus, unioned and
    fed to exact_topk_from_summaries with a full-corpus rescan, give
    the exact top-k — identical to the one-job protocol. D sums over
    every (task x split) sentinel."""
    df = _corpus(spark, seed=21, n=15_000, vocab=700, zipf=1.2)
    want = _exact_topk(df, 15)
    halves = [
        df.filter(F.md5("item").substr(1, 1) < "8"),
        df.filter(F.md5("item").substr(1, 1) >= "8"),
    ]
    summaries = misra_gries_summaries(halves[0], "item", m=512).unionAll(
        misra_gries_summaries(halves[1], "item", m=512)
    )
    got = [
        (r["item"], r["n"])
        for r in exact_topk_from_summaries(
            summaries, df, "item", k=15
        ).collect()
    ]
    assert got == want


def test_high_cardinality_vocabulary_stays_bounded(spark):
    """The regime the protocol exists for: a skewed head over a
    LARGE distinct-item tail (~100k distinct here). Per-task state is
    m counters regardless; the candidate set stays near k; and the
    result still equals the exact aggregate."""
    from pyspark.sql import functions as F2

    # 60k head rows over 30 hot items + 100k unique-tail rows,
    # deterministic (seeded by row id, no RNG)
    head = spark.range(60_000).select(
        F2.concat(F2.lit("hot"), (F2.col("id") % 30).cast("string")).alias(
            "item"
        )
    )
    tail = spark.range(100_000).select(
        F2.concat(F2.lit("u"), F2.col("id").cast("string")).alias("item")
    )
    df = head.unionAll(tail).repartition(16)
    got = [
        (r["item"], r["n"])
        for r in heavy_hitters_exact_topk(df, "item", k=20, m=2048).collect()
    ]
    assert got == _exact_topk(df, 20)
    # every winner is a head item with its exact count (60000/30)
    assert all(item.startswith("hot") and n == 2000 for item, n in got)
