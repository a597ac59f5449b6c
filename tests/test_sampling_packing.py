"""Training-data sampling / domain mixing / sequence packing operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_deterministic_sample_is_reproducible_and_unbiased(spark):
    from slurm2sql_spark.operators.sampling import deterministic_sample

    df = spark.range(20000).select(F.col("id").alias("doc_id"))
    a = set(r.doc_id for r in deterministic_sample(df, "doc_id", 0.3).collect())
    b = set(r.doc_id for r in deterministic_sample(df, "doc_id", 0.3).collect())
    assert a == b  # content-addressed: identical across runs
    assert 0.27 < len(a) / 20000 < 0.33  # unbiased within tolerance

    # repartitioning must not change membership (df.sample would)
    c = set(
        r.doc_id
        for r in deterministic_sample(df.repartition(7), "doc_id", 0.3).collect()
    )
    assert c == a

    # a different salt draws a statistically independent subset
    d = set(
        r.doc_id
        for r in deterministic_sample(df, "doc_id", 0.3, salt="x").collect()
    )
    overlap = len(a & d) / 20000
    assert 0.06 < overlap < 0.12  # ~0.09 expected
    assert d != a


def test_deterministic_sample_strata(spark):
    from slurm2sql_spark.operators.sampling import deterministic_sample

    df = spark.range(10000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    out = deterministic_sample(
        df, "doc_id", strata_col="lang",
        strata_fractions={"en": 0.5, "de": 0.1},
    )
    rates = {
        r.lang: r.n / 5000
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert 0.45 < rates["en"] < 0.55
    assert 0.07 < rates["de"] < 0.13
    # absent stratum -> dropped
    assert set(rates) == {"en", "de"}

    with pytest.raises(ValueError):
        deterministic_sample(df, "doc_id", strata_fractions={"en": 1.0})
    with pytest.raises(ValueError):
        deterministic_sample(df, "doc_id")


def test_mix_fractions_max_retention(spark):
    from slurm2sql_spark.operators.sampling import mix_fractions

    rows = (
        [("web",)] * 600 + [("code",)] * 300 + [("wiki",)] * 100
    )
    df = spark.createDataFrame(rows, "source string")
    out = {
        r.stratum: (r.n, r.fraction)
        for r in mix_fractions(
            df, "source", {"web": 0.5, "code": 0.3, "wiki": 0.2}
        ).collect()
    }
    # R = min(600/500, 300/300, 100/200) = 0.5 -> wiki binds at 1.0
    assert out["wiki"] == (100, 1.0)
    assert out["code"][1] == pytest.approx(0.5, abs=1e-6)
    assert out["web"][1] == pytest.approx(0.5 * 0.5 * 1000 / 600, abs=1e-5)
    # achieved mix matches the target exactly (expected counts)
    kept = {s: n * f for s, (n, f) in out.items()}
    total = sum(kept.values())
    assert kept["web"] / total == pytest.approx(0.5, abs=1e-4)
    assert kept["wiki"] / total == pytest.approx(0.2, abs=1e-4)


def test_pack_sequences_contiguous_chunking(spark):
    from slurm2sql_spark.operators.packing import pack_sequences

    rows = [
        # shard a: 40 + 70 + 30 + 80 tokens, budget 100
        (1, 40, "a"), (2, 70, "a"), (3, 30, "a"), (4, 80, "a"),
        # shard b: one doc longer than the budget spans bins
        (5, 250, "b"), (6, 10, "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long, src string")
    out = {
        r.id: (r.shard, r.offset, r.bin)
        for r in pack_sequences(df, "doc_id", "n_tok", 100, "src").collect()
    }
    assert out[1] == ("a", 0, 0)
    assert out[2] == ("a", 40, 0)    # starts inside bin 0, straddles
    assert out[3] == ("a", 110, 1)
    assert out[4] == ("a", 140, 1)
    assert out[5] == ("b", 0, 0)     # long doc starts bin 0
    assert out[6] == ("b", 250, 2)   # next doc lands after the span

    # placement is independent of input partitioning
    out2 = {
        r.id: (r.shard, r.offset, r.bin)
        for r in pack_sequences(
            df.repartition(5), "doc_id", "n_tok", 100, "src"
        ).collect()
    }
    assert out2 == out


def test_sample_exact_k(spark):
    from slurm2sql_spark.operators.sampling import sample_exact_k

    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(200)], "id long, s string"
    )
    out = sample_exact_k(df, "id", k=10, strata_col="s")
    rows = out.collect()
    by_s: dict = {}
    for r in rows:
        by_s.setdefault(r["s"], set()).add(r["id"])
    assert {k: len(v) for k, v in by_s.items()} == {"a": 10, "b": 10}
    # deterministic under repartitioning
    again = sample_exact_k(df.repartition(7), "id", k=10, strata_col="s")
    assert {(r["s"], r["id"]) for r in again.collect()} == {
        (r["s"], r["id"]) for r in rows
    }
    # short stratum keeps everything
    small = sample_exact_k(df.filter(F.col("id") < 5), "id", k=10)
    assert small.count() == 5


def test_split_assign_stable_and_leakage_free(spark):
    from slurm2sql_spark.operators.sampling import split_assign

    df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    full = {r["id"]: r["split"] for r in split_assign(df, "id", splits).collect()}
    # rates roughly honored
    from collections import Counter

    c = Counter(full.values())
    assert abs(c["train"] / 2000 - 0.8) < 0.05
    assert None not in c  # fractions sum to 1.0 -> no holdout
    # growing the corpus NEVER moves an existing row's split
    grown = spark.createDataFrame([(i,) for i in range(4000)], "id long")
    gfull = {
        r["id"]: r["split"] for r in split_assign(grown, "id", splits).collect()
    }
    assert all(gfull[i] == s for i, s in full.items())
    # remainder becomes an explicit NULL holdout
    part = {r["id"]: r["split"]
            for r in split_assign(df, "id", {"train": 0.5}).collect()}
    assert sum(1 for v in part.values() if v is None) > 0
    with pytest.raises(ValueError, match="> 1"):
        split_assign(df, "id", {"a": 0.9, "b": 0.2})


def _dsir_corpora(spark):
    """Target speaks 'chemistry'; half the raw docs do too, the other
    half speak an unrelated vocabulary."""
    target = spark.createDataFrame(
        [(1000 + i,
          "the reaction yields a stable molecule under acid catalysis")
         for i in range(10)],
        "doc_id long, text string",
    )
    on = [(i, "acid catalysis of the molecule gives a stable reaction")
          for i in range(20)]
    off = [(100 + i, "stadium crowd cheers loudly as the striker scores")
           for i in range(20)]
    raw = spark.createDataFrame(on + off, "doc_id long, text string")
    return raw, target


def test_dsir_weights_rank_in_distribution_docs_first(spark):
    from slurm2sql_spark.operators.sampling import dsir_weights

    raw, target = _dsir_corpora(spark)
    w = {r["doc_id"]: r["logw"]
         for r in dsir_weights(raw, target, "doc_id", "text", m=512).collect()}
    assert len(w) == 40
    worst_on = min(v for k, v in w.items() if k < 100)
    best_off = max(v for k, v in w.items() if k >= 100)
    assert worst_on > best_off  # every on-distribution doc outranks all off


def test_dsir_select_membership_and_determinism(spark):
    from slurm2sql_spark.operators.sampling import dsir_select

    raw, target = _dsir_corpora(spark)
    sel = dsir_select(raw, target, "doc_id", "text", k=20, m=512)
    ids = [r["doc_id"] for r in sel.collect()]
    assert len(ids) == 20
    # Gumbel noise spread is O(1); the planted weight gap is >> that,
    # so the selection is dominated by the on-distribution docs
    assert sum(1 for i in ids if i < 100) >= 18
    # content-addressed: identical on re-run and under repartitioning
    again = [r["doc_id"]
             for r in dsir_select(raw.repartition(7), target, "doc_id",
                                  "text", k=20, m=512).collect()]
    assert ids == again


def test_dsir_ratio_join_is_broadcast_and_aggs_partial(spark):
    """Scale contract: the m-row bin-ratio table must broadcast to the
    corpus occurrence stream (never a shuffled join of the corpus on
    the bin key), and no Window appears anywhere."""
    from slurm2sql_spark.operators.sampling import dsir_weights

    raw, target = _dsir_corpora(spark)
    plan = dsir_weights(
        raw, target, "doc_id", "text", m=512
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan.split("BroadcastHashJoin")[0]
    assert "Window" not in plan
    # the per-doc sum and bin counts are partial-aggregable
    assert "partial_sum" in plan or "HashAggregate" in plan


def test_dsir_validates_m(spark):
    from slurm2sql_spark.operators.sampling import dsir_weights

    raw, target = _dsir_corpora(spark)
    with pytest.raises(ValueError, match="m must be positive"):
        dsir_weights(raw, target, "doc_id", "text", m=0)


def test_mix_temperature_limits_and_flattening(spark):
    from slurm2sql_spark.operators.sampling import mix_temperature

    df = spark.createDataFrame(
        [(i, "big" if i < 900 else ("mid" if i < 990 else "small"))
         for i in range(1000)],
        "id long, src string",
    )
    # T=1: natural proportions are already the target -> keep everything
    t1 = {r["stratum"]: r for r in mix_temperature(df, "src", 1.0).collect()}
    assert all(abs(r["fraction"] - 1.0) < 1e-6 for r in t1.values())
    assert abs(t1["big"]["target"] - 0.9) < 1e-5
    # T=4 flattens: the smallest stratum binds at 1.0, the biggest is
    # cut hardest, and targets are closer to uniform than natural
    t4 = {r["stratum"]: r for r in mix_temperature(df, "src", 4.0).collect()}
    assert t4["small"]["fraction"] == 1.0
    assert t4["big"]["fraction"] < t4["mid"]["fraction"] < 1.0
    assert t4["big"]["target"] < 0.9 and t4["small"]["target"] > 0.01
    # targets always sum to ~1
    assert abs(sum(r["target"] for r in t4.values()) - 1.0) < 1e-4
    import pytest as _pytest

    with _pytest.raises(ValueError, match="temperature must be positive"):
        mix_temperature(df, "src", 0.0)


def test_new_r9_operators_handle_empty_inputs(spark):
    """Empty corpora must yield empty (or all-kept) results, not
    crashes — the first thing a scheduled pipeline hits on a quiet
    ingest day."""
    from slurm2sql_spark.operators.curation import curate
    from slurm2sql_spark.operators.dedup import scrub_paragraphs
    from slurm2sql_spark.operators.sampling import (
        dsir_select,
        mix_temperature,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    target = spark.createDataFrame(
        [(1, "some target text here")], "doc_id long, text string"
    )
    assert dsir_select(empty, target, "doc_id", "text", k=5).count() == 0
    # empty TARGET: smoothing keeps weights defined for every raw doc
    assert dsir_select(target, empty, "doc_id", "text", k=5).count() == 1
    assert mix_temperature(empty, "text", 2.0).count() == 0
    bl = spark.createDataFrame([], "para_hash string")
    out = scrub_paragraphs(target, "doc_id", "text", bl).collect()
    assert len(out) == 1 and out[0]["n_removed"] == 0
    assert curate(empty, target, "doc_id", "text").count() == 0


def test_lm_perplexity_ranks_reference_like_docs_lower(spark):
    """CCNet contract: a raw document drawn from the reference LM's
    vocabulary must score LOWER log-perplexity than an out-of-
    distribution document; n_grams counts unigrams + bigrams."""
    from slurm2sql_spark.operators.sampling import lm_perplexity

    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat near the cat door") for i in range(100, 110)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),       # in-distribution
            (2, "zqxv wvvk pllm trrg bnnm qq"),  # out-of-distribution
            # empty text: split('') -> [''] on BOTH engines (the DSIR
            # featurization convention) -> one out-of-vocab '' gram
            (3, ""),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in lm_perplexity(raw, ref, "doc_id", "text", m=1024).collect()
    }
    assert set(rows) == {1, 2, 3}
    assert rows[3]["n_grams"] == 1
    assert rows[1]["logppl"] < rows[2]["logppl"]
    # 6 unigrams + 5 bigrams
    assert rows[1]["n_grams"] == 11
    # perplexities are positive cross-entropies in nats
    assert rows[1]["logppl"] > 0


def test_lm_perplexity_reference_table_broadcasts(spark):
    """Scale contract (sampling.py:244): the per-doc scoring join must
    broadcast the m-bounded reference bin table, never shuffle the
    corpus side."""
    from slurm2sql_spark.operators.sampling import lm_perplexity

    ref = spark.createDataFrame(
        [(i, f"word{i} common text body") for i in range(20)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(i, f"doc body number {i}") for i in range(30)],
        "doc_id long, text string",
    )
    plan = (
        lm_perplexity(raw, ref, "doc_id", "text", m=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    # the only SortMergeJoin-free contract: no corpus-keyed shuffle join
    assert "SortMergeJoin" not in plan


def test_mw_rounds_uniform_losses_stay_uniform():
    from slurm2sql_spark.operators.sampling import mw_rounds

    w = mw_rounds([("a", 2.0), ("b", 2.0), ("c", 2.0)], rounds=5)
    assert len(set(w.values())) == 1
    assert abs(sum(w.values()) - 1.0) < 1e-4


def test_mw_rounds_high_loss_domain_gains_weight():
    from slurm2sql_spark.operators.sampling import mw_rounds

    # mid and hi both sit above the round-1 weighted mean (~2.2), so
    # both gain -- hi more; lo (below the mean every round) only decays
    w = mw_rounds([("lo", 1.0), ("mid", 2.6), ("hi", 3.0)], rounds=5)
    assert w["hi"] > w["mid"] > w["lo"]
    # smoothing floor: no domain collapses to zero
    assert w["lo"] >= 0.01 / 3
    assert abs(sum(w.values()) - 1.0) < 1e-4
    # monotone in rounds: more rounds, more concentration on 'hi'
    w1 = mw_rounds([("lo", 1.0), ("mid", 2.6), ("hi", 3.0)], rounds=1)
    assert w["hi"] > w1["hi"]


def test_mw_rounds_empty():
    from slurm2sql_spark.operators.sampling import mw_rounds

    assert mw_rounds([]) == {}


def test_domain_reweight_partitioning_invariant(spark):
    from slurm2sql_spark.operators.sampling import domain_reweight

    rows = [("a", 1.5, 10), ("b", 3.0, 20), ("c", 2.6, 30)]
    loss = spark.createDataFrame(
        rows, "source string, loss double, n_docs long"
    )
    out1 = {
        r["source"]: r["weight"]
        for r in domain_reweight(loss, "source", "loss").collect()
    }
    out2 = {
        r["source"]: r["weight"]
        for r in domain_reweight(
            loss.repartition(7), "source", "loss"
        ).collect()
    }
    assert out1 == out2
    assert out1["b"] > out1["c"] > out1["a"]


def test_reweighted_sample_composition_invariants(spark):
    from slurm2sql_spark.catalog import QUERIES

    rows = QUERIES["reweighted_sample"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    by_src = {r["source"]: r for r in rows}
    assert "src0" not in by_src  # the reference stratum never samples
    binding = [r for r in rows if r["fraction"] == 1.0]
    assert binding, "downsample-only: some stratum must keep everything"
    for r in rows:
        assert 0.0 < r["fraction"] <= 1.0
        assert 0 <= r["n_kept"] <= r["n_total"]
        if r["fraction"] == 1.0:
            assert r["n_kept"] == r["n_total"]
        # content-addressed buckets: kept count concentrates near
        # fraction * n (binomial-ish, wide slack for tiny strata)
        exp = r["fraction"] * r["n_total"]
        assert abs(r["n_kept"] - exp) <= max(6.0, 0.6 * exp)
