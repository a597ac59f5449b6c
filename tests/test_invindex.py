"""Inverted-index postings + positional phrase search
(operators/invindex.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from slurm2sql_spark.operators.invindex import phrase_match_counts, postings


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "cat sat cat sat cat"),          # overlapping bigram grid
        (3, "a a a a"),                      # self-overlapping phrase
        (4, "ends with cat sat"),            # match at the very end
        (5, "cat alone here sat apart"),     # terms present, no phrase
        (6, ""),
        (7, None),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_postings_grain_and_positions(spark, docs):
    post = postings(docs, "doc_id", "text").collect()
    by_doc = {}
    for r in post:
        by_doc.setdefault(r["doc_id"], []).append((r["pos"], r["term"]))
    assert sorted(by_doc[1])[:3] == [(1, "the"), (2, "cat"), (3, "sat")]
    # 1-based, contiguous, one row per token
    assert sorted(p for p, _ in by_doc[2]) == [1, 2, 3, 4, 5]
    # empty text still emits the single empty-string token split()
    # produces; NULL text emits nothing
    assert 7 not in by_doc


def test_phrase_overlap_and_end_of_doc(spark, docs):
    out = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_match_counts(
            docs, "doc_id", "text", ["cat", "sat"]
        ).collect()
    }
    assert out == {1: (1, 2), 2: (2, 1), 4: (1, 3)}
    # self-overlapping phrase: "a a a a" holds THREE "a a" matches
    aa = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_match_counts(
            docs, "doc_id", "text", ["a", "a"]
        ).collect()
    }
    assert aa == {3: (3, 1)}


def test_phrase_three_terms_and_validation(spark, docs):
    out = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_match_counts(
            docs, "doc_id", "text", ["cat", "sat", "cat"]
        ).collect()
    }
    assert out == {2: 2}
    with pytest.raises(ValueError):
        phrase_match_counts(docs, "doc_id", "text", [])


def test_phrase_single_shuffle_plan(spark, docs):
    """The index-shape contract: ONE exchange for a k-term phrase (the
    conditional-collect groupBy), not k-1 self-join exchanges."""
    plan = (
        phrase_match_counts(docs, "doc_id", "text", ["cat", "sat", "cat"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") - plan.count("ReusedExchange") == 1
    assert "Join" not in plan


def test_bucketed_postings_serve_term_lookup_without_exchange(
    spark, docs, tmp_path
):
    """Persisted term-bucketed, the index serves term aggregations with
    zero exchanges — the serving path the catalog entry documents."""
    from slurm2sql_spark.sinks.parquet_sink import write_bucketed

    post = postings(docs, "doc_id", "text")
    write_bucketed(post, "inv_idx_t", str(tmp_path / "idx"), "term", 4)
    try:
        served = (
            spark.table("inv_idx_t")
            .filter(F.col("term") == "cat")
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        plan = served._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert served.collect()[0]["tf"] == 6
    finally:
        spark.sql("DROP TABLE IF EXISTS inv_idx_t")


@pytest.mark.slow
def test_phrase_search_matches_python_scan_property(spark):
    """Property: the index-shaped positional intersection equals a
    naive per-doc Python scan on randomized corpora — including
    repeated-term phrases and self-overlap (hypothesis-driven corpus,
    deterministic seed via the strategy)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    corpora = []
    words = st.sampled_from(["a", "b", "cat", "sat", "x"])

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(st.lists(words, max_size=12), min_size=1, max_size=8),
        st.lists(words, min_size=1, max_size=3),
    )
    def _collect(docs, phrase):
        corpora.append((docs, phrase))

    _collect()
    for docs, phrase in corpora:
        rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        got = {
            r["doc_id"]: (r["n_matches"], r["first_pos"])
            for r in phrase_match_counts(
                df, "doc_id", "text", list(phrase)
            ).collect()
        }
        want = {}
        for i, d in enumerate(docs):
            toks = " ".join(d).strip(" ").split(" ") if d else [""]
            hits = [
                p + 1
                for p in range(len(toks) - len(phrase) + 1)
                if toks[p : p + len(phrase)] == list(phrase)
            ]
            if hits:
                want[i] = (len(hits), hits[0])
        assert got == want, (docs, phrase, got, want)


def test_phrase_multi_equals_per_phrase_union(spark):
    """r14: the batched multi-phrase form (one postings pass) must
    return exactly the per-phrase union — including the overlapping
    'a a' self-phrase and docs matching only one phrase's terms."""
    from slurm2sql_spark.operators.invindex import (
        phrase_match_counts,
        phrase_match_counts_multi,
    )

    rows = [
        (1, "the table holds a value in the table value slot"),
        (2, "a a a"),
        (3, "table without the second word"),
        (4, "value table reversed order"),
        (5, ""),
        (6, "a lone article"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    phrases = [["table", "value"], ["a", "a"]]
    got = sorted(
        tuple(r)
        for r in phrase_match_counts_multi(
            df, "doc_id", "text", phrases
        ).collect()
    )
    want = sorted(
        (" ".join(ph), r["doc_id"], r["n_matches"], r["first_pos"])
        for ph in phrases
        for r in phrase_match_counts(df, "doc_id", "text", ph).collect()
    )
    assert got == want
