"""Inverted-index construction and positional phrase search.

The textbook search-engine pair, expressed Spark-first:

- ``postings``: one row per (term, doc, position) — the index grain.
  Persisted bucketed-by-term (``sinks.parquet_sink.write_bucketed``)
  this is a serving index: a term lookup prunes to one bucket and a
  phrase query joins co-located posting lists with zero exchanges.
- ``phrase_match_counts``: positional phrase query in ONE shuffle.
  Rather than k−1 self-joins on (doc, pos+i) — k−1 exchanges — the
  phrase's k posting lists are collected per document in a single
  conditional groupBy (``collect_list(when(term = t_i, pos))``) and the
  positional intersection runs as an array expression: position p
  matches when every ``pos_i`` list contains ``p + i``. This is
  exactly Lucene's phrase iterator (walk the first term's positions,
  probe the rest at fixed offsets), restated as a set intersection so
  Catalyst keeps it whole-stage. Docs containing no phrase term are
  dropped BEFORE the shuffle by the term filter on the exploded grain,
  so the exchange moves only candidate documents.

Scale contract: explode fan-out is bounded by tokens/doc; the filter
to the k phrase terms kills the non-candidate tail before the one
hash-partitioned aggregation; per-doc posting arrays are bounded by
in-doc term frequency. No self-join, no skew key (doc_id grain), no
driver collect. At 100 TB the same plan holds — the candidate set
after the term filter is the only thing that shuffles.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from slurm2sql_spark.operators.dedup import _WS_RE2

__all__ = [
    "postings",
    "phrase_match_counts",
    "phrase_match_counts_multi",
]


def _tokens(text_col: str) -> Column:
    return F.split(F.trim(F.col(text_col)), _WS_RE2)


def postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(term, doc, pos) posting rows; ``pos`` is the 1-based token
    offset (the convention positional indexes ship — Lucene, CW09).
    RE2-class whitespace tokenization, parity with every other
    tokenizer in the package (operators/dedup.py:_WS_RE2)."""
    tok = F.posexplode(_tokens(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"), tok.alias("pos0", "term")
    ).select("term", "doc_id", (F.col("pos0") + 1).alias("pos"))


def phrase_match_counts(
    df: DataFrame, id_col: str, text_col: str, phrase: list[str]
) -> DataFrame:
    """Docs containing the exact token sequence ``phrase``, with the
    number of (possibly overlapping) occurrences and the first match's
    1-based token position. One shuffle end-to-end (see module doc)."""
    if not phrase:
        raise ValueError("phrase must contain at least one term")
    post = postings(df, id_col, text_col)
    cand = post.filter(F.col("term").isin(list(set(phrase))))
    lists = cand.groupBy("doc_id").agg(
        *[
            F.collect_list(
                F.when(F.col("term") == t, F.col("pos"))
            ).alias(f"p{i}")
            for i, t in enumerate(phrase)
        ]
    )
    # position p starts a match when every term i's list holds p+i
    match_pos = F.filter(
        F.col("p0"),
        lambda p: reduce(
            lambda acc, i: acc
            & F.array_contains(F.col(f"p{i}"), p + F.lit(i)),
            range(1, len(phrase)),
            F.lit(True),
        ),
    )
    return (
        lists.select(
            "doc_id",
            F.size(match_pos).alias("n_matches"),
            F.array_min(match_pos).alias("first_pos"),
        )
        .filter(F.col("n_matches") > 0)
    )


def phrase_match_counts_multi(
    df: DataFrame, id_col: str, text_col: str, phrases: list[list[str]]
) -> DataFrame:
    """Every phrase in ``phrases`` against ONE postings pass — the
    multi-query batch shape: a single corpus tokenize + posexplode, a
    single candidate-term filter (the union of all phrases' terms),
    ONE per-doc grouping with one position list per DISTINCT term, and
    then each phrase's positional intersection as a whole-stage array
    expression over the shared lists (r14: the per-phrase form paid a
    full scan + shuffle PER phrase; sharing the postings pass is the
    batch-lookup posture a 100 TB serving index runs anyway).

    Returns ``(phrase, doc_id, n_matches, first_pos)`` — identical
    rows to unioning :func:`phrase_match_counts` per phrase (a doc
    matching only another phrase's terms yields empty lists, zero
    matches, and is filtered the same way).
    """
    if not phrases or any(not p for p in phrases):
        raise ValueError("phrases must be non-empty lists of terms")
    terms = sorted({t for p in phrases for t in p})
    idx = {t: i for i, t in enumerate(terms)}
    post = postings(df, id_col, text_col)
    cand = post.filter(F.col("term").isin(terms))
    lists = cand.groupBy("doc_id").agg(
        *[
            F.collect_list(
                F.when(F.col("term") == t, F.col("pos"))
            ).alias(f"t{i}")
            for i, t in enumerate(terms)
        ]
    )
    def _match_pos(ph):
        # a def, not a default-arg lambda: F.filter dispatches on the
        # lambda's ARITY (a 2-parameter lambda gets the element index
        # as its second argument)
        return F.filter(
            F.col(f"t{idx[ph[0]]}"),
            lambda p: reduce(
                lambda acc, i: acc
                & F.array_contains(F.col(f"t{idx[ph[i]]}"), p + F.lit(i)),
                range(1, len(ph)),
                F.lit(True),
            ),
        )

    outs = []
    for ph in phrases:
        match_pos = _match_pos(ph)
        outs.append(
            F.struct(
                F.lit(" ".join(ph)).alias("phrase"),
                F.size(match_pos).alias("n_matches"),
                F.array_min(match_pos).alias("first_pos"),
            )
        )
    return (
        lists.select("doc_id", F.explode(F.array(*outs)).alias("m"))
        .select(
            "m.phrase",
            "doc_id",
            "m.n_matches",
            "m.first_pos",
        )
        .filter(F.col("n_matches") > 0)
    )
