"""End-to-end corpus curation: the composed quality -> dedup ->
decontaminate pass a training-data pipeline ships, with per-document
stage attribution.

Reference analog: none — the reference stops at per-job filtering
(slurm2sql.py:214 ``-easy`` philosophy); this composes the engine's
curation operators (textstats.quality_filter, dedup.exact_dedup,
dedup.decontaminate) into the decision pipeline those operators exist
for. Each stage keeps its own scale posture: the quality gate is a
scan-stage projection, dedup shuffles 16-byte content hashes once,
decontamination shingles the quality-passing corpus against the
BROADCAST benchmark (exchange-free on the corpus side), and the
verdicts re-join on narrow (id, flag) frames — document text never
rides an exchange anywhere in the composition (r14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["curate"]


def curate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    decontaminate_hint: str = "broadcast",
    quality: str = "gopher",
    **thresholds: float,
) -> DataFrame:
    """Per-document curation verdict over ``corpus``: ``status`` in
    ``{'quality', 'duplicate', 'contaminated', 'kept'}``, FIRST failing
    stage wins.

    - ``quality``: fails the selected rule family — ``quality=
      "gopher"`` scores with :func:`~slurm2sql_spark.operators.
      textstats.quality_filter` (default), ``quality="c4"`` CLEANS
      with :func:`~slurm2sql_spark.operators.textstats.c4_filter`
      first, so dedup and decontamination then run on the cleaned
      text (``thresholds`` forward to the chosen family).
    - ``duplicate``: not the min-id representative of its
      normalized-content class AMONG quality-passing documents (a
      duplicate of a quality-failing doc reports ``quality`` — the
      pipeline never even hashes docs the gate dropped).
    - ``contaminated``: the representative shares >= 1 ``n``-gram
      shingle with ``benchmark`` text.
    - ``kept``: survives all three.

    Every non-id input column is preserved alongside ``status``
    except ``text_col`` (pass-through columns ride the quality stage's
    ``keep_cols``). Deterministic and engine-portable — the catalog's
    ``curation_pipeline`` entry verifies this exact composition against
    a DuckDB twin built from the per-stage oracle fragments.
    """
    from .dedup import decontaminate, exact_dedup, normalize_text
    from .textstats import c4_filter, quality_filter

    passthrough = tuple(
        c for c in corpus.columns if c not in (id_col, text_col)
    )
    if quality == "gopher":
        qf = quality_filter(
            corpus,
            id_col,
            text_col,
            keep_cols=passthrough + (text_col,),
            **thresholds,
        ).select(id_col, *passthrough, text_col, "keep")
    elif quality == "c4":
        # C4 REWRITES the text (line-level cleaning), so downstream
        # dedup/decontamination run on the CLEANED text — the real
        # pipeline order for this family
        cleaned = c4_filter(corpus, id_col, text_col, **thresholds)
        qf = (
            corpus.select(id_col, *passthrough)
            .join(cleaned.select(id_col, text_col, "keep"), id_col)
            .select(id_col, *passthrough, text_col, "keep")
        )
    else:
        raise ValueError(f"unknown quality family {quality!r}")
    passed = qf.filter(F.col("keep"))
    classes = exact_dedup(passed, id_col, text_col).select(
        F.col("content_hash").alias("_h"), "keep_id"
    )
    # narrow (id, hash) join — document text NEVER rides an exchange:
    # the old form joined the full passed corpus (text included) to
    # classes on _h just to read back rep texts (r14)
    keep_ids = (
        passed.select(
            F.col(id_col),
            F.md5(normalize_text(F.col(text_col))).alias("_h"),
        )
        .join(classes, "_h")
        .select(id_col, "keep_id")
    )
    # decontaminate ALL quality-passing docs, not just the reps: the
    # status chain reports 'duplicate' before 'contaminated', so the
    # verdicts are identical, and with the broadcast benchmark the
    # corpus side streams through shingling with NO exchange — where
    # the rep-only form had to move every passed document's text
    # through the hash join first
    hits = decontaminate(
        passed.select(id_col, text_col),
        benchmark,
        id_col,
        text_col,
        n=n,
        hint=decontaminate_hint or "auto",
    ).select(F.col("id").alias(id_col), F.lit(True).alias("_hit"))
    return (
        qf.select(id_col, *passthrough, "keep")
        .join(keep_ids, id_col, "left")
        .join(hits, id_col, "left")
        .select(
            id_col,
            *passthrough,
            F.when(~F.col("keep"), F.lit("quality"))
            .when(F.col(id_col) != F.col("keep_id"), F.lit("duplicate"))
            .when(F.col("_hit"), F.lit("contaminated"))
            .otherwise(F.lit("kept"))
            .alias("status"),
        )
    )
