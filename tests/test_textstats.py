"""Text analysis operator tests."""

from __future__ import annotations

import pytest


def test_text_profile(spark):
    from slurm2sql_spark.operators.textstats import text_profile

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the dog is that"),
            (2, "el gato que se sienta en la alfombra y los perros"),
            (3, "xyzzy plugh plover"),
            (4, "le chat est sur les toits et un chien"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text_profile(df, "doc_id", "text").collect()}
    assert rows[1]["lang_pred"] == "en"
    assert rows[2]["lang_pred"] == "es"
    assert rows[3]["lang_pred"] == "und"
    assert rows[4]["lang_pred"] == "fr"
    assert rows[1]["n_tokens"] == 11
    assert rows[1]["n_distinct_tokens"] == 9
    assert 0.0 < rows[1]["quality"] <= 1.0
    # fingerprint invariant to order/duplication
    df2 = spark.createDataFrame(
        [(1, "cat the sat on mat and dog is that the the")],
        "doc_id long, text string",
    )
    fp1 = rows[1]["fingerprint"]
    fp2 = text_profile(df2, "doc_id", "text").collect()[0]["fingerprint"]
    assert fp1 == fp2


def test_quality_monotonic_noise(spark):
    from pyspark.sql import functions as F

    from slurm2sql_spark.operators.textstats import quality_score

    df = spark.createDataFrame(
        [("clean text with several words here",), ("n0i5y ### t3xt @@@ 1234 !!!",)],
        "text string",
    )
    vals = [r[0] for r in df.select(quality_score(F.col("text"))).collect()]
    assert vals[0] > vals[1]
