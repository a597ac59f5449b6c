"""Corpus-report composition entries (corpus_report, source_overlap):
semantics pinned against a straightforward reformulation on randomized
small frames, independent of the DuckDB oracle gate."""

import random

from pyspark.sql import functions as F


def _random_docs(spark, seed, n_sources=4, n_docs=60):
    rng = random.Random(seed)
    # small token vocabulary so fingerprint classes collide across
    # sources with realistic frequency
    vocab = ["the", "a", "of", "x", "y", "z", "q"]
    rows = []
    for i in range(n_docs):
        words = [rng.choice(vocab) for _ in range(rng.randint(1, 6))]
        rows.append((i, " ".join(words), f"s{rng.randrange(n_sources)}"))
    return spark.createDataFrame(rows, "doc_id int, text string, source string")


def test_source_overlap_pair_explode_matches_self_join(spark):
    """The index-sliced transform/flatten pair generation must produce
    exactly the pairs a fingerprint-equijoin self-join produces."""
    from slurm2sql_spark.catalog import QUERIES
    from slurm2sql_spark.operators.textstats import fingerprint

    for seed in (1, 2, 3):
        docs = _random_docs(spark, seed)
        docs.createOrReplaceTempView("_ov_docs")

        # engine path, applied to the same frame the entry would build
        hs = docs.select(fingerprint(F.col("text")).alias("h"), "source")
        sets = (
            hs.groupBy("h")
            .agg(F.sort_array(F.collect_set("source")).alias("ss"))
            .where(F.size("ss") > 1)
        )
        got = (
            sets.select(
                F.explode(
                    F.flatten(
                        F.expr(
                            "transform(ss, (x, i) -> "
                            "transform(slice(ss, i + 2, size(ss)), "
                            "y -> struct(x AS a, y AS b)))"
                        )
                    )
                ).alias("p")
            )
            .groupBy("p.a", "p.b")
            .count()
        )

        # textbook self-join reformulation
        d = hs.distinct()
        want = (
            d.alias("l")
            .join(d.alias("r"), "h")
            .where(F.col("l.source") < F.col("r.source"))
            .groupBy(
                F.col("l.source").alias("a"), F.col("r.source").alias("b")
            )
            .count()
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), f"seed {seed}"


def test_corpus_report_rates_match_direct_computation(spark):
    """dup/keep/mean arithmetic spot-checked against per-row python on
    a frame with a known exact duplicate and NULL text."""
    from slurm2sql_spark.catalog import QUERIES

    docs = spark.createDataFrame(
        [
            (1, "the a of and to in is that " * 5, "s1"),  # keep, en
            (2, "the a of and to in is that " * 5, "s1"),  # exact dup of 1
            (3, None, "s1"),  # NULL text: counts, fails quality, lang und
            (4, "zz qq ww", "s2"),
        ],
        "doc_id int, text string, source string",
    )
    docs.createOrReplaceTempView("documents_tmp")
    import slurm2sql_spark.catalog as C

    # run the entry's builder on the in-memory frame by monkeypatching _t
    orig = C._t
    try:
        C._t = lambda sp, sf, name: docs
        out = {r["source"]: r for r in C.QUERIES["corpus_report"].spark(spark, "unused").collect()}
    finally:
        C._t = orig
    s1 = out["s1"]
    assert s1["n_docs"] == 3
    # doc1==doc2, doc3 (NULL hashes as '') distinct -> 2 unique of 3
    assert abs(s1["dup_rate"] - (1 - 2 / 3)) < 2e-6
    assert s1["top_lang"] == "en"
    assert out["s2"]["n_docs"] == 1 and out["s2"]["dup_rate"] == 0.0
    assert out["s2"]["keep_rate"] == 0.0  # 3 words < min_words=30


def test_curation_pipeline_all_four_statuses(spark):
    """Planted corpus exercising every stage verdict: the driver-scale
    corpus has no exact duplicates, so the 'duplicate' branch (and the
    first-failing-stage precedence) is pinned here."""
    import pyspark.sql.functions as F

    good_a = ("the data and the model have to train well " * 5).strip()
    good_b = ("sampling weights for the mixture must sum to one " * 5).strip()
    bench_q = ("which answer did the exam expect for question five "
               * 5).strip()
    docs = spark.createDataFrame(
        # doc_id < 20 = benchmark slice
        [(1, bench_q, "bench")]
        + [
            (20, good_a, "src0"),                        # kept
            (21, "short junk", "src0"),                  # quality
            (22, good_b, "src1"),                        # kept
            (23, "  " + good_b.upper() + "  ", "src1"),  # duplicate of 22
            (24, "student notes: " + bench_q, "src2"),   # contaminated
            # a second copy of a QUALITY-FAILING doc is judged on
            # quality first (precedence), not as duplicate
            (25, "short junk", "src2"),                  # quality
        ],
        "doc_id long, text string, source string",
    )
    from slurm2sql_spark.operators.curation import curate

    out = curate(
        docs.filter(F.col("doc_id") >= 20),
        docs.filter(F.col("doc_id") < 20),
        "doc_id",
        "text",
        min_words=30,
        min_stop_hits=1,
    ).select("doc_id", "status")
    got = {r["doc_id"]: r["status"] for r in out.collect()}
    assert got == {
        20: "kept",
        21: "quality",
        22: "kept",
        23: "duplicate",
        24: "contaminated",
        25: "quality",
    }


def test_curate_c4_mode_dedups_on_cleaned_text(spark):
    """quality='c4' cleans FIRST, so two docs that differ only in
    C4-dropped lines (junk lines, javascript boilerplate) become exact
    duplicates and the later doc is attributed 'duplicate'."""
    import pyspark.sql.functions as F

    from slurm2sql_spark.operators.curation import curate

    body = ("One good sentence stands right here.\n"
            "Two good sentence stands right here.\n"
            "Three good sentence stands right here.")
    docs = spark.createDataFrame(
        [
            (1, "benchmark answer key sentence lives here once.", "b"),
            (20, body, "s"),
            (21, "no punct junk line\n" + body + "\nPlease enable javascript now.", "s"),
            (22, "code { brace }\n" + body, "s"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r["doc_id"]: r["status"]
        for r in curate(
            docs.filter(F.col("doc_id") >= 20),
            docs.filter(F.col("doc_id") < 20),
            "doc_id",
            "text",
            quality="c4",
        ).collect()
    }
    # 21 cleans to exactly 20's text -> duplicate; 22 fails the page rule
    assert out == {20: "kept", 21: "duplicate", 22: "quality"}
    import pytest as _p

    with _p.raises(ValueError, match="unknown quality family"):
        curate(docs, docs, "doc_id", "text", quality="nope").collect()


def test_bench_compact_line_roundtrip_and_headroom():
    """encode_walls/decode_walls round-trip exactly, the compact line
    stays under the driver's ~2000-byte stdout tail with 250 entries
    (the r12 headroom bar was >= 110), and a wrong name list is
    rejected rather than silently mis-zipped."""
    import json

    import pytest as _pytest

    import bench

    times = {
        f"query_name_with_realistic_length_{i:03d}": round(
            0.05 + (i % 37) * 0.173 + (i % 7) * 1.01, 3
        )
        for i in range(250)
    }
    enc = bench.encode_walls(times)
    back = bench.decode_walls(enc, list(times))
    assert back == times

    compact = {
        "metric": "catalog_total_wall",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "sf": 0.1,
        "n_queries": len(times),
        "value_median": 1.0,
        "iterations": 3,
        "full": "BENCH_FULL.json",
        **enc,
    }
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) < 1950, len(line)

    with _pytest.raises(ValueError):
        bench.decode_walls(enc, list(times)[:-1] + ["imposter"])
