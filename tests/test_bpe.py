"""BPE merge learning (operators/bpe.py): the learned table must match
an independent plain-Python reference implementation on a known corpus
(the Sennrich toy example), bpe_apply must reproduce the per-word
segmentations, and both must be partitioning-independent."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

CORPUS = (
    "low low low lower lower "
    "newest newest newest newest widest"
)


def _ref_bpe(word_counts: dict[str, int], k: int, eow="</w>"):
    """Reference trainer: dict arithmetic only, no Spark, no SQL."""
    vocab = {
        tuple(list(w) + [eow]): c for w, c in word_counts.items()
    }
    table = []
    for rnd in range(1, k + 1):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # argmax: count DESC then lexicographic (l, r) ASC
        (l, r), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        table.append((rnd, l, r, l + r, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out, prev = [], None
            for s in syms:
                if prev == l and s == r:
                    out.append(l + r)
                    prev = None
                else:
                    if prev is not None:
                        out.append(prev)
                    prev = s
            if prev is not None:
                out.append(prev)
            new_vocab[tuple(out)] = c
        vocab = new_vocab
    return table, vocab


def test_merge_table_matches_reference(spark):
    from slurm2sql_spark.operators.bpe import bpe_train

    df = spark.createDataFrame([(1, CORPUS)], "id int, text string")
    got = [
        tuple(r)
        for r in bpe_train(df, "text", merges=6)
        .orderBy("merge_round")
        .collect()
    ]
    counts = Counter(CORPUS.split())
    want, _ = _ref_bpe(counts, 6)
    assert got == want
    # sanity on the known corpus: the first merge is (w, e) x6
    assert got[0][1:] == ("w", "e", "we", 6)


def test_bpe_apply_reproduces_reference_segmentation(spark):
    from slurm2sql_spark.operators.bpe import bpe_apply, bpe_train

    df = spark.createDataFrame([(1, CORPUS)], "id int, text string")
    table = bpe_train(df, "text", merges=6).orderBy("merge_round").collect()
    merges = [(r["lhs"], r["rhs"]) for r in table]
    counts = Counter(CORPUS.split())
    _, ref_vocab = _ref_bpe(counts, 6)
    ref = {"".join(s).replace("</w>", ""): list(s) for s in ref_vocab}
    words = spark.createDataFrame(
        [(w,) for w in counts], "w string"
    ).select("w", bpe_apply(F.col("w"), merges).alias("toks"))
    for r in words.collect():
        assert list(r["toks"]) == ref[r["w"]], r["w"]


def test_training_partitioning_independent(spark):
    from slurm2sql_spark.operators.bpe import bpe_train

    rows = [(i, f"{CORPUS} extra{i % 3} tokens here") for i in range(12)]
    df = spark.createDataFrame(rows, "id int, text string")
    a = [tuple(r) for r in bpe_train(df, "text", merges=5).collect()]
    b = [
        tuple(r)
        for r in bpe_train(df.repartition(7), "text", merges=5).collect()
    ]
    assert sorted(a) == sorted(b) and len(a) == 5


def test_bpe_token_counts_matches_reference(spark):
    from slurm2sql_spark.operators.bpe import bpe_token_counts, bpe_train

    docs = spark.createDataFrame(
        [(1, CORPUS), (2, "low newest"), (3, ""), (4, None)],
        "doc_id int, text string",
    )
    table = bpe_train(docs, "text", merges=6).orderBy("merge_round").collect()
    merges = [(r["lhs"], r["rhs"]) for r in table]
    out = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_counts(docs, "doc_id", "text", merges).collect()
    }
    # reference: train on the SAME corpus word counts, then count
    counts = Counter(CORPUS.split())
    counts.update("low newest".split())
    _, ref_vocab = _ref_bpe(counts, 6)
    per_word = {"".join(s).replace("</w>", ""): len(s) for s in ref_vocab}
    want1 = sum(per_word[w] for w in CORPUS.split())
    assert out[1] == (len(CORPUS.split()), want1)
    assert out[2] == (2, per_word["low"] + per_word["newest"])
    # empty/NULL docs yield no row (no words)
    assert 3 not in out and 4 not in out


def test_early_stop_on_exhausted_pairs(spark):
    from slurm2sql_spark.operators.bpe import bpe_train

    # single 1-char word + EOW: one pair exists, then nothing
    df = spark.createDataFrame([(1, "a a a")], "id int, text string")
    got = bpe_train(df, "text", merges=5).collect()
    assert len(got) == 1
    assert (got[0]["lhs"], got[0]["rhs"]) == ("a", "</w>")


def test_token_counts_oracle_parity_on_exhausted_corpus(spark, tmp_path):
    """r11 review: the generated oracle's per-round merge stage must be
    an IDENTITY pass when training exhausts pairs before round k (an
    empty argmax CTE cross-joined in would wipe the symbol frame and
    zero the bpe_token_counts join). Both engines on a corpus that
    dries up after 2 merges, full row compare."""
    import duckdb
    import pandas as pd

    from slurm2sql_spark.catalog import QUERIES

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["ab ab ab", "ab b a"],
            "lang": ["en"] * 2,
            "source": ["t"] * 2,
            "n_chars": [8, 6],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    spec = QUERIES["bpe_token_counts"]
    out = sorted(
        map(tuple, spec.spark(spark, str(tmp_path)).collect())
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = sorted(map(tuple, con.sql(spec.oracle).fetchall()))
    assert out == want
    # and training really did exhaust early on this corpus
    from slurm2sql_spark.operators.bpe import bpe_train

    df = spark.read.parquet(str(tmp_path / "documents.parquet"))
    assert bpe_train(df, "text", merges=8).count() < 8


def test_model_artifact_roundtrip(spark, tmp_path):
    """save_bpe_model -> load_bpe_model is lossless: the frozen table
    reproduces the just-trained segmentation exactly, and the artifact
    is self-describing (eow marker rides along, including eow=None)."""
    from pyspark.sql import functions as F

    from slurm2sql_spark.operators.bpe import (
        bpe_apply,
        bpe_train,
        load_bpe_model,
        save_bpe_model,
    )

    df = spark.createDataFrame(
        [("the cat sat on the mat",), ("the mat the cat",)],
        "text string",
    )
    trained = bpe_train(df, "text", merges=6)
    want = [
        (r["lhs"], r["rhs"])
        for r in trained.orderBy("merge_round").collect()
    ]

    path = str(tmp_path / "model")
    save_bpe_model(trained, path)
    merges, eow = load_bpe_model(spark, path)
    assert merges == want and eow == "</w>"

    # frozen segmentation == in-session segmentation on fresh words
    words = spark.createDataFrame(
        [("the",), ("theme",), ("matte",)], "w string"
    )
    a = words.select(bpe_apply(F.col("w"), want).alias("t")).collect()
    b = words.select(bpe_apply(F.col("w"), merges, eow).alias("t")).collect()
    assert [r["t"] for r in a] == [r["t"] for r in b]

    # eow=None round-trips as None, not the string 'None'
    save_bpe_model(trained, path, eow=None)
    _, eow2 = load_bpe_model(spark, path)
    assert eow2 is None

    # empty table (zero merges trained) loads as an empty list with
    # the default marker
    save_bpe_model(trained.limit(0), path)
    m3, eow3 = load_bpe_model(spark, path)
    assert m3 == [] and eow3 == "</w>"


def test_tokenize_stream_projection_matches_vocab_join(spark):
    """The streaming tokenizer's per-row expression path must produce
    the same counts as the batch vocabulary-join path under the same
    frozen merge table (same merge expressions, different plan)."""
    from slurm2sql_spark.operators.bpe import bpe_token_counts, bpe_train
    from slurm2sql_spark.streaming.stream import tokenize_stream

    rows = [
        (1, "low lower lowest"),
        (2, "new newer newest wider"),
        (3, "low low low"),
        (4, ""),          # zero words: no row on either path
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    table = bpe_train(docs, "text", merges=6).orderBy("merge_round").collect()
    merges = [(r["lhs"], r["rhs"]) for r in table]
    batch = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_counts(docs, "doc_id", "text", merges).collect()
    }
    # tokenize_stream is a pure projection, so it accepts a batch frame
    inline = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in tokenize_stream(docs, merges).collect()
    }
    assert batch == inline
    assert 4 not in inline and 5 not in inline
    # stateless contract: no exchange anywhere in the projection
    plan = (
        tokenize_stream(docs, merges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "Exchange" not in plan


def test_bpe_local_loop_equals_distributed_exactly(spark, monkeypatch):
    """r14 adaptive small-vocab path: below _LOCAL_BPE_MAX_VOCAB the
    merge loop runs in-process; the learned table must equal the
    distributed per-round path exactly (counts, tie-breaks, early
    stop, greedy-leftmost non-overlap — the 'aaaa' run case)."""
    from slurm2sql_spark.operators import bpe as B

    df = spark.createDataFrame(
        [("the cat sat on the mat",), ("aaaa aa the banana",),
         ("na na na banana",), ("",)],
        "text string",
    )
    for eow in (B.EOW, None):
        local = [tuple(r) for r in B.bpe_train(df, "text", merges=6, eow=eow).collect()]
        monkeypatch.setattr(B, "_LOCAL_BPE_MAX_VOCAB", 0)
        dist = [tuple(r) for r in B.bpe_train(df, "text", merges=6, eow=eow).collect()]
        monkeypatch.undo()
        assert local == dist, (eow, local, dist)
        assert local, "no merges learned"
