"""Hashed linear quality-classifier scoring — the DISCRIMINATIVE third
member of the canonical quality-scoring families (next to rule filters
— Gopher/C4, ``textstats.quality_filter``/``c4_filter`` — and
generative LM scoring — CCNet perplexity, ``sampling.lm_perplexity``).
CCNet (Wenzek et al. 2020) and the fastText-classifier pipelines score
documents with a LINEAR model over hashed n-gram features; this module
trains and applies exactly that: logistic regression on the DSIR
hashed unigram+bigram featurization (``sampling._hashed_ngram_
occurrences`` — the feature pipeline is shared, not duplicated).

Training is full-batch gradient descent for a FIXED, small number of
epochs with every weight floor-quantized after each update — the
``dsir_select`` determinism discipline, so the fit is bit-reproducible
across engines (a DuckDB oracle replays the same epochs as chained
CTEs), partitionings, and re-runs.

Scale contract (r13 — the fit is ONE exchange per epoch):

- the per-doc hashed-bin instance arrays ``(y, bins, t)`` are built by
  the codegen explode+hash grain, grouped once per doc, persisted
  across epochs (one tokenize + one exchange total);
- per epoch: ONE Arrow-batched kernel pass (``_epoch_gradients`` —
  scores, residuals and per-bin gradient partials in numpy; the
  trained weight matrix ships in the closure, a few KB) emitting
  <= (m+1) x k partial rows per task, summed by one tiny exchange;
- driver traffic is one (m+1)-row collect per epoch — bounded by m
  and epochs, never by corpus size (the IVF centroid-collect
  precedent).

Summation grain: scores accumulate per gram INSTANCE and divide by
the doc length (sum_i w[b_i] / t), which equals the (doc, bin)-grain
sum_b x_b w_b the SQL oracle computes in exact arithmetic; the two
orders differ by O(1e-15) relative FP noise, absorbed by the same
1e-3 quantize nudge that already absorbs DuckDB-vs-Spark
aggregation-order noise (``_q``).

At 100 TB with m=4096 and 2-5 epochs this is a handful of linear
passes over the (bounded, curated) training slice; the classifier
itself (m weights + bias) is a broadcast scalar. No reference-repo
analog; VERDICT r10 "next round" #2.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hashed_classifier_fit",
    "hashed_classifier_score",
    "hashed_classifier_score_inline",
    "softmax_classifier_fit",
    "softmax_classifier_score",
    "softmax_classifier_score_inline",
    "save_classifier_model",
    "load_classifier_model",
    "save_softmax_model",
    "load_softmax_model",
]


def _q(v: float, quantize: int) -> float:
    """Driver-side twin of the catalog's floor quantizer (``_q6``):
    floor(v*q + 1e-3)/q — the 1e-3 nudge absorbs summation-order FP
    noise identically on both engines."""
    return math.floor(v * quantize + 1e-3) / quantize


#: Adaptive small-fit threshold (r14): a fit over at most this many
#: documents collects the feature frame ONCE (Arrow toPandas — a few
#: MB, bounded by this CONSTANT, never corpus-scaling) and runs every
#: epoch's kernel in-process — identical math (same kernel function),
#: zero Spark jobs per epoch. Above the threshold the distributed
#: one-exchange-per-epoch path runs unchanged, so the 10x/100x
#: SCALING rows measure the real cluster shape. At gate scale the
#: epoch loop was pure stage-scheduling floor (~0.5 s/epoch on a
#: 1000-doc slice).
_LOCAL_FIT_MAX_DOCS = 20_000


def _local_feat(feat, n_docs: int):
    """The threshold-gated local copy of the feature frame, or None
    to take the distributed epoch path."""
    if n_docs > _LOCAL_FIT_MAX_DOCS:
        return None
    return feat.toPandas()


def _fan_feat(feat, n_rows: int, per_task: int = 1250):
    """Re-spread an AQE-coalesced per-doc feature frame before the
    epoch loop: at gate scale the doc-grouping exchange coalesces to
    ONE partition, which serializes every epoch's Arrow kernel on a
    single task (measured at sf0.1: 4 epochs 2.3 s serial vs 1.2 s at
    4 partitions). Target ~``per_task`` docs per task, capped at the
    default parallelism; at scale the grouping already yields >= that
    many partitions and this returns the frame untouched — the
    repartition exchange is only ever paid on a tiny frame."""
    from .dedup import _persist

    spark = feat.sparkSession
    try:  # Spark Connect exposes no sparkContext / DataFrame.rdd
        target = min(
            spark.sparkContext.defaultParallelism,
            max(1, -(-int(n_rows) // per_task)),
        )
        current = feat.rdd.getNumPartitions()
    except Exception:  # ADVICE r14 #3: fall back like bpe_train does
        return feat
    if target <= 1 or current >= target:
        return feat
    spread = _persist(feat.repartition(target))
    spread.count()
    feat.unpersist()
    return spread


def _bin_index(b, m: int) -> int:
    """Validate a model bin index against the feature width ``m``.

    The Arrow kernels gather ``W[b]`` on a dense (m x k) matrix, so a
    bin from a mismatched (model, m) pair would either IndexError past
    the end or — worse — silently alias through Python negative
    indexing (e.g. the on-disk artifact's ``-1`` bias pseudo-bin
    adding itself into bin m-1). The broadcast-join formulation this
    replaced dropped out-of-range bins silently; fail loudly instead.
    """
    b = int(b)
    if not 0 <= b < m:
        raise ValueError(
            f"model bin {b} out of range for m={m} feature bins — "
            "model artifact and scorer m disagree"
        )
    return b


def _features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    m: int,
    salt: str,
    bigrams: bool,
) -> DataFrame:
    """Per-(doc, bin) normalized counts ``x = n / t_doc`` (fastText's
    mean-of-feature-vectors input scaling: per-doc features sum to 1,
    so score magnitudes and gradients are document-length-invariant).
    EVERY document has features: an empty/NULL text yields one
    empty-string unigram (the shared ``gram_array`` contract, matching
    the DuckDB split twin), so such docs carry that single bin's
    weight — they are scored, not dropped."""
    from .sampling import _hashed_ngram_occurrences

    grain = (
        _hashed_ngram_occurrences(df, id_col, text_col, m, salt, bigrams)
        .groupBy(id_col, "b")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    tot = grain.groupBy(id_col).agg(F.sum("_n").alias("_t"))
    return grain.join(tot, id_col).select(
        id_col, "b", (F.col("_n") / F.col("_t").cast("double")).alias("x")
    )


def _doc_bins(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    m: int,
    salt: str,
    bigrams: bool,
    label_type: str,
):
    """Persisted per-doc feature arrays for the fit loops:
    ``(_y, _bins array<int>, _t)`` — the codegen explode+hash grain
    (``_hashed_ngram_occurrences``, the shared md5 featurization)
    collected back to one row per doc, so every epoch's Arrow kernel
    reads whole documents (a doc never splits across batches). ``_t``
    is the gram-instance count (>= 1: empty/NULL text yields one
    empty-string unigram, the shared ``gram_array`` contract), so
    every labeled doc trains. One exchange total (the doc grouping),
    paid once and persisted across epochs. Tokenization/hashing is the
    shared ``gram_array`` + ``hash_bucket % m`` expression every
    hashed-n-gram consumer uses — the parity single-source."""
    from .dedup import _persist
    from .sampling import hash_bucket, with_bigrams, words_array

    # Two-step projection (the with_bigrams perf contract): bind the
    # word array first so the bigram transform reads a computed
    # attribute instead of re-splitting per element. Grams identical.
    occ = df.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).cast(label_type).alias("_y"),
        words_array(text_col).alias("_w"),
    ).select(
        "_id",
        "_y",
        F.explode(
            with_bigrams(F.col("_w"))
            if bigrams
            else F.col("_w")
        ).alias("_g"),
    )
    docs = occ.groupBy("_id", "_y").agg(
        F.collect_list(
            (hash_bucket(F.col("_g"), salt) % F.lit(int(m))).cast("int")
        ).alias("_bins"),
        F.count(F.lit(1)).cast("double").alias("_t"),
    )
    return _persist(docs.select("_y", "_bins", "_t"))


def _epoch_gradients(
    feat, W, B, n_docs, m, k, binary, classes=None, local_pdf=None
):
    """ONE epoch's mean gradients in a single Arrow-batched pass over
    the persisted ``_doc_bins`` frame — the kernel the fit loops call
    per epoch. Scores, softmax/sigmoid residuals and the per-bin
    gradient partials are all numpy inside ``mapInPandas`` (the
    ``dedup.shingles`` precedent: this per-doc scatter/gather has no
    codegen-friendly Column form — the HOF formulation runs
    interpreted, measured ~10x slower — and Arrow batches beat the
    5-exchange join formulation's stage floors ~4x at gate scale).
    Each task emits <= (m+1) x k partial rows (bias rides as
    pseudo-bin -1), one tiny exchange sums them, and the driver
    collects (m+1) rows — the IVF centroid-collect contract.
    Summation order differs from the SQL oracle's; the O(1e-15)
    relative FP noise dies in the 1e-3 quantize nudge (module
    docstring).

    ``local_pdf``: the adaptive small-fit path (r14) — when the fit
    loop collected the (threshold-bounded, see ``_LOCAL_FIT_MAX_DOCS``)
    feature frame once, the SAME kernel runs in-process on that single
    batch: identical math, zero Spark jobs per epoch. At gate scale a
    4-epoch fit paid ~0.5 s of pure stage-scheduling floor PER EPOCH
    on a 1000-doc slice.
    """
    import numpy as np
    import pandas as pd

    schema = "b int, " + ", ".join(f"g{j} double" for j in range(k))
    # one-hot lookup pickled INTO the kernel closure (executors import
    # the module fresh — module-level mutable state would not ship)
    lut = {c: j for j, c in enumerate(classes)} if classes else {}

    def kernel(batches):
        G = np.zeros((m + 1, k))
        seen = np.zeros(m + 1, dtype=bool)
        seen[m] = True  # bias row always participates
        any_rows = False
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            any_rows = True
            t = pdf["_t"].to_numpy(dtype=np.float64)
            arrs = [np.asarray(a, dtype=np.int64) for a in pdf["_bins"]]
            lens = np.fromiter((len(a) for a in arrs), dtype=np.int64,
                               count=n)
            flat = (
                np.concatenate(arrs) if arrs else
                np.empty(0, dtype=np.int64)
            )
            doc_idx = np.repeat(np.arange(n), lens)
            S = np.zeros((n, k))
            np.add.at(S, doc_idx, W[flat])
            S /= t[:, None]
            if binary:
                y = pdf["_y"].to_numpy(dtype=np.float64)
                R = 1.0 / (1.0 + np.exp(-(S[:, 0] + B[0]))) - y
                # NULL labels arrive as NaN; the join formulation this
                # replaced dropped them via SQL SUM's NULL-skip and the
                # softmax twin zero-one-hots them — zero the residual so
                # unlabeled docs contribute nothing instead of NaN-ing
                # the whole gradient (ADVICE r13).
                R = np.where(np.isnan(y), 0.0, R)[:, None]
            else:
                E = np.exp(S + B[None, :])
                P = E / E.sum(axis=1, keepdims=True)
                Y = np.zeros((n, k))
                for i, v in enumerate(pdf["_y"]):
                    j = lut.get(v)
                    if j is not None:
                        Y[i, j] = 1.0
                R = P - Y
            np.add.at(G[:m], flat, R[doc_idx] / t[doc_idx, None])
            G[m] += R.sum(axis=0)
            seen[flat] = True
        if not any_rows:
            return
        idx = np.flatnonzero(seen)
        out = {"b": np.where(idx == m, -1, idx).astype(np.int32)}
        for j in range(k):
            out[f"g{j}"] = G[idx, j]
        yield pd.DataFrame(out)

    if local_pdf is not None:
        parts = list(kernel([local_pdf]))
        if not parts:
            return []
        out = parts[0]
        return [
            (int(row["b"]), [float(row[f"g{j}"]) / n_docs for j in range(k)])
            for _, row in out.iterrows()
        ]

    sums = [F.sum(f"g{j}").alias(f"g{j}") for j in range(k)]
    rows = (
        feat.mapInPandas(kernel, schema)
        .groupBy("b")
        .agg(*sums)
        .collect()
    )
    return [
        (row["b"], [row[f"g{j}"] / n_docs for j in range(k)])
        for row in rows
    ]


def hashed_classifier_fit(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    m: int = 1024,
    epochs: int = 2,
    lr: float = 5.0,
    salt: str = "",
    bigrams: bool = True,
    quantize: int = 1_000_000,
) -> tuple[dict[int, float], float]:
    """Fit logistic weights on hashed n-gram features: ``epochs``
    full-batch GD steps from w=0, b=0 with learning rate ``lr``.

    ``label_col`` must be 0/1 (castable to double). Returns
    ``({bin: weight}, bias)`` with every value floor-quantized at
    ``1/quantize`` after each update — the cross-engine lockstep that
    lets a SQL oracle replay the fit as chained CTEs. Gradients are
    mean log-loss gradients: ``g_b = sum_d x_db (p_d - y_d) / N``,
    ``g_bias = mean_d (p_d - y_d)`` over all N documents (every doc
    featurizes — see ``_doc_bins``).

    r13 plan shape: each epoch is ONE Arrow-batched kernel pass over
    the persisted per-doc feature arrays (``_epoch_gradients``) plus
    one <= (m+1)-row exchange — the r12 join formulation paid ~5
    exchanges per epoch and its wall at gate scale was
    stage-scheduling floors, not compute (measured 4x).
    """
    if epochs < 1:
        raise ValueError(f"epochs must be >= 1, got {epochs}")

    feat = _doc_bins(
        df, id_col, text_col, label_col, m, salt, bigrams, "double"
    )
    n_docs = feat.count()
    if n_docs == 0:
        feat.unpersist()
        return {}, 0.0
    local_pdf = _local_feat(feat, n_docs)
    if local_pdf is None:
        feat = _fan_feat(feat, n_docs)

    import numpy as np

    w: dict[int, float] = {}
    bias = 0.0
    for _ in range(int(epochs)):
        W = np.zeros((m, 1))
        for b, wv in w.items():
            W[_bin_index(b, m), 0] = wv
        grads = _epoch_gradients(
            feat, W, np.array([bias]), n_docs, m, 1, binary=True,
            local_pdf=local_pdf,
        )
        for b, (g,) in grads:
            if b == -1:
                # pseudo-bin: sum(resid)/N == avg(resid)
                bias = _q(bias - lr * g, quantize)
            else:
                w[b] = _q(w.get(b, 0.0) - lr * g, quantize)
    feat.unpersist()
    return w, bias


def hashed_classifier_score_inline(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: dict[int, float],
    bias: float,
    m: int = 1024,
    salt: str = "",
    bigrams: bool = True,
    quantize: int = 1_000_000,
    threshold: float = 0.5,
) -> DataFrame:
    """ZERO-SHUFFLE scoring twin of :func:`hashed_classifier_score`:
    the weight table inlines as a map literal and the whole score —
    gram explode-free bucket lookup, length normalization, sigmoid,
    quantize — folds into ONE scan-stage projection (the L41
    ``quality_filter`` posture). Identical output to the join form
    (same featurization, same quantization; summation-order FP noise
    dies at the 1e-6 floor), pinned by pytest.

    This is the deployment shape: a trained m-entry model is a few KB
    of literals, so corpus filtering at 100 TB is a predicate-free
    parallel scan with NO exchange — and it is stream-safe (stateless
    projection), which the join/aggregation form is not;
    ``streaming.stream.classifier_stream`` wraps it for micro-batch
    scoring. Use the join form when m is too large to inline
    (>> 10^4 bins). Tokenization is ``sampling.gram_array`` — the
    SAME expression the join/fit paths explode, so the three scoring
    paths cannot drift apart."""
    from .sampling import gram_array, hash_bucket

    grams = gram_array(text_col, bigrams)
    if weights:
        wmap = F.create_map(
            *[
                F.lit(x)
                for kv in sorted(weights.items())
                for x in (int(kv[0]), float(kv[1]))
            ]
        )
        lookup = lambda g: F.coalesce(  # noqa: E731
            F.element_at(
                wmap, (hash_bucket(g, salt) % F.lit(int(m))).cast("int")
            ),
            F.lit(0.0),
        )
        ssum = F.aggregate(
            grams, F.lit(0.0), lambda acc, g: acc + lookup(g)
        )
    else:
        ssum = F.lit(0.0)
    s = ssum / F.size(grams).cast("double") + F.lit(float(bias))
    q = F.lit(float(quantize))
    score = F.floor(
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-s))) * q + F.lit(1e-3)
    ) / q
    return df.select(
        F.col(id_col),
        score.alias("score"),
        (score >= F.lit(float(threshold))).alias("keep"),
    )


def _score_frame(df, id_col, text_col, m, salt, bigrams):
    """Per-doc hashed-bin instance arrays for the Arrow scoring
    kernels: ``(id, _bins, _t)`` — same featurization single-source as
    the fit (``gram_array`` + ``hash_bucket % m``), one exchange (the
    doc grouping), not persisted (scoring reads it once)."""
    from .sampling import hash_bucket, with_bigrams, words_array

    # Two-step projection — see _features (the with_bigrams contract).
    occ = df.select(
        F.col(id_col), words_array(text_col).alias("_w")
    ).select(
        F.col(id_col),
        F.explode(
            with_bigrams(F.col("_w")) if bigrams else F.col("_w")
        ).alias("_g"),
    )
    return occ.groupBy(id_col).agg(
        F.collect_list(
            (hash_bucket(F.col("_g"), salt) % F.lit(int(m))).cast("int")
        ).alias("_bins"),
        F.count(F.lit(1)).cast("double").alias("_t"),
    )


def _kernel_scores(pdf, W, B):
    """Per-batch raw class scores ``exp((sum_i W[b_i]) / t + B)`` —
    the shared numpy core of both Arrow scorers (the fit kernel's
    scoring half, factored)."""
    import numpy as np

    n = len(pdf)
    t = pdf["_t"].to_numpy(dtype=np.float64)
    arrs = [np.asarray(a, dtype=np.int64) for a in pdf["_bins"]]
    lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=n)
    flat = (
        np.concatenate(arrs) if arrs else np.empty(0, dtype=np.int64)
    )
    doc_idx = np.repeat(np.arange(n), lens)
    S = np.zeros((n, W.shape[1]))
    np.add.at(S, doc_idx, W[flat])
    S /= t[:, None]
    return np.exp(S + B[None, :])


def hashed_classifier_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: dict[int, float],
    bias: float,
    m: int = 1024,
    salt: str = "",
    bigrams: bool = True,
    quantize: int = 1_000_000,
    threshold: float = 0.5,
) -> DataFrame:
    """Score documents under a fitted (or externally supplied) hashed
    linear classifier: ``(id, score, keep)`` with
    ``score = sigmoid(w . x + bias)`` floor-quantized at
    ``1/quantize`` and ``keep = score >= threshold``.

    ``weights`` is the bin->weight mapping from
    :func:`hashed_classifier_fit` (or any external fastText-style
    export rehashed into the same m bins). Every input document is
    scored — empty/NULL text featurizes as one empty-string unigram
    (the shared ``gram_array`` contract), it is never dropped.

    r13 plan shape: ONE exchange (the per-doc bin-array grouping) +
    an Arrow-batched numpy projection — the scoring half of the fit
    kernel (`_epoch_gradients`), replacing the broadcast-join +
    aggregate chain whose stage floors dominated at gate scale. The
    weight matrix ships in the closure (m doubles, a few KB). For
    per-row-latency streaming use :func:`hashed_classifier_score_inline`
    (stateless scan projection, no exchange at all).
    """
    import numpy as np
    import pandas as pd

    W = np.zeros((m, 1))
    for b, wv in weights.items():
        W[_bin_index(b, m), 0] = wv
    bias_f = float(bias)
    q = float(quantize)
    thr = float(threshold)
    id_type = dict(df.dtypes)[id_col]

    # the sigmoid path wants raw S (not the softmax core's exp(S)),
    # so the bin gather/scatter is restated here for the 1-D case
    def kernel(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            t = pdf["_t"].to_numpy(dtype=np.float64)
            arrs = [np.asarray(a, dtype=np.int64) for a in pdf["_bins"]]
            lens = np.fromiter(
                (len(a) for a in arrs), dtype=np.int64, count=n
            )
            flat = (
                np.concatenate(arrs) if arrs
                else np.empty(0, dtype=np.int64)
            )
            doc_idx = np.repeat(np.arange(n), lens)
            S = np.zeros(n)
            np.add.at(S, doc_idx, W[flat, 0])
            S = S / t + bias_f
            score = np.floor(
                (1.0 / (1.0 + np.exp(-S))) * q + 1e-3
            ) / q
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "score": score,
                    "keep": score >= thr,
                }
            )

    frame = _score_frame(df, id_col, text_col, m, salt, bigrams)
    return frame.mapInPandas(
        kernel, f"{id_col} {id_type}, score double, keep boolean"
    )


def softmax_classifier_fit(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    m: int = 1024,
    epochs: int = 2,
    lr: float = 5.0,
    salt: str = "",
    bigrams: bool = True,
    quantize: int = 1_000_000,
) -> tuple[list[str], dict[str, dict[int, float]], dict[str, float]]:
    """Multinomial (softmax) extension of :func:`hashed_classifier_fit`
    — the fastText language-ID posture (VERDICT r11 #4): one weight
    vector per class over the SAME shared hashed unigram+bigram
    featurization, trained by ``epochs`` full-batch GD steps from
    w=0/b=0 with every parameter floor-quantized after each update
    (the bit-reproducible lockstep a chained-CTE SQL oracle replays).

    ``label_col`` is a STRING class label; the class set is collected
    from the data (k rows — |languages|-bounded driver traffic).
    Returns ``(classes, {cls: {bin: w}}, {cls: bias})``.

    Math per epoch: s_dc = w_c . x_d; p_dc = exp(s_dc + b_c) /
    sum_c' exp(s_dc' + b_c'); grad_cb = sum_d x_db (p_dc - y_dc) / N;
    grad bias_c = mean_d (p_dc - y_dc). No max-subtraction in the
    softmax — scores stay O(lr) small under per-doc-normalized
    features, and the two engines must compute the SAME expression.

    Scale contract (r13 — the binary fit's one-exchange-per-epoch
    shape, times k): the trained (k x m) weight table inlines as a map
    literal (bin -> k-vector), so per-doc scores, the softmax
    denominator and the k residuals all fold into the scan stage over
    the persisted instance-grain features; the epoch's only exchange
    is ONE (k x (m+1))-BOUNDED gradient aggregate collected to the
    driver. The feature arrays persist across epochs — the corpus
    tokenizes once.
    """
    if epochs < 1:
        raise ValueError(f"epochs must be >= 1, got {epochs}")

    feat = _doc_bins(
        df, id_col, text_col, label_col, m, salt, bigrams, "string"
    )
    n_docs = feat.count()  # materializes the persist
    # class set off the CACHED frame (every doc featurizes — the
    # gram_array >=1-instance contract — so this is df's label set)
    classes = sorted(
        r["_y"] for r in feat.select("_y").distinct().collect()
        if r["_y"] is not None
    )
    if n_docs == 0 or not classes:
        feat.unpersist()
        return classes, {}, {}
    local_pdf = _local_feat(feat, n_docs)
    if local_pdf is None:
        feat = _fan_feat(feat, n_docs)
    k = len(classes)
    import numpy as np

    w: dict[str, dict[int, float]] = {c: {} for c in classes}
    bias: dict[str, float] = {c: 0.0 for c in classes}
    for _ in range(int(epochs)):
        W = np.zeros((m, k))
        for j, c in enumerate(classes):
            for b, wv in w[c].items():
                W[_bin_index(b, m), j] = wv
        B = np.array([bias[c] for c in classes])
        grads = _epoch_gradients(
            feat, W, B, n_docs, m, k, binary=False, classes=classes,
            local_pdf=local_pdf,
        )
        for b, gs in grads:
            for j, c in enumerate(classes):
                if b == -1:
                    bias[c] = _q(bias[c] - lr * gs[j], quantize)
                else:
                    w[c][b] = _q(
                        w[c].get(b, 0.0) - lr * gs[j], quantize
                    )
    feat.unpersist()
    return classes, w, bias


def softmax_classifier_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    classes: list[str],
    weights: dict[str, dict[int, float]],
    biases: dict[str, float],
    m: int = 1024,
    salt: str = "",
    bigrams: bool = True,
    quantize: int = 1_000_000,
) -> DataFrame:
    """Predict a class per document under a fitted softmax model:
    ``(id, pred, score)`` where ``pred`` is the argmax class (total
    tie-break: quantized probability DESC, class name ASC) and
    ``score`` its floor-quantized softmax probability.

    Scale shape (r13 Arrow form): ONE exchange (the per-doc bin-array
    grouping, `_score_frame`) + an Arrow-batched numpy projection —
    the scoring half of the fit kernel (`_kernel_scores`): bin gather,
    per-doc normalization, softmax, quantized argmax all per batch;
    the (k x m) weight matrix ships in the closure (a few KB). The
    argmax takes the FIRST maximal index = the smallest class name
    (``classes`` is sorted), the same total tie-break the r11/r12
    window and wide forms ordered by (quantized p DESC, class ASC).
    For per-row streaming latency use
    :func:`softmax_classifier_score_inline`."""
    import numpy as np
    import pandas as pd

    classes = sorted(classes)
    k = len(classes)
    if k == 0:
        return df.select(
            F.col(id_col),
            F.lit(None).cast("string").alias("pred"),
            F.lit(None).cast("double").alias("score"),
        ).filter(F.lit(False))
    W = np.zeros((m, k))
    for j, c in enumerate(classes):
        for b, wv in weights.get(c, {}).items():
            W[_bin_index(b, m), j] = wv
    B = np.array([float(biases.get(c, 0.0)) for c in classes])
    q = float(quantize)
    cls_arr = np.array(classes)
    id_type = dict(df.dtypes)[id_col]

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = _kernel_scores(pdf, W, B)
            probs = np.floor(
                E / E.sum(axis=1, keepdims=True) * q + 1e-3
            ) / q
            idx = probs.argmax(axis=1)  # first maximal index
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "pred": cls_arr[idx],
                    "score": probs[np.arange(len(pdf)), idx],
                }
            )

    frame = _score_frame(df, id_col, text_col, m, salt, bigrams)
    return frame.mapInPandas(
        kernel, f"{id_col} {id_type}, pred string, score double"
    )


def softmax_classifier_score_inline(
    df: DataFrame,
    id_col: str,
    text_col: str,
    classes: list[str],
    weights: dict[str, dict[int, float]],
    biases: dict[str, float],
    m: int = 1024,
    salt: str = "",
    bigrams: bool = True,
    quantize: int = 1_000_000,
) -> DataFrame:
    """ZERO-SHUFFLE deployment twin of :func:`softmax_classifier_score`
    (the ``hashed_classifier_score_inline`` posture, per class): the
    trained (k x m) weight table inlines as ONE map literal from bin to
    the k-vector of class weights, the gram scan accumulates a k-array
    of score sums in a single ``aggregate`` pass, and softmax + argmax
    fold into the same scan-stage projection — no join, no aggregation,
    no state. Stream-safe: ``streaming.stream.lang_id_stream`` wraps it
    for micro-batch language ID. Identical output to the join form
    (same featurization and quantization; argmax tie-break matches
    because ``classes`` is sorted and ``array_position`` returns the
    FIRST maximal index = smallest class name), pinned by pytest.
    """
    from .sampling import gram_array, hash_bucket

    classes = sorted(classes)
    k = len(classes)
    if k == 0:
        return df.select(
            F.col(id_col),
            F.lit(None).cast("string").alias("pred"),
            F.lit(None).cast("double").alias("score"),
        )
    bins = sorted({b for c in classes for b in weights.get(c, {})})
    grams = gram_array(text_col, bigrams)
    zeros = F.array(*[F.lit(0.0) for _ in classes])
    if bins:
        wmap = F.create_map(
            *[
                x
                for b in bins
                for x in (
                    F.lit(int(b)),
                    F.array(
                        *[
                            F.lit(float(weights.get(c, {}).get(b, 0.0)))
                            for c in classes
                        ]
                    ),
                )
            ]
        )
        lookup = lambda g: F.coalesce(  # noqa: E731
            F.element_at(
                wmap, (hash_bucket(g, salt) % F.lit(int(m))).cast("int")
            ),
            zeros,
        )
        sums = F.aggregate(
            grams,
            zeros,
            lambda acc, g: F.zip_with(acc, lookup(g), lambda a, b: a + b),
        )
    else:
        sums = zeros
    n = F.size(grams).cast("double")
    bvec = F.array(*[F.lit(float(biases.get(c, 0.0))) for c in classes])
    ex = F.zip_with(sums, bvec, lambda s, b: F.exp(s / n + b))
    den = F.aggregate(ex, F.lit(0.0), lambda a, e: a + e)
    q = F.lit(float(quantize))
    probs = F.transform(ex, lambda e: F.floor(e / den * q + F.lit(1e-3)) / q)
    best = F.array_max(probs)
    idx = F.array_position(probs, best).cast("int")
    cls_arr = F.array(*[F.lit(c) for c in classes])
    return df.select(
        F.col(id_col),
        F.element_at(cls_arr, idx).alias("pred"),
        best.alias("score"),
    )


# ---------------------------------------------------------------------------
# Trained-model artifact persistence (VERDICT r12 "next round" #2 — the
# deployment seam symmetric to bpe.save_bpe_model/load_bpe_model: r12
# froze the tokenizer but the fitted classifier weights lived only as
# in-process dicts, so a pipeline could not train language-ID once and
# score many corpora/streams across sessions).

#: one row per (class, bin) weight plus one bias row per class
#: (pseudo-bin -1, the fit loops' own convention); featurization
#: parameters ride on every row so the artifact is self-describing —
#: a loader needs no out-of-band config to reproduce the exact scores.
_MODEL_SCHEMA = (
    "kind string, cls string, b int, w double, "
    "m int, salt string, bigrams boolean"
)


def _write_model_rows(spark, path: str, rows: list) -> None:
    # repartition(1), NOT coalesce(1): coalesce on a parallelize-backed
    # local frame folds all k empty python partitions into one task
    # that pays their worker handshakes serially (~4 s measured for a
    # KB-scale table); the 1-slot shuffle runs them parallel (~0.3 s)
    (
        spark.createDataFrame(rows, _MODEL_SCHEMA)
        .repartition(1)
        .write.mode("overwrite")
        .parquet(path)
    )


def save_softmax_model(
    spark,
    path: str,
    classes: list[str],
    weights: dict[str, dict[int, float]],
    biases: dict[str, float],
    m: int,
    salt: str = "",
    bigrams: bool = True,
) -> None:
    """Persist a fitted softmax model (``softmax_classifier_fit``
    output) as a k x (m+1)-row parquet artifact. Weights are exact
    doubles through parquet, so a reload scores bit-identically to the
    in-session fit (the ``bpe_frozen_counts`` proof obligation). Every
    class carries its bias row even when all its weights are zero, so
    the class set round-trips; an EMPTY model (k=0) writes a 0-row
    frame and loads back as ``([], {}, {})``."""
    meta = (int(m), salt, bool(bigrams))
    rows = []
    for c in classes:
        rows.append(("softmax", c, -1, float(biases.get(c, 0.0)), *meta))
        for b, wv in sorted(weights.get(c, {}).items()):
            rows.append(("softmax", c, int(b), float(wv), *meta))
    _write_model_rows(spark, path, rows)


def load_softmax_model(spark, path: str):
    """Load a frozen softmax model written by :func:`save_softmax_model`.

    Returns ``(classes, weights, biases, m, salt, bigrams)`` — the
    exact ``softmax_classifier_fit`` shape plus the featurization
    parameters. The collect is k x (m+1) rows — model-bounded, never
    corpus-sized (the load_bpe_model contract). ``m``/``salt`` are
    None/''/True defaults on an empty artifact (nothing to score
    with)."""
    rows = spark.read.parquet(path).collect()
    classes: list[str] = []
    weights: dict[str, dict[int, float]] = {}
    biases: dict[str, float] = {}
    m, salt, bigrams = None, "", True
    for r in rows:
        if r["kind"] != "softmax":
            raise ValueError(f"not a softmax artifact: kind={r['kind']!r}")
        m, salt, bigrams = int(r["m"]), r["salt"], bool(r["bigrams"])
        c = r["cls"]
        if c not in weights:
            classes.append(c)
            weights[c] = {}
            biases[c] = 0.0
        if r["b"] == -1:
            biases[c] = float(r["w"])
        else:
            weights[c][int(r["b"])] = float(r["w"])
    return sorted(classes), weights, biases, m, salt, bigrams


def save_classifier_model(
    spark,
    path: str,
    weights: dict[int, float],
    bias: float,
    m: int,
    salt: str = "",
    bigrams: bool = True,
) -> None:
    """Binary twin of :func:`save_softmax_model` for
    ``hashed_classifier_fit`` output (``cls`` is NULL on every row;
    the bias rides as pseudo-bin -1)."""
    meta = (int(m), salt, bool(bigrams))
    rows = [("binary", None, -1, float(bias), *meta)]
    for b, wv in sorted(weights.items()):
        rows.append(("binary", None, int(b), float(wv), *meta))
    _write_model_rows(spark, path, rows)


def load_classifier_model(spark, path: str):
    """Load a frozen binary model written by
    :func:`save_classifier_model`: returns ``(weights, bias, m, salt,
    bigrams)``."""
    rows = spark.read.parquet(path).collect()
    weights: dict[int, float] = {}
    bias = 0.0
    m, salt, bigrams = None, "", True
    for r in rows:
        if r["kind"] != "binary":
            raise ValueError(f"not a binary artifact: kind={r['kind']!r}")
        m, salt, bigrams = int(r["m"]), r["salt"], bool(r["bigrams"])
        if r["b"] == -1:
            bias = float(r["w"])
        else:
            weights[int(r["b"])] = float(r["w"])
    return weights, bias, m, salt, bigrams
