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

Scale contract (the ``dsir_weights`` shape, sampling.py:245):

- per epoch: ONE map-side-combined per-doc aggregation (the score
  sum), one doc-keyed join of the residual back to the feature grain,
  and one m-BOUNDED gradient aggregation (each map task emits <= m
  partial rows); the m-row weight table BROADCASTS;
- the feature grain ``(doc, bin, x)`` is computed once and persisted
  across epochs + the final scoring pass (one corpus tokenize total);
- driver traffic is one m-row collect per epoch — bounded by m and
  epochs, never by corpus size (the IVF centroid-collect precedent).

At 100 TB with m=4096 and 2-5 epochs this is a handful of linear
passes; the classifier itself (m weights + bias) is a broadcast
scalar. No reference-repo analog; VERDICT r10 "next round" #2.
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
]


def _q(v: float, quantize: int) -> float:
    """Driver-side twin of the catalog's floor quantizer (``_q6``):
    floor(v*q + 1e-3)/q — the 1e-3 nudge absorbs summation-order FP
    noise identically on both engines."""
    return math.floor(v * quantize + 1e-3) / quantize


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
    featurizes — see ``_features``).
    """
    if epochs < 1:
        raise ValueError(f"epochs must be >= 1, got {epochs}")
    from .dedup import _persist

    spark = df.sparkSession
    feat = _persist(_features(df, id_col, text_col, m, salt, bigrams))
    labels = df.select(
        F.col(id_col), F.col(label_col).cast("double").alias("_y")
    )
    n_docs = feat.select(id_col).distinct().count()
    if n_docs == 0:
        return {}, 0.0

    w: dict[int, float] = {}
    bias = 0.0
    for _ in range(int(epochs)):
        if w:
            wdf = F.broadcast(
                spark.createDataFrame(
                    sorted(w.items()), "b int, _w double"
                )
            )
            scored = (
                feat.join(wdf, "b", "left")
                .groupBy(id_col)
                .agg(
                    F.sum(
                        F.col("x") * F.coalesce(F.col("_w"), F.lit(0.0))
                    ).alias("_s")
                )
            )
        else:
            # first epoch: w=0 -> score is just the bias (0)
            scored = feat.groupBy(id_col).agg(F.lit(0.0).alias("_s"))
        resid = scored.join(labels, id_col).select(
            id_col,
            (
                F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("_s") + F.lit(bias))))
                - F.col("_y")
            ).alias("_r"),
        )
        # ONE aggregation + ONE m-row collect per epoch: the bias
        # gradient rides as pseudo-bin -1 with x=1 (sum(1*resid)/N is
        # exactly mean residual), instead of a second driver job
        base = feat.select(id_col, "b", "x").unionByName(
            resid.select(
                F.col(id_col),
                F.lit(-1).alias("b"),
                F.lit(1.0).alias("x"),
            )
        )
        grad_rows = (
            base.join(resid, id_col)
            .groupBy("b")
            .agg((F.sum(F.col("x") * F.col("_r")) / F.lit(n_docs)).alias("g"))
            .collect()
        )
        for row in grad_rows:
            if row["b"] == -1:
                # pseudo-bin: sum(resid)/N == avg(resid)
                bias = _q(bias - lr * row["g"], quantize)
            else:
                w[row["b"]] = _q(
                    w.get(row["b"], 0.0) - lr * row["g"], quantize
                )
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
    export rehashed into the same m bins). The weight table is <= m
    rows and BROADCASTS; the only corpus-sized shuffle is the per-doc
    score aggregation (map-side combined). Every input document is
    scored — empty/NULL text featurizes as one empty-string unigram
    (see ``_features``), it is never dropped.
    """
    spark = df.sparkSession
    feat = _features(df, id_col, text_col, m, salt, bigrams)
    if weights:
        wdf = F.broadcast(
            spark.createDataFrame(sorted(weights.items()), "b int, _w double")
        )
        summed = (
            feat.join(wdf, "b", "left")
            .groupBy(id_col)
            .agg(
                F.sum(
                    F.col("x") * F.coalesce(F.col("_w"), F.lit(0.0))
                ).alias("_s")
            )
        )
    else:
        summed = feat.groupBy(id_col).agg(F.lit(0.0).alias("_s"))
    q = F.lit(float(quantize))
    score = F.floor(
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("_s") + F.lit(bias)))))
        * q
        + F.lit(1e-3)
    ) / q
    return summed.select(
        F.col(id_col),
        score.alias("score"),
        (score >= F.lit(float(threshold))).alias("keep"),
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

    Scale contract (the binary fit's shape, times k): per epoch one
    (k x m)-row broadcast of the weight table, one map-side-combined
    per-(doc, class) score sum, one per-doc softmax denominator
    aggregation, and one (k x (m+1))-BOUNDED gradient aggregate
    collected to the driver. The feature grain persists across epochs
    — the corpus tokenizes once.
    """
    if epochs < 1:
        raise ValueError(f"epochs must be >= 1, got {epochs}")
    from .dedup import _persist

    spark = df.sparkSession
    feat = _persist(_features(df, id_col, text_col, m, salt, bigrams))
    labels = df.select(
        F.col(id_col), F.col(label_col).cast("string").alias("_y")
    )
    classes = sorted(
        r["_y"] for r in labels.select("_y").distinct().collect()
        if r["_y"] is not None
    )
    n_docs = feat.select(id_col).distinct().count()
    if n_docs == 0 or not classes:
        return classes, {}, {}
    k = len(classes)
    clsdf = spark.createDataFrame([(c,) for c in classes], "_cls string")
    # per-(doc, class) one-hot targets — k x N rows, but never shuffled
    # at that grain: it joins back on the doc key only
    # eqNullSafe: a NULL label is simply "none of the classes" (all
    # targets 0.0, matching SQL CASE-with-ELSE semantics), never a
    # NULL target that would poison the gradients
    ydf = labels.crossJoin(F.broadcast(clsdf)).select(
        id_col,
        "_cls",
        F.col("_y").eqNullSafe(F.col("_cls")).cast("double").alias("_yc"),
    )

    w: dict[str, dict[int, float]] = {c: {} for c in classes}
    bias: dict[str, float] = {c: 0.0 for c in classes}
    for _ in range(int(epochs)):
        flat = [
            (c, b, wv)
            for c in classes
            for b, wv in sorted(w[c].items())
        ]
        if flat:
            wdf = F.broadcast(
                spark.createDataFrame(flat, "_cls string, b int, _w double")
            )
            summed = (
                feat.join(wdf, "b")
                .groupBy(id_col, "_cls")
                .agg(F.sum(F.col("x") * F.col("_w")).alias("_s"))
            )
            # docs/classes with no matching bins score 0: rebuild the
            # dense (doc, class) grid from the one-hot frame
            scored = ydf.select(id_col, "_cls").join(
                summed, [id_col, "_cls"], "left"
            ).select(
                id_col, "_cls", F.coalesce(F.col("_s"), F.lit(0.0)).alias("_s")
            )
        else:
            scored = ydf.select(id_col, "_cls", F.lit(0.0).alias("_s"))
        bdf = F.broadcast(
            spark.createDataFrame(
                [(c, bias[c]) for c in classes], "_cls string, _b double"
            )
        )
        ex = scored.join(bdf, "_cls").select(
            id_col, "_cls", F.exp(F.col("_s") + F.col("_b")).alias("_e")
        )
        den = ex.groupBy(id_col).agg(F.sum("_e").alias("_den"))
        resid = (
            ex.join(den, id_col)
            .join(ydf, [id_col, "_cls"])
            .select(
                id_col,
                "_cls",
                (F.col("_e") / F.col("_den") - F.col("_yc")).alias("_r"),
            )
        )
        # ONE gradient aggregation per epoch: bias rides as pseudo-bin
        # -1 with x=1 (the binary fit's trick, per class)
        base = feat.select(id_col, "b", "x").join(resid, id_col)
        base = base.unionByName(
            resid.select(
                F.col(id_col),
                F.lit(-1).alias("b"),
                F.lit(1.0).alias("x"),
                "_cls",
                "_r",
            )
        )
        grad_rows = (
            base.groupBy("_cls", "b")
            .agg((F.sum(F.col("x") * F.col("_r")) / F.lit(n_docs)).alias("g"))
            .collect()
        )
        for row in grad_rows:
            c = row["_cls"]
            if row["b"] == -1:
                bias[c] = _q(bias[c] - lr * row["g"], quantize)
            else:
                w[c][row["b"]] = _q(
                    w[c].get(row["b"], 0.0) - lr * row["g"], quantize
                )
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

    Same scale shape as the binary scorer times k: the (k x m) weight
    table broadcasts, scores aggregate map-side per (doc, class), the
    softmax denominator is one per-doc sum, and the argmax is one
    bounded window over k rows per doc."""
    from pyspark.sql import Window

    spark = df.sparkSession
    feat = _features(df, id_col, text_col, m, salt, bigrams)
    clsdf = spark.createDataFrame([(c,) for c in classes], "_cls string")
    docs = feat.select(id_col).distinct()
    grid = docs.crossJoin(F.broadcast(clsdf))
    flat = [
        (c, b, wv)
        for c in classes
        for b, wv in sorted(weights.get(c, {}).items())
    ]
    if flat:
        wdf = F.broadcast(
            spark.createDataFrame(flat, "_cls string, b int, _w double")
        )
        summed = (
            feat.join(wdf, "b")
            .groupBy(id_col, "_cls")
            .agg(F.sum(F.col("x") * F.col("_w")).alias("_s"))
        )
        scored = grid.join(summed, [id_col, "_cls"], "left").select(
            id_col, "_cls", F.coalesce(F.col("_s"), F.lit(0.0)).alias("_s")
        )
    else:
        scored = grid.select(id_col, "_cls", F.lit(0.0).alias("_s"))
    bdf = F.broadcast(
        spark.createDataFrame(
            [(c, float(biases.get(c, 0.0))) for c in classes],
            "_cls string, _b double",
        )
    )
    ex = scored.join(bdf, "_cls").select(
        id_col, "_cls", F.exp(F.col("_s") + F.col("_b")).alias("_e")
    )
    den = ex.groupBy(id_col).agg(F.sum("_e").alias("_den"))
    q = F.lit(float(quantize))
    prob = F.floor((F.col("_e") / F.col("_den")) * q + F.lit(1e-3)) / q
    ranked = ex.join(den, id_col).select(
        id_col, "_cls", prob.alias("_p")
    )
    win = Window.partitionBy(id_col).orderBy(
        F.col("_p").desc(), F.col("_cls").asc()
    )
    return (
        ranked.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(id_col),
            F.col("_cls").alias("pred"),
            F.col("_p").alias("score"),
        )
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
