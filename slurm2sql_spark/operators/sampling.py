"""Training-data sampling operators: deterministic (hash-bucket)
sampling, per-stratum rates, and domain-mixing fraction computation.

Why not ``df.sample()``/``sampleBy()``: their RNG draws depend on
partition layout and seed plumbing, so results change under
repartitioning and can't be replicated by another engine. Training-data
pipelines want *content-addressed* sampling — membership decided by a
hash of the row's identity — which is reproducible across engines,
cluster sizes, and re-runs, and lets a later pipeline stage re-derive
exactly the same subset. (Same motivation as the reference's
deterministic pseudonym hashing, deidentify.py, reused here for
sampling membership.)

Scale shape: a pure narrow filter — no shuffle, no RNG state, pushes
down column pruning to the scan; the md5 bucket is one JVM-intrinsic
expression per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket",
    "deterministic_sample",
    "mix_fractions",
    "mix_temperature",
    "sample_exact_k",
    "split_assign",
    "dsir_weights",
    "dsir_select",
    "lm_perplexity",
    "mw_rounds",
    "domain_reweight",
]

#: bucket space: first 8 md5 hex chars = 32 bits
_BUCKETS = float(1 << 32)


def hash_bucket(c: Column | str, salt: str = "") -> Column:
    """Uniform 32-bit bucket from the md5 of a row identity.

    Engine-portable on purpose: DuckDB computes the identical value as
    ``('0x' || substr(md5(CAST(id AS VARCHAR) || salt), 1, 8))::BIGINT``
    — the same idiom as ``dedup.md5_token_hash60``.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.conv(
        F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 8),
        16, 10,
    ).cast("long")


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    fraction: float | None = None,
    strata_col: str | None = None,
    strata_fractions: dict | None = None,
    salt: str = "",
) -> DataFrame:
    """Keep rows whose identity hash-bucket falls under the rate.

    Uniform mode: ``fraction`` applies to every row. Stratified mode:
    ``strata_fractions`` maps ``strata_col`` values to per-stratum
    rates (absent strata are dropped — pass a rate of 1.0 to keep one
    whole). ``salt`` decorrelates independent samples over the same
    corpus (different salt -> statistically independent subsets).
    """
    b = hash_bucket(id_col, salt)
    if strata_fractions is not None:
        if strata_col is None:
            raise ValueError("strata_fractions requires strata_col")
        rate = None
        for value, frac in sorted(strata_fractions.items()):
            cond = F.col(strata_col) == value
            rate = F.when(cond, F.lit(float(frac))) if rate is None else rate.when(cond, F.lit(float(frac)))
        rate = rate.otherwise(F.lit(0.0))
    elif fraction is not None:
        rate = F.lit(float(fraction))
    else:
        raise ValueError("pass fraction or strata_fractions")
    return df.filter(b < rate * F.lit(_BUCKETS))


def mix_fractions(
    df: DataFrame,
    strata_col: str,
    targets: dict,
    quantize: int = 1_000_000,
) -> DataFrame:
    """Per-stratum sampling fractions that hit a target mix with maximum
    retention (downsample-only domain mixing).

    Given target shares ``targets`` (e.g. ``{"web": .5, "code": .3,
    "wiki": .2}``), the largest total sample a downsample-only plan can
    produce keeps ``R = min_s(n_s / (N * t_s))`` of the corpus; each
    stratum then samples at ``fraction_s = t_s * R * N / n_s`` (the
    binding stratum at 1.0). One count aggregation (|strata| rows) plus
    arithmetic — feed the result to ``deterministic_sample``.

    ``quantize`` floor-quantizes fractions (1e-6 steps) so results are
    engine-portable bit-for-bit.
    """
    t = F.create_map(
        *[F.lit(x) for kv in sorted(targets.items()) for x in kv]
    )
    counts = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.agg(F.sum("n").alias("_total"))  # not "N": Spark resolves
    # column names case-insensitively by default, so n/N would collide
    with_t = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn("target", t[F.col("stratum")])
        .filter(F.col("target").isNotNull())
    )
    # R = min over strata of n_s / (N * t_s)
    r = with_t.agg(
        F.min(F.col("n") / (F.col("_total") * F.col("target"))).alias("_r")
    )
    q = float(quantize)
    frac = F.least(
        F.lit(1.0),
        F.floor(
            F.col("target") * F.col("_r") * F.col("_total") / F.col("n") * q + 0.001
        ) / q,
    )
    return (
        with_t.crossJoin(F.broadcast(r))
        .select("stratum", "n", frac.alias("fraction"))
    )


def sample_exact_k(
    df: DataFrame,
    id_col: str,
    k: int,
    strata_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """EXACT-k deterministic sample (per stratum if ``strata_col``):
    rank rows by their identity hash and keep the k smallest — the
    content-addressed analog of a fixed-size reservoir, for eval sets
    and few-shot pools where "about 1%" isn't acceptable.

    Deterministic under repartitioning AND replicable by another engine
    (rank by md5 bucket with an ``id_col`` tie-break — total order, no
    RNG). Unlike rate-based ``deterministic_sample`` (a narrow filter),
    exact-k needs a per-stratum sort: one shuffle on ``strata_col``
    (single partition when unstratified — use only for k·|strata| that
    fit a task, i.e. eval-set-sized outputs, not corpus resharding; at
    100 TB the strata partitioning is what keeps this parallel).
    A stratum with fewer than k rows keeps them all.
    """
    from pyspark.sql import Window

    b = hash_bucket(id_col, salt)
    part = [strata_col] if strata_col else []
    # nulls LAST, matching SQL ORDER BY defaults (a NULL id hashes to a
    # NULL bucket; Spark's default nulls-first would let it always win)
    w = Window.partitionBy(*part).orderBy(
        b.asc_nulls_last(), F.col(id_col).asc_nulls_last()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def split_assign(
    df: DataFrame,
    id_col: str,
    splits: dict,
    salt: str = "",
) -> DataFrame:
    """Deterministic train/val/test assignment: adds a ``split`` column
    chosen by the identity hash-bucket falling into consecutive
    fraction ranges (``splits`` maps name -> fraction, summing to
    <= 1.0; any remainder assigns NULL — an explicit holdout).

    Content-addressed like ``deterministic_sample``: a row's split
    never changes across runs, engines, or growing corpora (new rows
    land in splits at the target rates; old rows stay put) — the
    property that prevents train/test leakage when a corpus is
    re-snapshotted. Narrow map, no shuffle.
    """
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    b = hash_bucket(id_col, salt)
    expr = None
    edge = 0.0
    # insertion order = range order, pinned so callers control layout
    for name, frac in splits.items():
        edge += float(frac)
        cond = b < F.lit(edge) * F.lit(_BUCKETS)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr.otherwise(F.lit(None).cast("string")))


def gram_array(text_col: str, bigrams: bool = True) -> Column:
    """The hashed-featurization GRAM ARRAY as one Column expression:
    lowercase whitespace unigrams plus adjacent ``w[i] + ' ' + w[i+1]``
    bigrams. This is the single source of the tokenization every
    hashed-n-gram consumer shares — DSIR, LM perplexity, and the
    linear classifier's join AND inline scorers — so their
    featurizations cannot drift apart (their parity gates depend on
    bit-identical grams). Note an empty/NULL text yields one
    empty-string unigram (``split('') = ['']``), matching the DuckDB
    ``string_split_regex`` twin."""
    from .textstats import WS_RE2

    t = F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), WS_RE2)
    if not bigrams:
        return t
    # NOTE: this single-expression form must keep the zip_with(slice,
    # slice) build: ``t`` here is an arbitrary (often inline-split)
    # expression tree, and every top-level reference to it is shared
    # by codegen subexpression elimination — whereas referencing it
    # inside a transform lambda (the ``with_bigrams`` fast form) would
    # re-evaluate the split PER ELEMENT. Consumers that can project
    # the word array first should use ``words_array`` +
    # ``with_bigrams`` instead (see the perf contract there).
    n = F.size(t)
    bi = F.when(
        n >= 2,
        F.zip_with(
            F.slice(t, 1, n - 1),
            F.slice(t, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(t, bi)


def words_array(text_col: str) -> Column:
    """The shared tokenization (lowercase, trim, whitespace split) as
    a bare word-array Column — project this FIRST, then feed the bound
    attribute to :func:`with_bigrams`, so the split evaluates once per
    row while the bigram build runs the cheap bound-reference form."""
    from .textstats import WS_RE2

    return F.split(
        F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), WS_RE2
    )


def with_bigrams(words: Column) -> Column:
    """``words ++ adjacent bigrams`` from a word-array Column.

    PERF CONTRACT: pass a BOUND column (a projected attribute), not an
    inline expression tree. Every reference to ``words`` at the TOP
    level of this expression is shared by codegen subexpression
    elimination, but ``element_at(words, i)`` inside the transform
    lambda is re-evaluated PER ELEMENT — an inline ``split(...)``
    there turns the bigram build O(n^2) in the document length
    (measured: the sf0.1 gram explode went 0.6 s -> 6.1 s when the
    split expression was inlined into the lambda). With a bound
    attribute the lambda reference is a cheap slot read and this form
    beats the former ``zip_with(slice, slice)`` build 0.32 s vs
    0.57 s on the same stream (no two intermediate array copies).

    The ``n >= 2`` guard is load-bearing: ``sequence(2, 1)`` counts
    DOWN (step defaults to -1 when start > stop), not empty.
    """
    n = F.size(words)
    bi = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(2), n),
            lambda i: F.concat(
                F.element_at(words, i - 1), F.lit(" "), F.element_at(words, i)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(words, bi)


def _hashed_ngram_occurrences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    m: int,
    salt: str,
    bigrams: bool = True,
) -> DataFrame:
    """One row per (doc, hashed n-gram occurrence): ``gram_array``
    md5-bucketed into ``m`` feature bins (DSIR's hashed bag-of-ngrams
    featurization).

    Engine-portable on purpose: the DuckDB twin is
    ``('0x' || substr(md5(gram || salt), 1, 8))::BIGINT % m`` over
    ``string_split_regex(trim(lower(text)), '[ \\t\\n\\r\\f]+')``
    unigrams and 1-indexed ``w[i] || ' ' || w[i+1]`` bigrams. Narrow
    explode in the scan stage — no shuffle; the fan-out is bounded by
    2x tokens per doc.
    """
    if bigrams:
        # Two-step projection: bind the word array first so the
        # bigram transform references a computed attribute (the
        # with_bigrams perf contract — the split runs once per row,
        # not once per bigram element). The optimizer keeps the
        # projection boundary because the alias is referenced more
        # than once and split() is not cheap (CollapseProject's
        # duplication guard). Gram strings are bit-identical to the
        # single-expression gram_array form.
        words = df.select(F.col(id_col), words_array(text_col).alias("_w"))
        occ = words.select(
            F.col(id_col), F.explode(with_bigrams(F.col("_w"))).alias("gram")
        )
    else:
        occ = df.select(
            F.col(id_col),
            F.explode(gram_array(text_col, bigrams)).alias("gram"),
        )
    return occ.select(
        F.col(id_col),
        (hash_bucket(F.col("gram"), salt) % F.lit(m)).alias("b"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    m: int = 4096,
    alpha: float = 1.0,
    salt: str = "",
    bigrams: bool = True,
) -> DataFrame:
    """Per-document DSIR importance log-weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling",
    NeurIPS — public paper; no reference-repo analog, this extends the
    engine's curation family).

    Features are hashed n-grams (unigrams + bigrams -> ``m`` bins);
    the target and raw corpora each induce a smoothed multinomial over
    bins, and a document's weight is its log-likelihood ratio:
    ``sum over gram occurrences of ln(p_target(b)/p_raw(b))`` with
    add-``alpha`` smoothing. Returns ``(id, logw)``, one row per raw
    document with at least one token.

    Scale design (100 TB raw corpus, bounded target):
    - the only corpus-sized shuffles are two m-BOUNDED count
      aggregations (map-side combined: each task emits <= m partial
      rows regardless of input size) and the per-doc sum (map-side
      combined on the doc key, no skew — every doc contributes its
      own rows only);
    - the bin ratio table is <= m rows (m defaults to 4096) and
      BROADCASTS to the occurrence stream — the per-doc join never
      shuffles the corpus;
    - raw-side bins always exist in the raw count frame (every doc's
      grams are counted), so the ratio join is an inner join with no
      null legs; target-absent bins take the smoothed floor via a
      left join + coalesce(0).
    """
    if m <= 0:
        raise ValueError(f"m must be positive, got {m}")
    # collapse the raw side to (doc, bin) grains FIRST: the fan-out of
    # the explode dies in a map-side-combinable aggregate, and both
    # downstream consumers (the corpus bin counts and the per-doc
    # weight sum) read the collapsed frame — one corpus scan, and the
    # ratio join processes ~distinct-bins-per-doc rows instead of
    # every gram occurrence (the paragraph_stats grain idiom).
    from .dedup import _persist

    r_occ = _persist(
        _hashed_ngram_occurrences(raw, id_col, text_col, m, salt, bigrams)
        .groupBy(id_col, "b")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    t_occ = _hashed_ngram_occurrences(target, id_col, text_col, m, salt, bigrams)
    r_cnt = r_occ.groupBy("b").agg(F.sum("_n").alias("cr"))
    t_cnt = t_occ.groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    # scalar totals: tiny frames (<= m rows) crossJoined as 1-row
    # literals — the q22/q11 broadcast-cutoff idiom, never a re-scan
    r_tot = r_cnt.agg(F.sum("cr").alias("rt"))
    t_tot = t_cnt.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("tt"))
    am = float(alpha) * m
    ratio = (
        r_cnt.join(t_cnt, "b", "left")
        .crossJoin(F.broadcast(r_tot))
        .crossJoin(F.broadcast(t_tot))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(float(alpha)))
                    / (F.col("tt") + F.lit(am))
                )
                - F.log(
                    (F.col("cr") + F.lit(float(alpha)))
                    / (F.col("rt") + F.lit(am))
                )
            ).alias("lr"),
        )
    )
    return (
        r_occ.join(F.broadcast(ratio), "b")
        .groupBy(id_col)
        .agg(F.sum(F.col("_n") * F.col("lr")).alias("logw"))
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    m: int = 4096,
    alpha: float = 1.0,
    salt: str = "",
    bigrams: bool = True,
) -> DataFrame:
    """DSIR selection: top-``k`` raw documents by importance weight
    plus deterministic Gumbel noise — sampling WITHOUT replacement
    with probability proportional to exp(logw) (the Gumbel-top-k
    trick), but content-addressed like every sampler here: the noise
    is derived from the document identity's md5, so the selected set
    is reproducible across engines, partitionings, and re-runs.

    Output ``(id, weight)`` where weight = floor-quantized logw (1e-6
    quanta — both engines sum the same bin ratios; quantization
    absorbs last-ulp libm divergence in ln()). Ordering/membership is
    decided on the quantized Gumbel-perturbed score with the id as
    the final tie-break.

    Scale: everything in ``dsir_weights`` plus one TakeOrdered over
    per-doc rows — no global sort is materialized.
    """
    w = dsir_weights(raw, target, id_col, text_col, m, alpha, salt, bigrams)
    u = (hash_bucket(id_col, salt + "g1") + F.lit(0.5)) / F.lit(_BUCKETS)
    gumbel = -F.log(-F.log(u))
    quant = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.001)) / F.lit(1e6)  # noqa: E731
    return (
        w.select(
            F.col(id_col),
            quant(F.col("logw")).alias("weight"),
            quant(F.col("logw") + gumbel).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(int(k))
        .select(id_col, "weight")
    )


def lm_perplexity(
    raw: DataFrame,
    reference: DataFrame,
    id_col: str,
    text_col: str,
    m: int = 4096,
    alpha: float = 1.0,
    salt: str = "",
    bigrams: bool = True,
) -> DataFrame:
    """Per-document log-perplexity under a hashed n-gram LM trained on
    a REFERENCE corpus — the CCNet-style quality signal (Wenzek et al.
    2020, "CCNet: Extracting High Quality Monolingual Datasets from
    Web Crawl Data", LREC — public paper; CCNet uses a KenLM 5-gram,
    here the LM is the same hashed unigram+bigram multinomial the DSIR
    machinery trains, so the feature pipeline is shared, not
    duplicated).

    The reference corpus induces an add-``alpha``-smoothed multinomial
    over ``m`` hashed bins; a document's score is its per-gram
    cross-entropy in nats: ``logppl = -(1/n) * sum ln p_ref(bin)``
    over its gram occurrences. Lower = more reference-like. Returns
    ``(id, n_grams, logppl)`` for raw docs with >= 1 token; quantize
    downstream (the catalog entry floor-quantizes at 1e-6, the
    ``dsir_select`` discipline, so last-ulp ln() divergence between
    engines cannot leak into comparisons).

    Scale contract (identical to ``dsir_weights`` — sampling.py:244):
    the only corpus-sized shuffles are the (doc, bin) grain collapse
    (map-side combined, fan-out bounded by 2x tokens/doc) and the
    per-doc sum; the reference's bin table is <= ``m`` rows and
    BROADCASTS. The reference corpus is scanned once; the raw corpus
    once.
    """
    if m <= 0:
        raise ValueError(f"m must be positive, got {m}")
    r_occ = (
        _hashed_ngram_occurrences(raw, id_col, text_col, m, salt, bigrams)
        .groupBy(id_col, "b")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    t_occ = _hashed_ngram_occurrences(
        reference, id_col, text_col, m, salt, bigrams
    )
    t_cnt = t_occ.groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    t_tot = t_cnt.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("tt"))
    am = float(alpha) * m
    logp = t_cnt.crossJoin(F.broadcast(t_tot)).select(
        "b",
        F.log(
            (F.col("ct") + F.lit(float(alpha))) / (F.col("tt") + F.lit(am))
        ).alias("lp"),
    )
    # bins absent from the reference take the smoothed floor
    # ln(alpha / (tt + alpha*m)) — computed per-row from the broadcast
    # scalar so the left join needs no full m-bin densification
    floor_lp = F.log(F.lit(float(alpha)) / (F.col("tt") + F.lit(am)))
    return (
        r_occ.join(F.broadcast(logp), "b", "left")
        .crossJoin(F.broadcast(t_tot))
        .groupBy(id_col)
        .agg(
            F.sum("_n").alias("n_grams"),
            (
                -F.sum(F.col("_n") * F.coalesce(F.col("lp"), floor_lp))
                / F.sum("_n")
            ).alias("logppl"),
        )
    )


def mix_temperature(
    df: DataFrame,
    stratum_col: str,
    temperature: float,
) -> DataFrame:
    """Temperature-scaled domain mixing (the multilingual sampling
    idiom of Conneau & Lample 2019 / mT5): target mixture
    ``p_i = n_i^(1/T) / sum_j n_j^(1/T)``, flattening the corpus
    distribution as T grows (T=1 reproduces natural proportions,
    T→inf approaches uniform), then the same downsample-only
    retention logic as :func:`mix_fractions` — scale all targets by
    ``R = min_i n_i / (N * p_i)`` so the binding (most up-weighted)
    stratum keeps everything and no stratum needs upsampling.

    Returns ``(stratum, n, target, fraction)``; feed the fractions to
    :func:`deterministic_sample`. Targets and fractions are
    floor-quantized at 1e-6 (pow/min are libm on both engines).

    Scale: one |strata|-bounded count aggregate (map-side combined),
    then arithmetic over the tiny frame with two 1-row broadcast
    crossJoins for the scalar sums — never a second corpus scan.
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    from .dedup import _persist

    a = 1.0 / float(temperature)
    quant = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.001)) / F.lit(1e6)  # noqa: E731
    # persist the |strata|-row counts: the scalar crossJoins below
    # embed this frame on FOUR plan sides, and Spark does not share
    # subplans across join sides — unpersisted, whatever corpus
    # pipeline feeds `df` (e.g. crawl_frontier's canonical-key
    # distinct) executes four times. Released by catalog.drop_caches
    # -> dedup.release_caches (the tfidf persist contract).
    counts = _persist(
        df.groupBy(F.col(stratum_col).alias("stratum")).agg(
            F.count(F.lit(1)).alias("n")
        )
    )
    powed = counts.withColumn("_pw", F.pow(F.col("n"), F.lit(a)))
    tots = powed.agg(
        F.sum("_pw").alias("_s"), F.sum("n").alias("_N")
    )
    tgt = powed.crossJoin(F.broadcast(tots)).select(
        "stratum",
        "n",
        (F.col("_pw") / F.col("_s")).alias("_p"),
        "_N",
    )
    r = tgt.agg(F.min(F.col("n") / (F.col("_N") * F.col("_p"))).alias("_r"))
    return tgt.crossJoin(F.broadcast(r)).select(
        "stratum",
        "n",
        quant(F.col("_p")).alias("target"),
        quant(
            F.least(
                F.lit(1.0),
                F.col("_p") * F.col("_r") * F.col("_N") / F.col("n"),
            )
        ).alias("fraction"),
    )


def mw_rounds(
    domains: list[tuple[str, float]],
    rounds: int = 5,
    eta: float = 0.5,
    smoothing: float = 0.01,
    quantize: int = 1_000_000,
) -> dict[str, float]:
    """Pure multiplicative-weights iteration over (domain, loss) pairs
    — the DoReMi update rule (Xie et al. 2023, "DoReMi: Optimizing
    Data Mixtures Speeds Up Language Model Pretraining", NeurIPS;
    public paper) with static per-domain excess loss: domains whose
    loss exceeds the current weighted-mean loss gain weight each
    round, then the mixture is renormalized and smoothed toward
    uniform. The linearized update ``w *= 1 + eta * excess`` is used
    instead of ``exp(eta * excess)`` so the whole recurrence is
    +,*,/-only — exactly replayable as chained SQL CTEs with no libm
    exp() divergence to absorb.

    Every intermediate is floor-quantized at ``1/quantize`` with the
    +1e-3 nudge (the classifier's cross-engine lockstep,
    operators/classifier.py:_q) so the SQL replay is bit-identical:
    L_t = q(sum w*loss); excess_d = q(max(loss_d - L_t, 0));
    w' = q(w * (1 + eta*excess)); w = q((1-s) * q(w'/q(sum w')) + s/m).
    """
    from .classifier import _q

    doms = sorted(domains)
    m = len(doms)
    if m == 0:
        return {}
    w = {d: _q(1.0 / m, quantize) for d, _ in doms}
    for _ in range(int(rounds)):
        big_l = _q(sum(w[d] * loss for d, loss in doms), quantize)
        up = {
            d: _q(
                w[d] * (1.0 + eta * _q(max(loss - big_l, 0.0), quantize)),
                quantize,
            )
            for d, loss in doms
        }
        tot = _q(sum(up[d] for d, _ in doms), quantize)
        w = {
            d: _q(
                (1.0 - smoothing) * _q(up[d] / tot, quantize)
                + smoothing / m,
                quantize,
            )
            for d, _ in doms
        }
    return w


def domain_reweight(
    loss_df: DataFrame,
    domain_col: str,
    loss_col: str,
    rounds: int = 5,
    eta: float = 0.5,
    smoothing: float = 0.01,
    quantize: int = 1_000_000,
) -> DataFrame:
    """DoReMi-style domain reweighting over a per-domain loss table:
    appends a ``weight`` column — the trained sampling mixture —
    to ``loss_df`` via :func:`mw_rounds`.

    Scale contract: ``loss_df`` is |domains|-bounded (it is already an
    aggregate), so the collect here is the classifier's documented
    m-bounded driver step, never corpus-sized; the weight table
    broadcasts back. The corpus itself is touched only upstream, once,
    to build the loss table. ``domain_col`` must be non-NULL strings.
    """
    rows = loss_df.select(domain_col, loss_col).collect()
    w = mw_rounds(
        [(r[0], float(r[1])) for r in rows],
        rounds=rounds,
        eta=eta,
        smoothing=smoothing,
        quantize=quantize,
    )
    spark = loss_df.sparkSession
    wdf = spark.createDataFrame(
        sorted(w.items()), f"{domain_col} string, weight double"
    )
    return loss_df.join(F.broadcast(wdf), domain_col)
