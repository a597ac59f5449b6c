"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``: exact brute-force top-k — broadcast the (small) query
  set against the corpus scan; dot products run JVM-side via
  ``zip_with``/``aggregate`` (no Python), then a per-query window top-k.
  O(Q x N) work but embarrassingly parallel over the corpus: the right
  baseline, and the right *tool* whenever Q is small.
- ``lsh_signatures`` / ``lsh_topk``: random-hyperplane LSH — the scale
  path. Each vector gets a ``planes``-bit signature from sign(v . r_p)
  with deterministic pseudo-random planes (fixed-seed, no state to
  broadcast); candidates share a signature band, so the join touches a
  small fraction of the corpus. Approximate: recall tuned by
  bands/planes. Signatures are computed by an Arrow-batched Pandas UDF
  (one numpy matmul per batch) — a pure Column-expression version needs
  planes x dim ``element_at`` terms, which blows past codegen limits
  (>2 MB task binaries at 32x64) for no throughput gain.
- ``embedding_near_dup_pairs``: corpus self near-dup at a cosine
  threshold via the same LSH bucketing.
"""

from __future__ import annotations

import logging

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)

__all__ = [
    "dot",
    "l2_norm",
    "cosine",
    "cosine_topk",
    "lsh_signatures",
    "lsh_topk",
    "embedding_near_dup_pairs",
    "tune_lsh",
    "ivf_centroids",
    "ivf_cell_counts",
    "ivf_assign",
    "ivf_topk",
    "quantize_embeddings",
    "dequantize_embeddings",
    "quantized_topk",
    "semdedup",
]

#: centroid-matrix broadcasts, keyed by (sparkContext id, sha1 of the
#: normalized matrix bytes) — see ivf_assign for the reuse/eviction
#: contract.
_BROADCASTS: dict = {}


def dot(a: Column, b: Column) -> Column:
    """Elementwise product folded left-to-right (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


def _cosine_prenormed(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """``cosine`` with the two l2 norms supplied as columns.

    Every pair-join site used to evaluate ``cosine(a, b)`` per PAIR,
    recomputing each vector's norm once per partner (~|cell| or |Q|
    times); hoisting ``l2_norm`` into the pre-join projections makes it
    once per VECTOR. Bit-identical by construction — the same fold over
    the same array yields the same double wherever it is evaluated, and
    the dot/nullif tail is unchanged (r15, guide §2.2: shuffle/compute
    fewer bytes per joined row; measured 3.4 -> 1.4 s on the semdedup
    pair join at sf0.1, edge set equal)."""
    return dot(a, b) / F.nullif(na * nb, F.lit(0.0))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "c_id",
    c_vec: str = "c_vec",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self-matches).

    The query side is broadcast — at cluster scale the corpus scan
    parallelizes across executors with zero shuffle; the only shuffle is
    the final per-query top-k, keyed on q_id (|Q| keys).
    """
    qv = F.col(q_vec).cast("array<double>")
    cv = F.col(c_vec).cast("array<double>")
    qs = queries.select(
        F.col(q_id).alias("q_id"), qv.alias("q_vec"), l2_norm(qv).alias("_qn")
    )
    cs = corpus.select(
        F.col(c_id).alias("c_id"), cv.alias("c_vec"), l2_norm(cv).alias("_cn")
    )
    sim = (
        cs.join(F.broadcast(qs), F.col("q_id") != F.col("c_id"))
        .withColumn(
            "sim",
            _cosine_prenormed(
                F.col("q_vec"), F.col("c_vec"), F.col("_qn"), F.col("_cn")
            ),
        )
        .select("q_id", "c_id", "sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("c_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "sim", "rank")
    )


_LSH_SEED = 0x5EED_15B  # fixed: signatures must agree across runs/executors


def _plane_matrix(planes: int, dim: int):
    """Deterministic (planes x dim) hyperplane matrix — recomputed from a
    fixed seed inside each executor, so nothing is shipped or broadcast."""
    import numpy as np

    rng = np.random.default_rng(_LSH_SEED)
    return rng.uniform(-0.5, 0.5, size=(planes, dim))


def lsh_signatures(
    df: DataFrame, id_col: str, vec_col: str, planes: int = 16, dim: int = 64
) -> DataFrame:
    """Sign-of-projection bit signature per vector (one long column).

    Vectorized: each Arrow batch becomes one ``(n, dim) @ (dim, planes)``
    numpy matmul, then a bit-pack — O(n) Python calls per *batch*, not
    per row."""

    @F.pandas_udf("long")
    def _sig(v: pd.Series) -> pd.Series:
        import numpy as np

        planes_t = _plane_matrix(planes, dim).T  # (dim, planes)
        mat = np.stack(v.to_numpy()).astype(np.float64)  # (n, dim)
        bits = (mat @ planes_t) > 0  # (n, planes)
        weights = (1 << np.arange(planes)).astype(np.int64)
        return pd.Series(bits.astype(np.int64) @ weights)

    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _sig(F.col(vec_col).cast("array<double>")).alias("sig"),
    )


def _band_key_rows(
    df: DataFrame, id_col: str, vec_col: str, planes: int, bands: int, dim: int
) -> DataFrame:
    """(id, band, key) rows computed directly from the vectors: the
    signature bits are packed PER BAND (``planes/bands`` bits each), so
    total planes are unlimited (the single-long ``lsh_signatures``
    packing caps at 63 — too few for ``tune_lsh`` output on large
    corpora). Bit-compatible with slicing the packed signature: band b
    holds planes [b*w, (b+1)*w)."""
    assert planes % bands == 0, (
        f"planes ({planes}) must be divisible by bands ({bands}) — "
        "otherwise the trailing planes would be silently dropped "
        "(matching minhash_lsh_pairs' num_hashes % bands assert)"
    )
    w = planes // bands

    @F.pandas_udf("array<long>")
    def _keys(v: pd.Series) -> pd.Series:
        import numpy as np

        planes_t = _plane_matrix(w * bands, dim).T  # (dim, total)
        mat = np.stack(v.to_numpy()).astype(np.float64)
        bits = (mat @ planes_t) > 0  # (n, total)
        weights = (1 << np.arange(w)).astype(np.int64)
        ks = bits.reshape(len(mat), bands, w).astype(np.int64) @ weights
        return pd.Series(list(ks))

    return df.select(
        F.col(id_col).alias("id"),
        # asNondeterministic: deterministic kernel; stops the optimizer
        # cloning the matmul below the posexplode's inferred filter
        # (plans showed 4-8x ArrowEvalPython — r15 audit, guide §4.4)
        _keys.asNondeterministic()(
            F.col(vec_col).cast("array<double>")
        ).alias("_ks"),
    ).select("id", F.posexplode("_ks").alias("band", "key"))


def _band_rows(sig_df: DataFrame, planes: int, bands: int) -> DataFrame:
    """Explode a signature into (band, key) rows — candidate pairs are
    rows agreeing on any one band (classic banded LSH).

    Deliberately id-only: each id fans out into ``bands`` rows, so any
    payload carried here is shuffled ``bands``x and then again through
    the candidate ``distinct``. Callers re-join vectors AFTER the
    id-level dedup (16-byte keys through the shuffle, not ~1 KB
    embeddings)."""
    r = planes // bands
    mask = F.lit((1 << r) - 1)
    return sig_df.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sig"), b * r).bitwiseAND(mask).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.key")


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    planes: int = 16,
    bands: int = 8,
    dim: int = 64,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "c_id",
    c_vec: str = "c_vec",
    rank_quantize: int | None = None,
) -> DataFrame:
    """Approximate top-k: banded signature match (any of ``bands`` bands
    of ``planes/bands`` bits) generates candidates, then exact cosine
    re-ranks them. Recall rises with more/narrower bands; cost rises
    with bucket collision rate — (planes, bands) is the knob.

    The join is an equi-join on (band, key): at scale it hash-partitions
    both sides — never a cross product. The query side stays broadcast
    when small.

    ``rank_quantize=Q`` ranks by ``floor(sim*Q)`` with a ``c_id``
    tie-break and reports the quantized sim — an engine-portable
    ordering (ulp-level float divergence between engines cannot flip
    ranks), used by the catalog's DuckDB-oracled entries. Default ranks
    on the raw double.
    """
    qb = _band_key_rows(queries, q_id, q_vec, planes, bands, dim).withColumnRenamed(
        "id", "q_id"
    )
    cb = _band_key_rows(corpus, c_id, c_vec, planes, bands, dim).withColumnRenamed(
        "id", "c_id"
    )
    # ids-only dedup: the distinct shuffles (q_id, c_id) pairs, never the
    # vectors; embeddings re-join once per surviving candidate.
    cand_ids = (
        cb.join(F.broadcast(qb), ["band", "key"])
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id")
        .distinct()
    )
    qd = F.col(q_vec).cast("array<double>")
    cd = F.col(c_vec).cast("array<double>")
    qv = queries.select(
        F.col(q_id).alias("q_id"), qd.alias("q_vec"), l2_norm(qd).alias("_qn")
    )
    cv = corpus.select(
        F.col(c_id).alias("c_id"), cd.alias("c_vec"), l2_norm(cd).alias("_cn")
    )
    cand = cand_ids.join(F.broadcast(qv), "q_id").join(cv, "c_id")
    sim = cand.withColumn(
        "sim",
        _cosine_prenormed(
            F.col("q_vec"), F.col("c_vec"), F.col("_qn"), F.col("_cn")
        ),
    ).select("q_id", "c_id", "sim")
    return _rank_topk(sim, k, rank_quantize)


def _rank_topk(
    sim: DataFrame,
    k: int,
    rank_quantize: int | None,
    q_id: str = "q_id",
    c_id: str = "c_id",
) -> DataFrame:
    """Shared exact-re-rank tail for the ANN operators: top-k per query
    from a (q_id, c_id, sim) frame, raw-double or quantized ordering."""
    if rank_quantize is None:
        w = Window.partitionBy(q_id).orderBy(F.desc("sim"), F.asc(c_id))
        ranked = sim.withColumn("rank", F.row_number().over(w))
        return ranked.filter(F.col("rank") <= k).select(
            q_id, c_id, "sim", "rank"
        )
    q = F.lit(float(rank_quantize))
    sim_q = sim.select(q_id, c_id, F.floor(F.col("sim") * q).alias("sim_q"))
    w = Window.partitionBy(q_id).orderBy(F.desc("sim_q"), F.asc(c_id))
    return (
        sim_q.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, (F.col("sim_q") / q).alias("sim"), "rank")
    )


def tune_lsh(
    n: int,
    threshold: float = 0.95,
    recall: float = 0.95,
    target_bucket: int = 64,
    max_bands: int = 64,
    candidate_cost: float = 16.0,
    max_planes_per_band: int = 62,
) -> tuple[int, int]:
    """Pick (planes_per_band, bands) for hyperplane LSH by minimizing a
    cost model subject to the S-curve recall constraint.

    Fixed banding has a quadratic tail: candidates grow O(n^2 /
    2^planes_per_band), so a config tuned at 5k docs (16 buckets/band)
    melts at 50k (measured 11x time for 10x data). Per-plane agreement
    for a pair at cosine ``threshold`` is ``p = 1 - acos(threshold)/pi``;
    a pair agrees on one band of ``w`` planes with probability ``p^w``
    and is generated as a candidate with probability
    ``1 - (1 - p^w)^bands``.

    For every feasible ``w`` this takes the minimum band count meeting
    ``recall`` and scores ``cost(w) = b * (1 + candidate_cost * n /
    2^(w+1))`` — per input row, one banded row per band (the explode +
    shuffle) plus the expected same-bucket partners (each candidate
    pair pays a distinct-shuffle, two vector joins and an exact cosine,
    empirically ~an order of magnitude more than a banded row, hence
    ``candidate_cost``).  Wider bands cut candidates exponentially but
    need more bands for the same recall; the sweep lands where the two
    balance, so bucket space automatically scales with the corpus
    (larger n -> wider w) and the earlier fixed ``target_bucket=64``
    pathology — paying ~n*64/2 exact-cosine candidates per band at
    every scale — is gone (measured 3.8 s -> ~1.2 s on the sf0.1
    near-dup entry, same recall guarantee).

    When even ``max_bands`` bands cannot reach ``recall`` at any width,
    falls back to the legacy sizing (``w = log2(n / target_bucket)``,
    ``bands = max_bands``) and warns with the achieved recall —
    ``target_bucket`` only plays this fallback role now.
    """
    import math

    p = 1.0 - math.acos(min(1.0, max(-1.0, threshold))) / math.pi
    p = min(p, 1.0 - 1e-12)
    log_miss = math.log(max(1e-12, 1.0 - recall))
    best: tuple[float, int, int] | None = None  # (cost, w, b)
    for w in range(4, max_planes_per_band + 1):
        band_agree = p**w
        if band_agree <= 0.0:
            break
        b = max(1, math.ceil(log_miss / math.log(1.0 - band_agree)))
        if b > max_bands:
            # b(w) is non-decreasing in w (band_agree = p^w shrinks),
            # so once infeasible no wider band can come back.
            break
        cost = b * (1.0 + candidate_cost * max(1, n) / 2.0 ** (w + 1))
        if best is None or cost < best[0]:
            best = (cost, w, b)
    if best is not None:
        return best[1], best[2]
    # no (w <= max_planes_per_band, b <= max_bands) reaches the recall:
    # legacy bucket-space sizing, capped bands, loud about the miss
    w = max(4, math.ceil(math.log2(max(2, n) / max(1, target_bucket))))
    achieved = 1.0 - (1.0 - p**w) ** max_bands
    logger.warning(
        "tune_lsh: bands capped at %d (requested recall %.3f is "
        "unreachable at threshold %.3f, n=%d); achieved pair recall is "
        "~%.3f — raise max_bands to restore it",
        max_bands,
        recall,
        threshold,
        n,
        achieved,
    )
    return w, max_bands


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    planes: int | None = None,
    bands: int | None = None,
    dim: int = 64,
    auto_tune: bool | None = None,
    tune_threshold: float | None = None,
    recall: float = 0.95,
    n_hint: int | None = None,
) -> DataFrame:
    """Corpus self-join near-dups: banded LSH candidates -> exact cosine
    filter at ``threshold`` (id_a < id_b). Same equi-join shape as
    lsh_topk, so candidate generation is a shuffle-hash equi-join.

    Banding defaults to AUTO-TUNED from the corpus count via
    ``tune_lsh`` (one count() job — model-state exception): with FIXED
    (planes, bands) the expected candidate count is O(n^2 /
    2^(planes/bands)), so any fixed config is a quadratic time bomb at
    scale (measured 13x wall on 10x data with the old 4-bit-band
    default). At 100 TB auto-tuning is the difference between a linear
    and a quadratic candidate stage.

    - ``auto_tune=None`` (default): tune only when the caller pinned
      NEITHER ``planes`` nor ``bands`` — any explicitly passed value
      is an explicit choice (e.g. an oracle-checked test pinning
      determinism) and is honored, with the other falling back to the
      legacy default (planes=16 / bands=4).
    - ``auto_tune=True``: always tune, ignoring ``planes``/``bands``.
    - ``auto_tune=False``: fixed banding; unspecified ``planes``/
      ``bands`` fall back to the legacy 16/4 (small corpora only).

    ``tune_threshold``/``recall`` shape the auto-tuned banding's
    guarantee: candidates are generated with probability >= ``recall``
    for pairs at cosine >= ``tune_threshold`` (default: ``threshold``).
    When the duplicates you care about are much closer than the filter
    threshold (exact/near-exact copies at cos ~0.999+), tuning for
    ``tune_threshold=0.999`` needs FAR fewer bands than guaranteeing
    recall at 0.95 — band count scales with 1/|ln(1 - p^w)| and p
    rises steeply with the tune threshold — while the exact cosine
    filter still applies ``threshold``. Pairs strictly between the two
    thresholds get no recall guarantee: a documented trade, not a bug.

    ``n_hint`` supplies the (approximate) corpus count so auto-tune
    skips its ``count()`` job — pass it when the caller already knows
    the size (table stats, a cheap bare-scan count, a metadata read).
    Banding only needs the order of magnitude: a 2x-off hint moves
    ``planes_per_band`` by one bit.
    """
    if auto_tune is None:
        # any explicitly pinned dimension disables tuning — silently
        # overriding an explicit planes= (or bands=) with tuned values
        # would change the caller's recall/cost behind their back
        auto_tune = planes is None and bands is None
    if auto_tune:
        w, b = tune_lsh(
            df.count() if n_hint is None else n_hint,
            threshold if tune_threshold is None else tune_threshold,
            recall=recall,
        )
        planes, bands = w * b, b
    else:
        planes = 16 if planes is None else planes
        bands = 4 if bands is None else bands
    rows = _band_key_rows(df, id_col, vec_col, planes, bands, dim)
    a = rows.alias("a")
    b = rows.alias("b")
    # ids-only candidate dedup (see _band_rows): vectors join back in
    # exactly once per unique pair, after the distinct.
    cand_ids = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    vd = F.col(vec_col).cast("array<double>")
    va = df.select(
        F.col(id_col).alias("id_a"), vd.alias("va"), l2_norm(vd).alias("_na")
    )
    vb = df.select(
        F.col(id_col).alias("id_b"), vd.alias("vb"), l2_norm(vd).alias("_nb")
    )
    return (
        cand_ids.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "sim",
            _cosine_prenormed(
                F.col("va"), F.col("vb"), F.col("_na"), F.col("_nb")
            ),
        )
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


# =====================================================================
# IVF (inverted-file) ANN — the cluster-then-probe scale path
# =====================================================================


def ivf_centroids(
    corpus: DataFrame,
    id_col: str = "c_id",
    vec_col: str = "c_vec",
    nlist: int = 16,
    iters: int = 1,
    max_cell_share: float | None = None,
):
    """Train IVF centroids: deterministic seeding + ``iters`` Lloyd
    steps, all DataFrame ops; returns a plain ``[[float]]`` list (the
    "model" — nlist x dim floats, small enough to broadcast anywhere).

    Seeding takes the ``nlist`` lowest-id corpus vectors (deterministic,
    no RNG state). Each Lloyd step assigns every vector to its nearest
    centroid (one broadcast + narrow Arrow-batched map), then recomputes
    per-cell mean vectors with one ``groupBy(cell)`` carrying ``dim``
    position-wise ``avg`` aggregates assembled into an array — map-side
    combined, and the driver collects ``nlist`` array rows (not the
    ``nlist * dim`` exploded triples of the earlier shape, which became
    a driver bottleneck at production nlist). The only driver
    materialization is the centroid matrix itself, which is model state
    (same shape as MLlib's KMeans.clusterCenters), never data.

    ``max_cell_share`` guards against a degenerate seed set (e.g. the
    ``nlist`` lowest-id vectors all sitting in one tight cluster)
    concentrating the corpus in one Voronoi cell — which would turn the
    probe equi-join on ``cell`` into a single-reducer hot spot. When
    set, a post-train ``ivf_cell_counts`` diagnostic (nlist rows,
    map-side combined) runs; if the largest cell holds more than the
    given share of rows, training reruns once with hash-spread seeds
    (order by ``xxhash64(id)`` — deterministic but uncorrelated with
    any id-order clustering).
    """
    cents = _train_centroids(corpus, id_col, vec_col, nlist, iters, F.col(id_col))
    if max_cell_share is not None:
        counts = ivf_cell_counts(corpus, cents, id_col, vec_col)
        total = sum(counts)
        if total and max(counts) > max_cell_share * total:
            cents = _train_centroids(
                corpus, id_col, vec_col, nlist, iters,
                F.xxhash64(F.col(id_col).cast("string")),
            )
    return cents


def ivf_cell_counts(
    corpus: DataFrame,
    centroids: list,
    id_col: str = "c_id",
    vec_col: str = "c_vec",
) -> list[int]:
    """Rows per Voronoi cell for ``centroids`` — the cell-balance
    diagnostic. Cost: one narrow assignment pass + a map-side-combined
    count shuffle of at most ``nlist`` rows."""
    rows = (
        ivf_assign(corpus, centroids, id_col, vec_col)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    counts = [0] * len(centroids)
    for r in rows:
        counts[r.cell] = r.n
    return counts


def _train_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    nlist: int,
    iters: int,
    seed_order,
):
    """Seed from the first ``nlist`` vectors under ``seed_order``, then
    run ``iters`` Lloyd steps (see ``ivf_centroids`` for the shuffle
    shape)."""
    seeds = (
        corpus.select(id_col, vec_col)
        .orderBy(seed_order)
        .limit(nlist)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    cents = [list(r.v) for r in seeds]
    dim = len(cents[0])
    for _ in range(iters):
        assigned = ivf_assign(corpus, cents, id_col, vec_col)
        if dim <= _EXPR_MEANS_MAX_DIM:
            # per-cell mean vector aggregated EXECUTOR-side: one avg
            # aggregate per position, map-side combined, assembled into
            # a single array column — the driver collects nlist rows,
            # not nlist*dim (cell, pos, mean) triples.  At production
            # nlist (~10^4-5) the exploded form was a driver bottleneck.
            v = F.col(vec_col).cast("array<double>")
            means = (
                assigned.groupBy("cell")
                .agg(
                    F.array(
                        *[F.avg(F.element_at(v, p + 1)) for p in range(dim)]
                    ).alias("m")
                )
                .collect()
            )
        else:
            means = _cell_means_arrow(assigned, vec_col).collect()
        by_cell = {r.cell: list(r.m) for r in means}
        cents = [
            by_cell.get(c, cents[c])  # empty cell keeps its seed
            for c in range(len(cents))
        ]
    return cents


#: Above this dimensionality the per-position F.avg expression array is
#: replaced by the Arrow partial-aggregation path: the expression form's
#: PLAN is O(dim) per Lloyd iteration and analysis+codegen dominate —
#: measured 27.5 s vs 1.9 s for one iteration over a 256-vector corpus
#: at dim=4096 (identical centroids, local[32]). Fine at the 64-1024
#: dims the catalog uses; a compile-time cliff at 4k+.
_EXPR_MEANS_MAX_DIM = 1024


def _cell_means_arrow(assigned: DataFrame, vec_col: str) -> DataFrame:
    """Per-cell mean vectors with a dim-independent plan: numpy partial
    sums per input partition (``mapInPandas`` — narrow, no shuffle),
    then a per-cell reduce over the tiny partial frame
    (``applyInPandas`` — one shuffle of at most n_partitions*nlist
    rows, every group at most n_partitions rows, so a hot Voronoi cell
    cannot skew the reduce the way a direct per-cell applyInPandas
    over raw vectors would)."""
    import numpy as np
    import pandas as pd

    part_schema = "cell int, s array<double>, n long"

    def _partials(batches):
        acc: dict = {}
        for pdf in batches:
            if not len(pdf):  # empty Arrow batch: np.stack would throw
                continue
            cells = pdf["cell"].to_numpy()
            mat = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            for cell in np.unique(cells):
                sel = mat[cells == cell]
                got = acc.get(int(cell))
                if got is None:
                    acc[int(cell)] = [sel.sum(axis=0), len(sel)]
                else:
                    got[0] += sel.sum(axis=0)
                    got[1] += len(sel)
        if acc:
            yield pd.DataFrame(
                {
                    "cell": list(acc),
                    "s": [v[0] for v in acc.values()],
                    "n": [v[1] for v in acc.values()],
                }
            )

    def _reduce(pdf: pd.DataFrame) -> pd.DataFrame:
        total = np.stack(pdf["s"].to_numpy()).sum(axis=0)
        n = int(pdf["n"].sum())
        return pd.DataFrame({"cell": [int(pdf["cell"].iloc[0])], "m": [total / n]})

    partials = assigned.select(
        "cell", F.col(vec_col).cast("array<double>").alias("_v")
    ).mapInPandas(_partials, part_schema)
    return partials.groupBy("cell").applyInPandas(_reduce, "cell int, m array<double>")


def ivf_assign(
    df: DataFrame,
    centroids: list,
    id_col: str,
    vec_col: str,
    nprobe: int = 1,
) -> DataFrame:
    """Add a ``cell`` column (nearest centroid by cosine; ``nprobe>1``
    explodes each row into its nprobe nearest cells). One Arrow-batched
    matmul per batch against the broadcast centroid matrix — narrow, no
    shuffle.  The matrix rides as a SparkContext broadcast variable,
    not a plain closure capture: a closure is re-pickled into every
    stage that uses the UDF, a broadcast ships once per executor and is
    re-read from the local block store (the difference is noise at
    nlist=16, real at production nlist ~10^4-5)."""
    import numpy as np

    cmat = np.asarray(centroids, dtype=np.float64)
    cn = cmat / np.maximum(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-12)
    try:
        from pyspark.sql import SparkSession

        sc = SparkSession.getActiveSession().sparkContext
        # Reuse one broadcast per distinct matrix (keyed by content
        # digest) instead of creating a fresh one per call: repeated
        # assigns with the same trained centroids — and each Lloyd
        # iteration's new matrix — would otherwise pin an executor copy
        # per call for the session lifetime. Eviction UNPERSISTs (never
        # destroys): executors drop their copy, but a still-lazy plan
        # holding the handle transparently re-fetches from the driver.
        # Plain dict ops only (GIL-atomic); worst concurrent case is a
        # duplicated broadcast, same posture as the other module caches.
        import hashlib

        # applicationId+startTime, not id(sc): CPython reuses object
        # ids after GC, so an id-keyed hit could return a broadcast
        # of a destroyed context (ADVICE r6)
        key = (
            sc.applicationId,
            sc.startTime,
            hashlib.sha1(cn.tobytes()).hexdigest(),
        )
        ref = _BROADCASTS.get(key)
        if ref is None:
            while len(_BROADCASTS) >= 8:
                old_key = next(iter(_BROADCASTS))
                try:
                    _BROADCASTS.pop(old_key).unpersist(blocking=False)
                except Exception:
                    pass  # context of an older session may be gone
            ref = sc.broadcast(cn)
            _BROADCASTS[key] = ref
        # bind ONLY the broadcast handle into the UDF closure — binding
        # cn itself would re-pickle the matrix into every stage anyway
        get_cn = (lambda b: (lambda: b.value))(ref)
    except Exception:  # Spark Connect has no sparkContext: closure ships
        get_cn = (lambda m: (lambda: m))(cn)

    @F.pandas_udf("array<int>")
    def _cells(v: pd.Series) -> pd.Series:
        c = get_cn()
        mat = np.stack(v.to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ c.T  # (n, nlist)
        # top-nprobe cells, similarity-desc then cell-id for determinism
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype(np.int32)))

    # asNondeterministic: deterministic kernel; stops the optimizer
    # cloning the centroid matmul below the explode's inferred filter
    # (2-4x ArrowEvalPython — r15 plan audit, guide §4.4)
    out = df.withColumn(
        "_cells",
        _cells.asNondeterministic()(F.col(vec_col).cast("array<double>")),
    )
    if nprobe == 1:
        return out.withColumn("cell", F.element_at("_cells", 1)).drop("_cells")
    return out.withColumn("cell", F.explode("_cells")).drop("_cells")


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 1,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "c_id",
    c_vec: str = "c_vec",
    max_cell_share: float | None = None,
    rank_quantize: int | None = None,
) -> DataFrame:
    """Approximate top-k via IVF: partition the corpus into ``nlist``
    Voronoi cells, probe each query's ``nprobe`` nearest cells, exact
    cosine re-rank inside the probed cells. ``max_cell_share`` (see
    ``ivf_centroids``) re-seeds once if any cell exceeds that share of
    the corpus — the guard against a skewed probe join.
    ``rank_quantize``: engine-portable quantized ordering, see
    ``lsh_topk``.

    Scale shape: corpus assignment is a narrow map (broadcast
    centroids); search is an equi-join on ``cell`` — each query scans
    ~nprobe/nlist of the corpus instead of all of it, and the join
    hash-partitions on cell at scale (broadcast when the query side is
    small). Recall rises with nprobe; nprobe=nlist degenerates to exact
    brute force.
    """
    cents = ivf_centroids(corpus, c_id, c_vec, nlist, iters,
                          max_cell_share=max_cell_share)
    ccells = ivf_assign(corpus, cents, c_id, c_vec, nprobe=1).select("cell", c_id)
    qcells = ivf_assign(queries, cents, q_id, q_vec, nprobe=nprobe).select("cell", q_id)
    # ids-only dedup (a query probing nprobe cells can meet the same
    # corpus row once per cell): distinct on the id pair, then re-join
    # the two vector sides — embeddings never ride the dedup shuffle.
    cand_ids = (
        ccells.join(F.broadcast(qcells), "cell")
        .filter(F.col(q_id) != F.col(c_id))
        .select(q_id, c_id)
        .distinct()
    )
    qv = queries.select(q_id, q_vec)
    cv = corpus.select(c_id, c_vec)
    cand = cand_ids.join(F.broadcast(qv), q_id).join(cv, c_id)
    sim = cand.withColumn(
        "sim",
        cosine(F.col(q_vec).cast("array<double>"), F.col(c_vec).cast("array<double>")),
    ).select(q_id, c_id, "sim")
    return _rank_topk(sim, k, rank_quantize, q_id=q_id, c_id=c_id)


# =====================================================================
# Int8 scalar quantization — the 4x memory/shuffle reduction for ANN
# =====================================================================


def quantize_embeddings(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization: ``scale =
    127/max|x|``, ``q_i = floor(x_i * scale + 0.5)`` (round-half-up —
    deterministic and engine-portable, unlike banker's rounding).

    Returns (id, q_scale, qvec array<tinyint>): 4x smaller than float32
    — at 100 TB of embeddings this is the difference in scan bytes,
    shuffle volume, and page-cache hit rate for every downstream ANN
    operator. Dequantize with ``dequantize_embeddings``; cosine on the
    dequantized vectors is exact up to ~0.4% (pinned by
    sim_quantized_recall).
    """
    v = F.col(vec_col).cast("array<double>")
    scale = F.lit(127.0) / F.greatest(
        F.lit(1e-30), F.array_max(F.transform(v, lambda x: F.abs(x)))
    )
    qvec = F.transform(v, lambda x: F.floor(x * scale + 0.5).cast("tinyint"))
    return df.select(
        F.col(id_col).alias("id"),
        scale.alias("q_scale"),
        qvec.alias("qvec"),
    )


def dequantize_embeddings(
    df: DataFrame,
    id_col: str = "id",
    scale_col: str = "q_scale",
    qvec_col: str = "qvec",
    out_col: str = "vec",
) -> DataFrame:
    """Inverse of ``quantize_embeddings``: ``x_i ~= q_i / scale``."""
    s = F.col(scale_col)
    return df.select(
        F.col(id_col),
        F.transform(
            F.col(qvec_col), lambda q: q.cast("double") / s
        ).alias(out_col),
    )


def quantized_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "c_id",
    c_vec: str = "c_vec",
) -> DataFrame:
    """Exact-scan top-k over the int8-quantized corpus: quantize,
    dequantize on the fly, cosine re-rank — same plan shape as
    ``cosine_topk`` (broadcast queries, zero corpus shuffle) but the
    corpus-side bytes in flight are 1/4 of float32. Queries stay
    full-precision (they're broadcast; their size is irrelevant)."""
    qc = dequantize_embeddings(
        quantize_embeddings(corpus, c_id, c_vec), out_col="c_vec_dq"
    ).withColumnRenamed("id", c_id)
    return cosine_topk(
        queries, qc, k=k, q_id=q_id, q_vec=q_vec, c_id=c_id, c_vec="c_vec_dq"
    )


def semdedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    iters: int = 1,
    threshold: float = 0.95,
    quantize: int = 10000,
    max_cell_share: float | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication" — public paper):
    cluster the embedding corpus, compare pairs ONLY within a cluster,
    and keep one representative per semantic-duplicate group.

    Pipeline: deterministic IVF centroids (:func:`ivf_centroids` —
    lowest-id seeding + Lloyd steps, the sim_ivf machinery) ->
    per-vector cell assignment (narrow Arrow matmul) -> within-cell
    pair cosine (quantized ``floor(sim*quantize)/quantize >=
    threshold`` so engines can't disagree at the boundary) ->
    :func:`~slurm2sql_spark.operators.dedup.connected_components`
    over the pair graph -> ``keep`` = min-id member per component.
    Returns one row per input vector: ``(id, cell, component, keep)``.

    Scale contract: the paper's design point — pair generation is
    bounded by the largest CELL, never the corpus (O(sum cell^2));
    pick ``nlist ~ N / target_cell_size`` so cells stay executor-
    sized (SemDeDup uses 50k clusters for 100M+ embeddings), and pass
    ``max_cell_share`` to re-seed degenerate clusterings (the
    ivf_centroids guard). The centroid matrix is the only driver
    materialization (model state, nlist x dim floats); components
    converge in duplicate-group diameter rounds (shallow).
    """
    from slurm2sql_spark.operators.dedup import connected_components

    cents = ivf_centroids(
        corpus, id_col, vec_col, nlist, iters, max_cell_share
    )
    assigned = ivf_assign(corpus, cents, id_col, vec_col)
    a = assigned.select(
        F.col(id_col).alias("_ia"),
        F.col(vec_col).alias("_va"),
        l2_norm(F.col(vec_col)).alias("_na"),
        "cell",
    )
    b = assigned.select(
        F.col(id_col).alias("_ib"),
        F.col(vec_col).alias("_vb"),
        l2_norm(F.col(vec_col)).alias("_nb"),
        "cell",
    )
    sim = _cosine_prenormed(
        F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")
    )
    sim_q = F.floor(sim * quantize) / quantize
    edges = (
        a.join(b, "cell")
        .filter(F.col("_ia") < F.col("_ib"))
        .filter(sim_q >= F.lit(float(threshold)))
        .select(F.col("_ia").alias("id_a"), F.col("_ib").alias("id_b"))
    )
    comp = connected_components(
        edges, nodes=corpus.select(F.col(id_col).alias("id"))
    )
    return (
        comp.join(
            assigned.select(F.col(id_col).alias("id"), "cell"), "id"
        ).select(
            F.col("id").alias(id_col),
            "cell",
            "component",
            (F.col("id") == F.col("component")).alias("keep"),
        )
    )
