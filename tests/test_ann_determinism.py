"""Determinism goldens for the two rows-only ANN catalog entries.

``sim_lsh_topk`` and ``sim_ivf_topk`` have no DuckDB oracle (plane-hash
and centroid geometry aren't SQL-expressible), so the driver records
rows-only. These tests close the remaining gap: the answer set must be
a pure function of the data — identical across independent plan builds
AND across physical layouts (partitioning). A nondeterministic
tie-break, RNG-seeded plane matrix, or partition-order-dependent
centroid would show up here as a hash mismatch.

Hashing is over the sorted (q_id, c_id, rank) triples — the candidate
identity — not the float sims, so the check is flake-proof against
reduction-order float noise while still pinning the rows the driver
records.
"""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _ids_hash(df) -> str:
    rows = sorted((r.q_id, r.c_id, r.rank) for r in df.collect())
    h = hashlib.md5()
    for t in rows:
        h.update(repr(t).encode())
    return h.hexdigest()


def _lsh_build(spark, emb):
    from slurm2sql_spark.operators.similarity import lsh_topk

    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cs = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    return lsh_topk(qs, cs, k=5, planes=16, dim=64)


def _ivf_build(spark, emb):
    from slurm2sql_spark.operators.similarity import ivf_topk

    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cs = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    return ivf_topk(qs, cs, k=5, nlist=16, nprobe=6, iters=1)


@needs_testdata
@pytest.mark.slow
def test_simhash_fast_pairs_deterministic(spark):
    """The third rows-only entry: xxhash64-based simhash pairs must be
    a pure function of the data — identical across independent builds
    and input partitionings (xxhash64 is seedless-deterministic; this
    pins that no partition-order dependence sneaks into the banding or
    the distinct)."""
    from slurm2sql_spark.operators.dedup import simhash_near_dup_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def run(df):
        rows = simhash_near_dup_pairs(df, "doc_id", "text").collect()
        return sorted((r.id_a, r.id_b, r.hamming) for r in rows)

    base = run(docs)
    assert run(docs) == base
    assert run(docs.repartition(5, "doc_id")) == base
    assert len(base) > 0


@needs_testdata
@pytest.mark.parametrize("build", [_lsh_build, _ivf_build], ids=["lsh", "ivf"])
def test_ann_topk_candidate_set_deterministic(spark, build):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = _ids_hash(build(spark, emb))
    # independent plan build — fresh lineage, same answer
    again = _ids_hash(build(spark, emb))
    assert again == base, "answer set changed between identical builds"
    # different physical layout: repartitioned corpus must not change
    # the candidate identity (partition-order independence)
    shuffled = emb.repartition(7, "vec_id")
    assert _ids_hash(build(spark, shuffled)) == base, (
        "answer set depends on input partitioning"
    )
