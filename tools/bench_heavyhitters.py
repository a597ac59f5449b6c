"""High-cardinality A/B for the exact heavy-hitter protocol
(VERDICT r14 #2: heavy_hitters_protocol is hash-proven correct at the
gate's 9k-bigram vocabulary, where the exact single-pass aggregate
trivially wins — measure it in the regime it EXISTS for: an open
vocabulary that outgrows per-task combiners).

Item stream: word 3-shingles of the scaled documents corpus (each
occurrence, not per-doc distinct — the ngram_heavy_hitters grain one
order up). On the x10 corpus this is ~10^8 shingle occurrences over
tens of millions of distinct items; the exact plan's combiner hash
table per task is ~distinct/task entries, while the protocol's is m+1
rows regardless.

Arms, min/median of ``PASSES`` timed runs each:

  exact    groupBy(item).count + global top-k (the plan shape every
           exact entry uses — the thing that stops fitting)
  protocol heavy_hitters_exact_topk at each m in M_SWEEP; a starved m
           RAISES (candidate budget / absent-item verification) and is
           recorded as such — the m-sizing math d_p <= rows_p/(m+1) is
           reported with the measured D so the crossover claim in
           operators/heavyhitters.py is backed by real numbers.

Equality of the two arms' top-k is asserted on every pass that
returns. Results merge into SCALING.json under
queries.heavy_hitters_protocol.high_cardinality and print as one JSON
line for the BASELINE.md section.

Usage: python tools/bench_heavyhitters.py [x10|x100] [shingle|url]
       [k] [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time
from statistics import median

sys.path.insert(0, ".")

DIRS = {
    "x10": "/tmp/spark_graft_x10",
    "x100": "/tmp/spark_graft_x100",
}
M_SWEEP = (16_384, 65_536, 262_144)


def _items(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.split(
            F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))),
            r"[ \t\n\r\f]+",
        ).alias("w")
    )
    # every 3-shingle occurrence: w[i], w[i+1], w[i+2]
    return docs.select(
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(w) - 2, 0)), "
                "i -> concat_ws(' ', w[i-1], w[i], w[i+1]))"
            )
        ).alias("item")
    )


def _url_items(spark, sf_dir):
    """Open-vocabulary URL stream derived from the documents corpus —
    the regime the protocol exists for (VERDICT r14 #2 names URL
    grain). One URL per word occurrence: words hash-route to a hub
    head (~45% of the stream over |vocab x source| hot URLs — the
    true top-k), a mid class (~15%, URL per word x doc_id%1000), and
    a unique deep-link tail (~40%, one URL per (doc, position) — tens
    of millions of singletons at x100, the thing that floods exact
    combiners). Deterministic; no RNG."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        "source",
        F.split(
            F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))),
            r"[ \t\n\r\f]+",
        ).alias("w"),
    )
    pos = docs.select(
        "doc_id", "source", F.posexplode("w").alias("i", "word")
    )
    b = F.pmod(F.xxhash64("word"), F.lit(20))
    base = F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/"))
    hub = F.concat(base, F.col("word"))
    mid = F.concat(
        base, F.col("word"), F.lit("/p"),
        (F.col("doc_id") % 1000).cast("string"),
    )
    tail = F.concat(
        base, F.lit("d/"), F.col("doc_id").cast("string"),
        F.lit("/"), F.col("i").cast("string"),
    )
    return pos.select(
        F.when(b < 9, hub).when(b < 12, mid).otherwise(tail).alias("item")
    )


def main() -> None:
    from pyspark.sql import functions as F

    from slurm2sql_spark.operators.heavyhitters import (
        heavy_hitters_exact_topk,
    )
    from slurm2sql_spark.session import get_spark

    scale = sys.argv[1] if len(sys.argv) > 1 else "x10"
    grain = sys.argv[2] if len(sys.argv) > 2 else "shingle"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    passes = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    sf_dir = DIRS[scale]
    if not os.path.exists(os.path.join(sf_dir, "_BUILT")):
        raise SystemExit(
            f"{sf_dir} not built — run tools/bench_scaling.py first"
        )

    spark = get_spark(app_name="bench_heavyhitters")
    spark.sparkContext.setLogLevel("ERROR")

    items = (
        _url_items(spark, sf_dir) if grain == "url"
        else _items(spark, sf_dir)
    )

    # corpus shape: total rows, distinct items, per-task distinct
    # (the exact arm's peak combiner hash-table size) — one pass
    shape = items.select(
        F.spark_partition_id().alias("p"), "item"
    ).groupBy("p").agg(
        F.count(F.lit(1)).alias("rows"),
        F.approx_count_distinct("item", 0.02).alias("distinct"),
    ).agg(
        F.count(F.lit(1)).alias("tasks"),
        F.sum("rows").alias("total_rows"),
        F.max("rows").alias("max_rows_per_task"),
        F.max("distinct").alias("max_distinct_per_task"),
    ).collect()[0]
    n_distinct = items.select(
        F.approx_count_distinct("item", 0.02).alias("d")
    ).collect()[0]["d"]
    report = {
        "scale": scale,
        "k": k,
        "grain": (
            "URL per word occurrence (hub/mid/unique-tail)"
            if grain == "url" else "word 3-shingle occurrences"
        ),
        "total_rows": int(shape["total_rows"]),
        "distinct_items_approx": int(n_distinct),
        "tasks": int(shape["tasks"]),
        "max_rows_per_task": int(shape["max_rows_per_task"]),
        "exact_combiner_peak_entries": int(
            shape["max_distinct_per_task"]
        ),
    }

    def timed(fn):
        walls, out = [], None
        for _ in range(passes):
            t0 = time.perf_counter()
            out = fn()
            walls.append(round(time.perf_counter() - t0, 3))
        return round(min(walls), 3), round(median(walls), 3), out

    def run_exact():
        return [
            (r["item"], r["n"])
            for r in items.groupBy("item")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.md5("item").asc())
            .limit(k)
            .collect()
        ]

    e_min, e_med, want = timed(run_exact)
    report["exact"] = {"min": e_min, "med": e_med}
    report["topk_head"] = want[:3]

    report["protocol"] = {}
    for m in M_SWEEP:
        stats: dict = {}

        def run_proto(m=m, stats=stats):
            return [
                (r["item"], r["n"])
                for r in heavy_hitters_exact_topk(
                    items, "item", k=k, m=m, stats=stats
                ).collect()
            ]

        row: dict = {
            "m": m,
            # d_p <= rows_p/(m+1); D <= tasks * that bound
            "d_bound_per_task": int(
                shape["max_rows_per_task"] // (m + 1)
            ),
        }
        try:
            p_min, p_med, got = timed(run_proto)
        except ValueError as exc:
            row["raised"] = str(exc)[:160]
            row.update({f"stat_{s}": v for s, v in stats.items()})
        else:
            assert got == want, f"protocol m={m} != exact top-{k}"
            row.update(
                min=p_min,
                med=p_med,
                vs_exact=round(p_min / e_min, 2),
                **{f"stat_{s}": v for s, v in stats.items()},
            )
        report["protocol"][str(m)] = row
        print(json.dumps(row), file=sys.stderr)

    out = {"queries": {}}
    if os.path.exists("SCALING.json"):
        with open("SCALING.json") as fh:
            out = json.load(fh)
    hc = out.setdefault("queries", {}).setdefault(
        "heavy_hitters_protocol", {}
    )
    hc["high_cardinality" if grain != "url" else "high_cardinality_url"] = (
        report
    )
    with open("SCALING.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
