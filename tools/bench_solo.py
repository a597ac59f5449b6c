"""Solo re-measurement of individual catalog entries at sf0.1
(VERDICT r7 #6: confirm whether the three r7 full-sweep regressions —
dedup_incremental +20%, multimodal_pipeline +18%, mix_fractions +16%,
all median-of-3 — are sweep-interleaving noise or real).

Solo regime: one JVM, JIT warmup at sf0.01, then N timed passes of just
the named queries with caches dropped per pass. NOTE the regime caveat
from SCALING.json: solo and full-sweep numbers differ 1.5-2x per query
(page-cache/JIT interleaving) — compare solo-to-solo or the per-query
min across BENCH_r{N}.json sweeps, never solo-to-sweep.

Usage: python tools/bench_solo.py q1,q2[,q3...] [passes]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.01"


def main() -> None:
    from slurm2sql_spark import catalog
    from slurm2sql_spark.catalog import QUERIES
    from slurm2sql_spark.session import get_spark

    names = sys.argv[1].split(",")
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    unknown = set(names) - set(QUERIES)
    if unknown:
        raise SystemExit(f"unknown queries: {sorted(unknown)}")

    spark = get_spark(app_name="bench_solo")
    spark.sparkContext.setLogLevel("ERROR")

    for n in names:  # JIT warmup, untimed
        QUERIES[n].spark(spark, WARM).write.mode("overwrite").format(
            "noop"
        ).save()
    catalog.drop_caches()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(passes):
        catalog.drop_caches()
        for n in names:
            t0 = time.perf_counter()
            QUERIES[n].spark(spark, SF).write.mode("overwrite").format(
                "noop"
            ).save()
            samples[n].append(round(time.perf_counter() - t0, 3))
    catalog.drop_caches()

    out = {
        n: {
            "min": min(t),
            "median": sorted(t)[len(t) // 2],
            "samples": t,
        }
        for n, t in samples.items()
    }
    print(json.dumps({"sf": SF, "regime": "solo", "queries": out}))


if __name__ == "__main__":
    main()
