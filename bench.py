"""Benchmark harness: run every catalog query end-to-end at
$SPARK_GRAFT_SF_DIR (default sf0.1) and emit ONE JSON line.

Execution is forced through the `noop` sink so the full plan runs
distributed without driver-side collect overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    from slurm2sql_spark.catalog import QUERIES
    from slurm2sql_spark.session import get_spark

    spark = get_spark(app_name="slurm2sql_spark_bench")
    # Warm the JVM/reader paths outside the timed region.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    times: dict[str, float] = {}
    for name, spec in QUERIES.items():
        t0 = time.perf_counter()
        spec.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "catalog_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
