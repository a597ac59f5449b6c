"""Dump ``.explain("formatted")`` for named catalog entries to files.

Usage: python tools/explain_query.py <out_dir> <suffix> q1[,q2,...] [sf_dir]

Writes ``<out_dir>/<query>_<suffix>.txt`` for each query. Plans are
captured at sf0.1 by default (the bench scale) — plan SHAPE is what
matters; AQE may still re-plan at runtime.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3].split(",")
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"

    from slurm2sql_spark import catalog
    from slurm2sql_spark.catalog import QUERIES
    from slurm2sql_spark.session import get_spark

    unknown = set(names) - set(QUERIES)
    if unknown:
        raise SystemExit(f"unknown queries: {sorted(unknown)}")
    spark = get_spark(app_name="explain_query")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    for n in names:
        catalog.drop_caches()
        df = QUERIES[n].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{n}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
