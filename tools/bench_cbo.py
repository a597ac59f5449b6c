"""CBO experiment (VERDICT r9 #1): does stats-driven join reordering
close the TPC-H join-shape family's gap vs DuckDB, or is the residual a
join-kernel floor?

Method — same queries, same parquet bytes, two optimizer regimes:

- **off**: the shipping path — ``_t`` reads parquet directly; the
  optimizer sees only ``sizeInBytes`` (no rowCount, no column stats);
  join order is whatever the DataFrame code declares (hand-placed in
  r9 for q8/q3).
- **on**: external tables ``CREATE TABLE cbo_<t> USING parquet
  LOCATION <same files>`` + ``ANALYZE TABLE ... COMPUTE STATISTICS FOR
  ALL COLUMNS``; reads routed through ``spark.table`` via
  ``catalog.use_catalog_table`` so every scan carries catalog stats;
  ``spark.sql.cbo.enabled`` + ``spark.sql.cbo.joinReorder.enabled`` on.

Both regimes run the IDENTICAL catalog entry code, 1 warmup pass at
sf0.01 + N timed passes (min + median, the SCALING.json policy), and
the optimized plan's join/scan shape is fingerprinted per regime so
"plans identical" vs "CBO chose a different order" is recorded as
evidence, not inferred from walls.

ANALYZE cost is reported but not charged to query walls: on a real
cluster stats are computed once per table load (the engine already
ships ``analyze_table`` — sinks/parquet_sink.py:371), amortized over
every query.

Usage:
  python tools/bench_cbo.py [--x100] [--only q3_top_revenue,...]
                            [--passes 3] [--out CBO_r10.json]

x10/x100 corpora are the bench_scaling ones (built if missing).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from statistics import median as _median

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# the join-shape family flagged weak at 100x (VERDICT r9 "What's
# wrong" #1), plus q21 as the control that already inverted
JOIN_QUERIES = [
    "q3_top_revenue",
    "q5_nation_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q12_late_priority",
    "q16_supplier_cnt",
    "q18_large_orders",
    "q21_waiting_supplier",
]

CBO_CONFS = {
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    # histogram-based estimation needs histograms at ANALYZE time; we
    # collect min/max/ndv only (the join-reorder cost model's inputs)
}


def _set_confs(spark, on: bool) -> None:
    for k, v in CBO_CONFS.items():
        spark.conf.set(k, v if on else "false")


def _plan_fingerprint(df, sf_dir: str) -> str:
    """Join-tree shape of the optimized plan: the preorder sequence of
    join types + build relations, with scans canonicalized to table
    basenames so the parquet-path vs catalog-table difference doesn't
    show up as a false plan change."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    out = []
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: ")
        if s.startswith("Join "):
            out.append(re.sub(r"\(.*", "", s).strip())
        elif s.startswith("Relation") or s.startswith("HiveTableRelation"):
            m = re.search(r"(\w+)\.parquet", s) or re.search(r"cbo_(\w+)", s)
            if m:
                out.append(f"scan:{m.group(1)}")
            else:
                # parquet Relation lines print only the column list —
                # identify the table by its column-name prefix
                m = re.search(r"\[(\w+?)_", s)
                pref = {
                    "l": "lineitem", "o": "orders", "c": "customer",
                    "s": "supplier", "p": "part", "n": "nation",
                    "r": "region", "doc": "documents", "vec": "embeddings",
                    "event": "events", "user": "events",
                }.get(m.group(1) if m else "", "?")
                out.append(f"scan:{pref}")
    return " | ".join(out)


def main() -> None:
    passes = 3
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])
    out_path = "CBO_r10.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    names = list(JOIN_QUERIES)
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
        names = [n for n in names if n in only]

    import bench_scaling as BS

    from slurm2sql_spark import catalog
    from slurm2sql_spark.catalog import QUERIES
    from slurm2sql_spark.session import get_spark

    spark = get_spark(app_name="bench_cbo")
    spark.sparkContext.setLogLevel("ERROR")

    if "--x100" in sys.argv:
        BS.build_x100_dir(spark)
        sf_dir, scale = BS.DST100, "100x"
    else:
        BS.build_scaled_dir(spark)
        sf_dir, scale = BS.DST, "10x"

    # external stats-bearing tables over the SAME parquet files
    analyze_s: dict[str, dict] = {}
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(path):
            continue
        spark.sql(f"DROP TABLE IF EXISTS cbo_{t}")
        spark.sql(f"CREATE TABLE cbo_{t} USING parquet LOCATION '{path}'")
        # ANALYZE FOR COLUMNS supports atomic types only — skip
        # array/map/struct columns (embeddings.embedding); the join
        # reorder cost model only consumes key-column ndv/min/max.
        atomic = [
            f"`{f.name}`"
            for f in spark.table(f"cbo_{t}").schema.fields
            if f.dataType.typeName()
            # timestamp_ntz column stats trip a MatchError inside
            # Spark 4.1's CBO estimation (FilterEstimation has no NTZ
            # branch) — leave those columns statless
            not in ("array", "map", "struct", "binary", "timestamp_ntz")
        ]
        t0 = time.perf_counter()
        # Record per table whether COLUMN stats actually landed: a
        # silent downgrade to table-level stats would make a regime's
        # plan_changed=false read as "CBO had full evidence and chose
        # the same plan" when it never saw column NDVs (ADVICE r10).
        column_stats = bool(atomic)
        if atomic:
            try:
                spark.sql(
                    f"ANALYZE TABLE cbo_{t} COMPUTE STATISTICS "
                    f"FOR COLUMNS {', '.join(atomic)}"
                )
            except Exception as exc:  # noqa: BLE001 - fall back to table-level
                print(f"analyze {t}: column stats failed ({exc}); table-level only")
                column_stats = False
                spark.sql(f"ANALYZE TABLE cbo_{t} COMPUTE STATISTICS")
        else:
            spark.sql(f"ANALYZE TABLE cbo_{t} COMPUTE STATISTICS")
        analyze_s[t] = {
            "s": round(time.perf_counter() - t0, 2),
            "column_stats": column_stats,
        }

    def run(names, on: bool):
        _set_confs(spark, on)
        if on:
            for t in TABLES:
                if os.path.exists(f"{sf_dir}/{t}.parquet"):
                    catalog.use_catalog_table(sf_dir, t, f"cbo_{t}")
        samples: dict[str, list[float]] = {}
        fps: dict[str, str] = {}
        try:
            # warmup at sf0.01 (parquet path — JIT only, plans don't carry)
            BS.time_spark(QUERIES, spark, names, "/root/testdata/sf0.01", passes=1)
            for _ in range(passes):
                catalog.drop_caches()
                for n in names:
                    t0 = time.perf_counter()
                    QUERIES[n].spark(spark, sf_dir).write.mode(
                        "overwrite"
                    ).format("noop").save()
                    samples.setdefault(n, []).append(time.perf_counter() - t0)
            catalog.drop_caches()
            for n in names:
                fps[n] = _plan_fingerprint(QUERIES[n].spark(spark, sf_dir), sf_dir)
        finally:
            if on:
                for t in TABLES:
                    catalog.use_catalog_table(sf_dir, t, None)
            _set_confs(spark, False)
        mins = {k: round(min(v), 3) for k, v in samples.items()}
        meds = {k: round(_median(v), 3) for k, v in samples.items()}
        return mins, meds, fps

    off_min, off_med, off_fp = run(names, on=False)
    on_min, on_med, on_fp = run(names, on=True)

    rows = {}
    for n in names:
        rows[n] = {
            "off_min": off_min[n],
            "off_med": off_med[n],
            "on_min": on_min[n],
            "on_med": on_med[n],
            "speedup_min": round(off_min[n] / on_min[n], 2),
            "plan_changed": off_fp[n] != on_fp[n],
            "fp_off": off_fp[n],
            "fp_on": on_fp[n],
            # an unidentified scan ("scan:?") means the fingerprint
            # could miss a real plan change — mark the row degraded
            # rather than letting plan_changed=false overclaim
            "fp_degraded": "scan:?" in off_fp[n] or "scan:?" in on_fp[n],
        }
    payload = {
        "scale": scale,
        "sf_dir": sf_dir,
        "passes": passes,
        "confs": CBO_CONFS,
        "analyze_s": analyze_s,
        "queries": rows,
    }
    prev = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            prev = json.load(fh)
    prev[scale] = payload
    with open(out_path, "w") as fh:
        json.dump(prev, fh, indent=1)
    for n, r in rows.items():
        print(
            f"{n}: off {r['off_min']:.2f}s on {r['on_min']:.2f}s "
            f"x{r['speedup_min']} plan_changed={r['plan_changed']}"
        )


if __name__ == "__main__":
    main()
