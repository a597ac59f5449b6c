"""Local stand-in for the driver's correctness gate: run every catalog
query on Spark AND its DuckDB oracle at a given sf, compare row count,
column names, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys

sys.path.insert(0, ".")


def normalize(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, int):
        return str(v)
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(normalize(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    from slurm2sql_spark.catalog import QUERIES
    from slurm2sql_spark.session import get_spark

    spark = get_spark(
        app_name="check_oracle",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = spec.spark(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows-only, {len(srows)} rows")
            continue
        try:
            orel = con.execute(spec.oracle)
            ocols = [d[0] for d in orel.description]
            orows = orel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        else:
            sh = table_hash([tuple(r) for r in srows], scols)
            oh = table_hash(orows, ocols)
            if sh != oh:
                problems.append(f"hash {sh} vs {oh}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures.append(name)
            # print a small diff sample
            skey = {
                tuple(normalize(v) for v in r): r for r in (tuple(x) for x in srows)
            }
            okey = {tuple(normalize(v) for v in r): r for r in orows}
            only_s = [r for k, r in skey.items() if k not in okey][:3]
            only_o = [r for k, r in okey.items() if k not in skey][:3]
            if only_s:
                print(f"  spark-only: {only_s}")
            if only_o:
                print(f"  oracle-only: {only_o}")
        else:
            print(f"ok   {name}: {len(srows)} rows match")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
