"""CLI frontends: ``sacct`` and ``seff`` style reports plus ``ingest``
(reference sacct_cli slurm2sql.py:1160-1219, seff_cli 1222-1371,
main 699-788).

The reference assembles raw SQL strings and hands them to SQLite; here
the same user-supplied select/order fragments go to Spark SQL over temp
views — identical trust model (explicitly NOT injection-safe, reference
slurm2sql.py:1172-1177), with Catalyst as the parser/planner.

Presentation is the reference's compact tabulate format (K6,
slurm2sql.py:1135-1151) hand-rolled: space-separated columns, dashed
underline, right-aligned numbers, NULL -> empty. Rendering collects to
the driver — presentation of a human-readable page, not an engine op;
cap with --limit for big tables.

Run: ``python -m slurm2sql_spark.cli {ingest,sacct,seff} ...``
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import DataFrame, SparkSession

# Default field list (reference SACCT_DEFAULT_FIELDS, slurm2sql.py:1152)
# in Spark SQL dialect: datetime(x,'unixepoch') -> from_unixtime(x).
SACCT_DEFAULT_FIELDS = (
    "JobID,User,State,'┃' AS t,"
    "from_unixtime(Start) AS Start,from_unixtime(End) AS End,'┃' AS b,"
    "Partition,ExitCodeRaw,NodeList,'┃' AS c,"
    "NCPUS,CPUTime,CPUEff,'┃' AS m,AllocMem,TotalMem,MemEff,'┃' AS g,"
    "ReqGPUS,GpuEff,'┃' AS d,TotDiskRead,TotDiskWrite,'┃' AS r,"
    "ReqTRES,AllocTRES,TRESUsageInTot,TRESUsageOutTot"
)

SEFF_PER_JOB_SQL = """
    SELECT * FROM ( SELECT
        JobID, User,
        round(Elapsed/3600, 2) AS hours,
        substr(State, 1, 2) AS ST,
        {long_output}
        '┃' AS c,
        NCPUS,
        printf('%3.0f%%', round(CPUeff, 2)*100) AS CPUeff,
        '┃' AS m,
        round(AllocMem/1073741824, 2) AS MemAllocGiB,
        round(TotalMem/1073741824, 2) AS MemTotGiB,
        printf('%3.0f%%', round(MemEff, 2)*100) AS MemEff,
        '┃' AS g,
        NGpus,
        if(NGpus > 0, printf('%3.0f%%', round(GpuEff, 2)*100), NULL) AS GPUeff,
        if(NGpus > 0, printf('%4.1f', GpuMem/1073741824), NULL) AS GPUmemGiB,
        '┃' AS d,
        round(TotDiskRead/Elapsed/1048576, 2) AS read_MiBps,
        round(TotDiskWrite/Elapsed/1048576, 2) AS write_MiBps
    FROM eff
    WHERE Start IS NOT NULL AND End IS NOT NULL {where} ) {order_by}
"""

SEFF_USER_SQL = """
    SELECT * FROM ( SELECT
        User,
        round(sum(Elapsed)/86400, 1) AS days,
        '┃' AS c,
        round(sum(Elapsed*NCPUS)/86400, 1) AS cpu_day,
        printf('%2.0f%%', 100*sum(Elapsed*NCPUS*CPUeff)/sum(Elapsed*NCPUS)) AS CPUEff,
        '┃' AS m,
        round(sum(Elapsed*AllocMem)/1073741824/86400, 1) AS mem_GiB_day,
        printf('%2.0f%%', 100*sum(Elapsed*AllocMem*MemEff)/sum(Elapsed*AllocMem)) AS MemEff,
        '┃' AS g,
        round(sum(Elapsed*NGpus)/86400, 1) AS gpu_day,
        if(sum(NGpus) > 0,
           printf('%2.0f%%', 100*sum(Elapsed*NGpus*GpuEff)/sum(Elapsed*NGpus)),
           NULL) AS GPUEff,
        '┃' AS d,
        round(sum(TotDiskRead/1048576)/sum(Elapsed), 2) AS read_MiBps,
        round(sum(TotDiskWrite/1048576)/sum(Elapsed), 2) AS write_MiBps
    FROM eff
    WHERE End IS NOT NULL {where}
    GROUP BY User ) {order_by}
"""


def format_table(df: DataFrame, limit: int = 10000) -> str:
    """Compact table render (reference compact_table + tabulate,
    slurm2sql.py:1135-1151): header, dashed rule, right-aligned numbers,
    NULL as empty string."""
    rows = df.limit(limit).collect()
    headers = df.columns
    numeric = [
        any(isinstance(r[i], (int, float)) for r in rows)
        for i in range(len(headers))
    ]

    def cell(v):
        if v is None:
            return ""
        if isinstance(v, float):
            return f"{v:g}"
        return str(v)

    table = [[cell(v) for v in r] for r in rows]
    widths = [
        max(len(headers[i]), *(len(t[i]) for t in table)) if table else len(headers[i])
        for i in range(len(headers))
    ]
    out = []
    out.append(" ".join(h.ljust(w) for h, w in zip(headers, widths)))
    out.append(" ".join("-" * w for w in widths))
    for t in table:
        out.append(
            " ".join(
                c.rjust(w) if num else c.ljust(w)
                for c, w, num in zip(t, widths, numeric)
            )
        )
    return "\n".join(out)


def _where(args) -> str:
    """--user / --partition selectors (reference args_to_sql_where,
    slurm2sql.py:1071-1077). Values are SQL-quoted minimally; the
    reference passes them as bound params but also concatenates raw
    --output/--order (same trust model)."""
    where = ""
    if getattr(args, "user", None):
        u = args.user.replace("'", "''")
        where += f" AND User = '{u}'"
    if getattr(args, "partition", None):
        p = args.partition.replace("'", "''")
        where += f" AND Partition LIKE '%{p}%'"
    return where


def _load(spark: SparkSession, args) -> DataFrame:
    from slurm2sql_spark import api

    if getattr(args, "db", None):
        return api.open_table(spark, args.db)
    if getattr(args, "csv_input", None):
        return api.ingest_csv(spark, args.csv_input)
    raise SystemExit("give --db TABLE or --csv-input FILE")


def _common(p: argparse.ArgumentParser):
    p.add_argument("--db", help="read this parquet table (no re-import)")
    p.add_argument("--csv-input", help="ingest this sacct-shaped CSV in-memory")
    p.add_argument("--user", "-u")
    p.add_argument("--partition", "-r")
    p.add_argument("--order", help="SQL ORDER BY expression (raw SQL)")
    p.add_argument("--limit", type=int, default=10000)


def sacct_cli(spark: SparkSession, argv) -> str:
    """sacct-like report (reference sacct_cli, slurm2sql.py:1160-1219)."""
    p = argparse.ArgumentParser(prog="slurm2sql-spark sacct")
    _common(p)
    p.add_argument("--output", "-o", default=SACCT_DEFAULT_FIELDS,
                   help="select list (raw SQL, '*' for all)")
    args = p.parse_args(argv)
    _load(spark, args).createOrReplaceTempView("slurm")
    order = f" ORDER BY {args.order}" if args.order else ""
    q = f"SELECT {args.output} FROM slurm WHERE true{_where(args)}{order}"
    return format_table(spark.sql(q), args.limit)


def seff_cli(spark: SparkSession, argv) -> str:
    """seff-like efficiency report (reference seff_cli,
    slurm2sql.py:1222-1371)."""
    from slurm2sql_spark.operators.views import eff

    p = argparse.ArgumentParser(prog="slurm2sql-spark seff")
    _common(p)
    p.add_argument("--aggregate-user", action="store_true")
    p.add_argument("--long", "-l", action="store_true")
    args = p.parse_args(argv)
    eff(_load(spark, args)).createOrReplaceTempView("eff")
    order_by = f"ORDER BY {args.order}" if args.order else ""
    if args.aggregate_user:
        q = SEFF_USER_SQL.format(where=_where(args), order_by=order_by)
    else:
        long_output = (
            "date_format(from_unixtime(Start), 'MM-dd_HH:mm') AS Start, "
            "date_format(from_unixtime(End), 'MM-dd_HH:mm') AS End,"
            if args.long
            else ""
        )
        q = SEFF_PER_JOB_SQL.format(
            long_output=long_output, where=_where(args), order_by=order_by
        )
    df = spark.sql(q)
    if df.isEmpty():
        print("No data fetched with these sacct options.")
        raise SystemExit(2)
    return format_table(df, args.limit)


def ingest_cli(spark: SparkSession, argv) -> str:
    """ETL front door (reference main(), slurm2sql.py:699-788)."""
    p = argparse.ArgumentParser(prog="slurm2sql-spark ingest")
    p.add_argument("table", help="output parquet table path")
    p.add_argument("--csv-input", required=True)
    p.add_argument("--update", action="store_true",
                   help="upsert on JobID instead of overwrite")
    p.add_argument("--jobs-only", action="store_true")
    args = p.parse_args(argv)
    from slurm2sql_spark import api

    out = api.ingest_csv(
        spark, args.csv_input, table_path=args.table,
        jobs_only=args.jobs_only, update=args.update,
    )
    return f"wrote {out.count()} rows to {args.table}"


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] not in {"ingest", "sacct", "seff"}:
        print("usage: python -m slurm2sql_spark.cli {ingest,sacct,seff} ...")
        raise SystemExit(1)
    from slurm2sql_spark.session import get_spark

    spark = get_spark(app_name=f"slurm2sql_spark_{argv[0]}")
    cmd = {"ingest": ingest_cli, "sacct": sacct_cli, "seff": seff_cli}[argv[0]]
    print(cmd(spark, argv[1:]))


if __name__ == "__main__":
    main()
