"""Library API (reference U4: ``import slurm2sql; slurm2sql.slurm2sql(...)``
then pandas/DuckDB on the result, README.rst:118-169).

The Spark-native equivalent returns DataFrames directly — no
intermediate database file unless you ask for one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from slurm2sql_spark.operators.transform import slurm_transform
from slurm2sql_spark.operators.views import eff, user_rollup
from slurm2sql_spark.sinks.parquet_sink import read_table, upsert, write_overwrite
from slurm2sql_spark.sources.csv_source import read_csv, read_sacct_lines

__all__ = ["ingest", "ingest_csv", "open_table", "eff", "user_rollup"]


def ingest_csv(
    spark: SparkSession,
    csv_path: str,
    table_path: str | None = None,
    jobs_only: bool = False,
    now: int | None = None,
    update: bool = False,
    table_format: str = "parquet",
) -> DataFrame:
    """CSV -> typed slurm DataFrame; optionally persist (reference
    slurm2sql(db, csv_input=...), slurm2sql.py:917-935 + 995-1004).

    ``update=True`` upserts on JobID (reference --update INSERT OR
    REPLACE); otherwise overwrite (reference delete-and-recreate).
    ``table_format="delta"`` persists through the Delta commit protocol
    (real MERGE for the upsert; needs the optional delta-spark package).
    """
    typed = slurm_transform(read_csv(spark, csv_path), now=now, jobs_only=jobs_only)
    if table_path:
        if update:
            upsert(spark, typed, table_path, format=table_format)
        else:
            write_overwrite(typed, table_path, format=table_format)
        return read_table(spark, table_path, format=table_format)
    return typed


def ingest(
    spark: SparkSession,
    raw_lines: str | None = None,
    csv_path: str | None = None,
    dump_path: str | None = None,
    sacct_options: dict | None = None,
    errors: list | None = None,
    stitch: bool = False,
    **kwargs,
) -> DataFrame:
    """Multi-source front door: raw sacct text, a CSV file, a dump file,
    or a live sacct scan (reference's input paths, slurm2sql.py:995-1006).

    ``raw_lines`` is the PIPE path: driver-side continuation stitching,
    sized for a single sacct stream — don't hand it a multi-GB dump.
    ``dump_path`` is the FILE path: a distributed line scan over the
    pipe-delimited dump (scales to any size). By default it cannot
    REPAIR records whose JobName embeds a newline, but it DETECTS
    them; with ``stitch=True`` the distributed stitched scan repairs
    them at any scale (``sacct_dump_scan_stitched`` — safe lines parse
    in place, only suspect runs go through a sequential repair task),
    and ``errors`` then receives only genuinely unrecoverable lines.
    With ``errors`` passed, malformed lines are collected into it so
    the caller can report them and exit nonzero — the same error
    contract as the reference (slurm2sql.py:785-788). The collection
    is an eager extra scan and is CAPPED at 1000 sample lines (a
    wrong-delimiter dump makes EVERY line malformed — an unbounded
    collect would OOM the driver); callers needing the exact count at
    any size should use the scan functions directly and ``count()``
    the bad frame, as the CLI does."""
    if raw_lines is not None:
        typed = slurm_transform(
            read_sacct_lines(spark, raw_lines, errors=errors),
            now=kwargs.get("now"),
        )
        return typed
    if dump_path is not None:
        from slurm2sql_spark.sources.csv_source import (
            sacct_dump_scan,
            sacct_dump_scan_stitched,
        )

        scan = sacct_dump_scan_stitched if stitch else sacct_dump_scan
        ok, bad = scan(spark, dump_path)
        if errors is not None:
            errors.extend(r.line for r in bad.limit(1000).collect())
        return slurm_transform(ok, now=kwargs.get("now"))
    if csv_path is not None:
        return ingest_csv(spark, csv_path, **kwargs)
    from slurm2sql_spark.sources.sacct_source import SacctDataSource

    spark.dataSource.register(SacctDataSource)
    reader = spark.read.format("sacct")
    for k, v in (sacct_options or {}).items():
        reader = reader.option(k, v)
    return slurm_transform(reader.load(), now=kwargs.get("now"))


def open_table(
    spark: SparkSession, table_path: str, format: str = "parquet"
) -> DataFrame:
    """Open a previously built table (reference S5 import_or_open_db,
    slurm2sql.py:1080-1101)."""
    return read_table(spark, table_path, format=format)
