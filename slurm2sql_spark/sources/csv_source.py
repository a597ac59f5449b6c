"""CSV and raw sacct-line sources.

- ``read_csv``: sacct-shaped CSV (reference csv_input path,
  slurm2sql.py:995-1004): header row, everything string-typed, values
  stripped, missing columns tolerated (the transform nulls them).
- ``read_sacct_lines`` + ``stitch_lines``: the reference's pipe-delimited
  sacct stream format with the continuation-stitching quirk (reference
  sacct_iter, slurm2sql.py:877-914): sacct output has no quoting, so a
  JobName containing a newline splits one record across physical lines.
  A line with too few fields is buffered and glued to the next; a line
  with too many fields is counted as an error and skipped.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SACCT_DELIMITER = ";|;"

__all__ = [
    "read_csv",
    "stitch_lines",
    "read_sacct_lines",
    "sacct_lines_to_df",
    "sacct_dump_scan",
]


def read_csv(spark: SparkSession, path: str, delimiter: str = ",") -> DataFrame:
    """String-typed, trimmed CSV read (reference slurm2sql.py:995-1004)."""
    df = spark.read.option("header", True).option("sep", delimiter).csv(path)
    return df.select(
        *[F.trim(F.col(f"`{c}`")).alias(c.strip()) for c in df.columns]
    )


def stitch_lines(
    lines: Iterable[str], n_fields: int, errors: list | None = None
) -> Iterator[list[str]]:
    """Reassemble logical sacct records from physical lines.

    Pure-Python kernel mirroring the reference's iterator semantics
    (slurm2sql.py:877-914): fewer fields than the header -> the record
    continues on the next physical line (rejoined with ``\\n``); more
    fields -> unrecoverable, count and skip.
    """
    buf: str | None = None
    for line in lines:
        line = line.rstrip("\n")
        if buf is not None:
            line = buf + "\n" + line
            buf = None
        fields = line.split(SACCT_DELIMITER)
        if len(fields) < n_fields:
            buf = line
            continue
        if len(fields) > n_fields:
            if errors is not None:
                errors.append(line)
            continue
        yield fields


def read_sacct_lines(
    spark: SparkSession,
    lines: Iterable[str] | str,
    errors: list | None = None,
) -> DataFrame:
    """Parse raw sacct-format text (header line first) into a string
    DataFrame.

    Accepts an iterable of lines or a whole-text blob (the reference's
    ``raw_sacct`` injection seam, slurm2sql.py:881-883). Stitching is
    order-sensitive, so records are reassembled before parallelizing —
    matching the reference, where the stream is a single sacct pipe
    anyway. For file-shaped input at scale use ``sacct_lines_to_df``
    (``spark.read.csv`` with the multi-char delimiter — no stitching
    needed when JobNames are newline-free).

    ``errors`` collects unrecoverable (too-many-fields) lines so callers
    can surface the count and exit nonzero (reference counts these and
    returns 1, slurm2sql.py:785-788, 907-911).
    """
    if isinstance(lines, str):
        lines = lines.splitlines()
    from pyspark.sql import types as T

    it = iter(lines)
    header = next(it).rstrip("\n").split(SACCT_DELIMITER)
    schema = T.StructType(
        [T.StructField(h, T.StringType(), True) for h in header]
    )
    rows = [tuple(f) for f in stitch_lines(it, len(header), errors)]
    return spark.createDataFrame(rows, schema)


def sacct_lines_to_df(spark: SparkSession, path: str) -> DataFrame:
    """File of sacct pipe-delimited lines -> string DataFrame (happy
    path: no embedded newlines, so Spark's CSV reader handles the
    multi-char delimiter distributedly with pushdown-friendly scans)."""
    return spark.read.option("header", True).option("sep", SACCT_DELIMITER).csv(path)


def sacct_dump_scan(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Distributed dump scan WITH malformed-record accounting — the
    default ``--sacct-dump`` path (reference error contract:
    slurm2sql.py:785-788 counts unparseable lines and exits 1).

    Spark's CSV reader cannot do this accounting: in PERMISSIVE mode a
    short line (the signature of a JobName with an embedded newline
    splitting one record across physical lines) is silently null-padded,
    never marked corrupt. So the scan is a ``spark.read.text`` line
    scan + exact-arity split — sacct -P output has no quoting, so a
    well-formed record is precisely a line with ``len(header)`` fields:

    - arity == n: parsed (empty fields -> NULL, matching the CSV
      reader's ``nullValue`` default so downstream converters see the
      same shape either way);
    - arity != n: returned in the second frame for counting/reporting —
      both halves of a newline-split record land here (short), as do
      too-many-field lines (the reference's unrecoverable case).

    Repeated header lines (concatenated dumps) are dropped, not
    counted as errors. Driver-side stitching (``--stitch-lines``) is
    the only path that can REPAIR split records; this one detects and
    reports them at any scale. Returns ``(ok_rows, bad_lines)``; both
    are LAZY and independent — consuming both runs the line scan once
    each (plus the one-row header read), so an ingest with error
    accounting reads the dump twice. Callers who cannot afford the
    second scan can skip the bad-frame action; persisting ``split``
    would trade memory for the rescan and is deliberately not done
    here (dumps can exceed cluster cache).
    """
    import re

    lines = spark.read.text(path)
    header_line = lines.first()
    if header_line is None:
        raise ValueError(f"empty sacct dump: {path}")
    header_line = header_line[0]
    header = header_line.split(SACCT_DELIMITER)
    n = len(header)
    body = lines.filter(F.col("value") != header_line)
    parts = F.split(F.col("value"), re.escape(SACCT_DELIMITER), -1)
    split = body.select("value", parts.alias("_p")).withColumn(
        "_n", F.size("_p")
    )
    ok = split.filter(F.col("_n") == n).select(
        *[
            F.nullif(F.col("_p").getItem(i), F.lit("")).alias(h)
            for i, h in enumerate(header)
        ]
    )
    bad = split.filter(F.col("_n") != n).select(
        F.col("value").alias("line"), F.col("_n").alias("n_fields")
    )
    return ok, bad
