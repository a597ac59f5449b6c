"""``sacct`` as a PySpark 4 Python DataSource (reference S1,
slurm2sql.py:854-864) — Spark-first re-design of the reference's
driver-side subprocess pipe.

Architecture: instead of one streamed sacct call (single-threaded in
the reference), the scan is *partitioned by time window* — each Spark
task runs ``sacct -S <win_start> -E <win_end>`` for one day-sized
window, exactly the chunking the reference's history loop does serially
"to avoid overloading sacct" (slurm2sql.py:798-800, 835-851), but
issued from executors in parallel. The per-row output is the same
pipe-delimited format parsed with the continuation stitcher (S2).

Pushdown:
- Projection (S6): Spark 4 prunes columns for Python sources after the
  scan; the source additionally honors an explicit ``columns`` option
  to shrink ``sacct -o`` itself (the reference's fixed request list,
  slurm2sql.py:992).
- Predicates (S7): ``pushFilters`` translates EqualTo filters on
  User/Partition/State into ``--user/--partition/--state`` sacct args
  (reference args_to_sacct_filter, slurm2sql.py:1039-1069); everything
  else stays in Spark.

The sacct binary is configurable (``sacct_bin`` option) so tests can
inject a fake; on hosts without Slurm the source raises at read time,
never at import.

Usage::

    spark.dataSource.register(SacctDataSource)
    df = (spark.read.format("sacct")
          .option("start", "2024-01-01").option("end", "2024-01-08")
          .load())
"""

from __future__ import annotations

import re
import subprocess
from datetime import datetime, timedelta

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from slurm2sql_spark.schema import RAW_FIELDS
from slurm2sql_spark.sources.csv_source import SACCT_DELIMITER, stitch_lines

__all__ = [
    "SacctDataSource",
    "args_to_sacct_filter",
    "slurm_version",
    "ENDED_STATES",
    "COMPLETED_STATES",
    "CANCELLED_STATES",
    "FAILED_STATES",
]


def slurm_version(cmd: tuple[str, ...] = ("sacct", "--version")) -> tuple[int, ...]:
    """Probe the installed Slurm version as an int tuple (reference
    slurm2sql.py:1123-1132; vestigial there — only tests call it — but
    part of the public surface).

    Output like ``slurm 19.05.7-Bull.1.0`` parses to ``(19, 5, 7)``;
    no sacct (or unparseable output) falls back to ``(20, 11)``, the
    latest release with a schema change (ReqGRES folded into ReqTRES) —
    the schema-evolution behavior itself is handled structurally here
    (a missing ReqGRES column just projects as NULL, transform.py).
    """
    try:
        out = subprocess.check_output(list(cmd)).decode()
    except (FileNotFoundError, subprocess.CalledProcessError):
        return (20, 11)
    m = re.match(r"slurm\s+([0-9]+)\.([0-9]+)(?:\.([0-9]+))?", out)
    if not m:
        return (20, 11)
    return tuple(int(x) for x in m.groups() if x is not None)

# Terminal job states (reference slurm2sql.py:1156-1159).
ENDED_STATES = "CA,CD,DL,F,NF,OOM,PR,RV,TO"
COMPLETED_STATES = "CD"
CANCELLED_STATES = "CA,DL"
FAILED_STATES = "F,NF,OOM,TO"


def args_to_sacct_filter(
    jobs: str | None = None,
    user: str | None = None,
    partition: str | None = None,
    state: str | None = None,
    start: str | None = None,
    end: str | None = None,
    ended: bool = False,
    completed: bool = False,
    cancelled: bool = False,
    failed: bool = False,
    running_at_time: str | None = None,
) -> list[str]:
    """CLI-style selectors -> sacct argument list (reference
    args_to_sacct_filter, slurm2sql.py:1039-1069).

    The state selectors are mutually exclusive, as in the reference's
    argparse group; ``running_at_time`` expands to a point-in-time
    window with ``--state=RUNNING`` (reference slurm2sql.py:1066-1068).
    """
    args: list[str] = []
    if jobs:
        args.append(f"--jobs={jobs}")
    if user:
        args.append(f"--user={user}")
    if partition:
        args.append(f"--partition={partition}")
    if ended:
        args += ["--endtime=now", f"--state={ENDED_STATES}"]
    elif completed:
        args += ["--endtime=now", f"--state={COMPLETED_STATES}"]
    elif cancelled:
        args += ["--endtime=now", f"--state={CANCELLED_STATES}"]
    elif failed:
        args += ["--endtime=now", f"--state={FAILED_STATES}"]
    elif running_at_time:
        args += [
            f"--start={running_at_time}",
            f"--end={running_at_time}",
            "--state=RUNNING",
        ]
    elif state:
        args.append(f"--state={state}")
    if start:
        args.append(f"--starttime={start}")
    if end:
        args.append(f"--endtime={end}")
    return args


_RELATIVE_UNIT_S = {
    "": 1, "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60, "min": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _parse_sacct_time(s: str, now: datetime | None = None) -> datetime:
    """Parse a sacct-style time bound.

    Absolute forms keep any time component ('2026-08-13',
    '2026-08-13T06:00', '2026-08-13T06:00:30'). Slurm's relative
    grammar — which the reference's own -S help text recommends
    ('now-1week') and passes to sacct verbatim — is resolved here since
    no sacct does it for us on the --db/--csv paths: 'now',
    'now±N[seconds|minutes|hours|days|weeks]' (bare N means seconds),
    'today', 'yesterday', 'midnight', 'noon', 'teatime'.
    """
    for fmt in ("%Y-%m-%dT%H:%M:%S", "%Y-%m-%dT%H:%M", "%Y-%m-%d"):
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    now = now or datetime.now()
    midnight = now.replace(hour=0, minute=0, second=0, microsecond=0)
    word = s.strip().lower()
    fixed = {
        "now": now,
        "today": midnight,
        "midnight": midnight,
        "yesterday": midnight - timedelta(days=1),
        "noon": midnight + timedelta(hours=12),
        "teatime": midnight + timedelta(hours=16),
    }
    if word in fixed:
        return fixed[word]
    m = re.fullmatch(r"now([+-])(\d+)\s*([a-z]*)", word)
    if m and m.group(3) in _RELATIVE_UNIT_S:
        delta = timedelta(seconds=int(m.group(2)) * _RELATIVE_UNIT_S[m.group(3)])
        return now + delta if m.group(1) == "+" else now - delta
    raise ValueError(f"unparseable sacct time bound: {s!r}")


def _fmt_sacct_time(d: datetime) -> str:
    """Midnight renders date-only (sacct-idiomatic); otherwise the full
    timestamp so partial-day bounds survive."""
    if d.hour == d.minute == d.second == 0:
        return d.strftime("%Y-%m-%d")
    return d.strftime("%Y-%m-%dT%H:%M:%S")


class _Window(InputPartition):
    def __init__(self, start: str | None, end: str | None):
        self.start = start
        self.end = end


class SacctReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.schema_ = schema
        self.options = options
        self.pushed_args: list[str] = []

    # -- S7: predicate pushdown ---------------------------------------
    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        """Translate supported EqualTo filters into sacct args as
        *prefilters*: sacct narrows the stream server-side, but every
        filter is yielded back so Spark still evaluates the exact
        predicate (sacct's --state/--user matching is coarser than SQL
        equality — e.g. state codes vs 'CANCELLED by uid' strings)."""
        try:
            from pyspark.sql.datasource import EqualTo
        except ImportError:  # API absent -> push nothing
            yield from filters
            return
        pushable = {"User": "--user={}", "Partition": "--partition={}",
                    "State": "--state={}"}
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute[0] in pushable:
                self.pushed_args.append(pushable[f.attribute[0]].format(f.value))
            yield f

    # -- T1-shaped parallelism: one partition per day window ----------
    def partitions(self):
        start = self.options.get("start")
        end = self.options.get("end")
        if not start or not end:
            return [_Window(start, end)]
        s = _parse_sacct_time(start)
        e = _parse_sacct_time(end)
        out = []
        cur = s
        while cur < e:
            # Break at the next midnight, but never overshoot the exact
            # requested end — a timestamped bound ('2026-08-13T06:00')
            # keeps its time component instead of collapsing to midnight
            # and silently dropping the final partial day.
            nxt_midnight = datetime.combine(
                cur.date() + timedelta(days=1), datetime.min.time()
            )
            nxt = min(nxt_midnight, e)
            out.append(_Window(_fmt_sacct_time(cur), _fmt_sacct_time(nxt)))
            cur = nxt
        return out or [_Window(start, end)]

    def read(self, partition: _Window):
        bin_ = self.options.get("sacct_bin", "sacct")
        cols = [f.name for f in self.schema_.fields]
        cmd = [
            bin_, "-o", ",".join(cols), "-P", "--delimiter=" + SACCT_DELIMITER,
            "--allusers",
        ]
        cmd += self.pushed_args
        extra = self.options.get("sacct_args")
        if extra:
            cmd += extra.split()
        if partition.start:
            cmd.append(f"--starttime={partition.start}")
        if partition.end:
            cmd.append(f"--endtime={partition.end}")

        proc = subprocess.Popen(
            cmd, stdout=subprocess.PIPE, text=True, bufsize=1
        )
        assert proc.stdout is not None
        header_line = proc.stdout.readline()
        if not header_line:
            proc.wait()
            return
        header = header_line.rstrip("\n").split(SACCT_DELIMITER)
        idx = [header.index(c) if c in header else None for c in cols]
        errors: list = []
        for fields in stitch_lines(proc.stdout, len(header), errors):
            yield tuple(fields[i] if i is not None else None for i in idx)
        proc.wait()
        if errors:
            # executor-side: surfaces in task logs; the driver-side pipe
            # paths (read_sacct_lines) thread the count to an exit code
            import logging

            logging.getLogger(__name__).warning(
                "sacct window %s..%s: %d unparseable lines skipped",
                partition.start, partition.end, len(errors),
            )


class SacctDataSource(DataSource):
    """``spark.read.format("sacct")`` — register with
    ``spark.dataSource.register(SacctDataSource)``."""

    @classmethod
    def name(cls):
        return "sacct"

    def schema(self):
        cols = self.options.get("columns")
        fields = cols.split(",") if cols else list(RAW_FIELDS)
        return T.StructType(
            [T.StructField(c, T.StringType(), True) for c in fields]
        )

    def reader(self, schema: T.StructType):
        return SacctReader(schema, dict(self.options))
