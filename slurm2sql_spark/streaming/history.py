"""Incremental ingest: the reference's hand-rolled history protocol
(reference get_history, slurm2sql.py:791-851) as a watermarked batch
driver loop.

Semantics preserved exactly:

- T1 day chunking: the [start, stop] range is split at local-midnight
  day boundaries (reference slurm2sql.py:835-843), one fetch + upsert
  per window, so a failed fetch loses at most one day and each batch
  touches O(1) day-partitions of the sink.
- T2 resume watermark: a single timestamp persisted after every
  committed window (reference meta_slurm_lastupdate, slurm2sql.py:947,
  1104-1120). State is a tiny JSON file next to the table — the Spark
  analog of the one-row metadata table.
- T3 overlap tolerance: resume restarts 5 seconds *before* the stamp
  (reference slurm_timestamp's ``- 5``, slurm2sql.py:109-115); the
  keyed upsert makes the replayed sliver idempotent.
- T5 stop boundary: ``stop = now + 6 h`` slack unless an explicit end
  (reference slurm2sql.py:828-831).

The per-window fetch is a callable ``(window_start_ts, window_end_ts)
-> DataFrame`` — wrapping the sacct DataSource in production, or a test
fixture/file source locally (the reference has the same seam:
``raw_sacct``).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable, Iterator
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession

from slurm2sql_spark.sinks.parquet_sink import upsert

__all__ = [
    "day_windows",
    "get_watermark",
    "set_watermark",
    "ingest_history",
    "parse_slurmtime",
    "RESUME_REWIND_S",
    "STOP_SLACK_S",
]

RESUME_REWIND_S = 5  # reference slurm2sql.py:114
STOP_SLACK_S = 6 * 3600  # reference slurm2sql.py:831


def parse_slurmtime(s: str) -> int:
    """Driver-side Slurm duration grammar -> seconds (the Python twin of
    ``functions.converters.slurmtime``, reference slurm2sql.py:84-107):
    ``dd-hh[:mm[:ss]]`` front-anchored, ``[[hh:]mm:]ss`` back-anchored,
    bare number = minutes. Used by ``--history=7-0``-style CLI flags."""
    s = s.strip()
    if "-" in s:
        d, rest = s.split("-", 1)
        parts = rest.split(":") if rest else []
        parts += ["0"] * (3 - len(parts))
        h, m, sec = parts[:3]
        return (
            int(d) * 86400 + int(h or 0) * 3600 + int(m or 0) * 60
            + int(float(sec or 0))
        )
    parts = s.split(":")
    if len(parts) == 1:
        return int(float(s)) * 60
    parts = ["0"] * (3 - len(parts)) + parts
    h, m, sec = parts[-3:]
    return int(h) * 3600 + int(m) * 60 + int(float(sec))


def day_windows(start_ts: int, stop_ts: int) -> Iterator[tuple[int, int]]:
    """Split [start, stop) at local-midnight boundaries (reference
    slurm2sql.py:835-843): first window ends at the next midnight, then
    whole days, last window ends at stop."""
    cur = start_ts
    while cur < stop_ts:
        nxt_midnight = int(
            datetime.combine(
                datetime.fromtimestamp(cur).date() + timedelta(days=1),
                datetime.min.time(),
            ).timestamp()
        )
        nxt = min(nxt_midnight, stop_ts)
        yield cur, nxt
        cur = nxt


def _state_path(table_path: str) -> str:
    return table_path.rstrip("/") + ".lastupdate.json"


def get_watermark(table_path: str) -> int | None:
    """Read the resume stamp (reference get_last_timestamp,
    slurm2sql.py:1110-1120)."""
    p = _state_path(table_path)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)["update_time"]


def set_watermark(table_path: str, ts: int) -> None:
    """Persist the resume stamp (reference update_last_timestamp,
    slurm2sql.py:1104-1108) — atomic rename so a crash never leaves a
    torn stamp."""
    p = _state_path(table_path)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"update_time": ts}, f)
    os.replace(tmp, p)


def ingest_history(
    spark: SparkSession,
    fetch: Callable[[int, int], DataFrame],
    table_path: str,
    start_ts: int | None = None,
    stop_ts: int | None = None,
    resume: bool = False,
    key: str = "JobID",
    partition_cols: tuple[str, ...] = (),
    now: int | None = None,
) -> int:
    """Run the day-windowed incremental loop; returns windows committed.

    ``resume=True`` starts from the persisted watermark minus the
    5-second rewind (reference --history-resume, slurm2sql.py:807-821).
    The watermark is stamped progressively after each committed window
    with that window's actual end ``min(window_end, now)`` (reference
    ``update_last_timestamp(db, update_time=end_)`` with ``end_ =
    min(end_, time.time())``, slurm2sql.py:845-848) — a crash mid-loop
    resumes from the last *committed* window, losing at most one day.
    Re-running refreshes still-running jobs (T4) because their ``Time``
    column re-derives as 'now' on each pass.
    """
    t_now = int(time.time()) if now is None else now
    if resume:
        wm = get_watermark(table_path)
        if wm is not None:
            start_ts = wm - RESUME_REWIND_S
        elif start_ts is None:
            raise ValueError("resume requested but no watermark and no start_ts")
    if start_ts is None:
        raise ValueError("start_ts required (or resume with a watermark)")
    stop = stop_ts if stop_ts is not None else t_now + STOP_SLACK_S

    n = 0
    for ws, we in day_windows(start_ts, stop):
        df = fetch(ws, we)
        if df is not None:
            upsert(spark, df, table_path, key=key, partition_cols=partition_cols)
        set_watermark(table_path, min(we, t_now))
        n += 1
    return n
