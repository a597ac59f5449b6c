"""Scalar converters: sacct text -> typed values, as Column expressions.

Reimplements the semantics of the reference's converter functions
(reference slurm2sql.py:47-164) declaratively so Catalyst can codegen
them. Semantics notes cite the reference; behavior is pinned by
tests/test_converters.py which mirrors the reference truth tables
(reference test.py:287-327).

Unit-suffix contract (reference slurm2sql.py:130-164): a trailing
character from ``kmgtpezy`` (case-insensitive) scales the numeric prefix
by 2**(10k) ("binary", used for byte sizes) or 1000**k ("metric", used
for counts). No suffix means the bare number.

Null contract: empty string -> NULL everywhere; sentinel strings
(``Unknown``, ``None``, ``UNLIMITED``, ``Partition_Limit``) -> NULL
where the reference maps them (slurm2sql.py:67-73, 87-89, 117-120).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "int_",
    "nullint",
    "nullstr",
    "nullstr_strip",
    "unixtime",
    "slurmtime",
    "slurm_timestamp",
    "str_unknown",
    "slurmmem",
    "float_bytes",
    "int_bytes",
    "float_metric",
    "int_metric",
]

_BINARY_UNITS = "kmgtpezy"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _null_if_empty(c: Column, typed: Column, dtype: str) -> Column:
    """'' or NULL input -> typed NULL, else the converted expression."""
    return F.when(c.isNull() | (c == ""), F.lit(None).cast(dtype)).otherwise(typed)


# --- C1-C4: casts with null guards (reference slurm2sql.py:47-65) ----------


def int_(col: Column | str) -> Column:
    """Strict integer (reference slurm2sql.py:47-50)."""
    return _c(col).cast("long")


def nullint(col: Column | str) -> Column:
    """Integer, '' -> NULL (reference slurm2sql.py:52-55)."""
    c = _c(col)
    return _null_if_empty(c, c.cast("long"), "long")


def nullstr(col: Column | str) -> Column:
    """String, '' -> NULL (reference slurm2sql.py:57-60)."""
    c = _c(col)
    return _null_if_empty(c, c, "string")


def nullstr_strip(col: Column | str) -> Column:
    """Trimmed string, '' -> NULL (reference slurm2sql.py:62-65)."""
    c = _c(col)
    return _null_if_empty(c, F.trim(c), "string")


# --- C5/C8/C9: timestamps (reference slurm2sql.py:67-120) ------------------


def unixtime(col: Column | str) -> Column:
    """``%Y-%m-%dT%H:%M:%S`` in the *session* timezone -> epoch seconds.

    The reference parses in the converting machine's local zone
    (reference slurm2sql.py:67-73); here "local" is
    ``spark.sql.session.timeZone``, which callers pin explicitly.
    ``Unknown`` / ``None`` / '' -> NULL.
    """
    c = _c(col)
    return F.when(
        c.isNull() | c.isin("", "Unknown", "None"), F.lit(None).cast("long")
    ).otherwise(F.unix_timestamp(c, "yyyy-MM-dd'T'HH:mm:ss"))


def slurm_timestamp(col: Column | str, rewind_s: int = 5) -> Column:
    """Epoch seconds -> Slurm timestamp string, minus a safety rewind.

    Used by the history-resume path: re-fetch starts ``rewind_s`` before
    the stored watermark so replay overlaps rather than gaps (reference
    slurm2sql.py:109-115; overlap applied at 810, 821).
    """
    return F.date_format(
        F.from_unixtime(_c(col) - F.lit(rewind_s)), "yyyy-MM-dd'T'HH:mm:ss"
    )


def str_unknown(col: Column | str) -> Column:
    """'Unknown' -> NULL, otherwise passthrough (slurm2sql.py:117-120)."""
    c = _c(col)
    return F.when(c == "Unknown", F.lit(None).cast("string")).otherwise(c)


# --- C7: Slurm duration grammar (reference slurm2sql.py:84-107) ------------


def slurmtime(col: Column | str) -> Column:
    """Parse Slurm elapsed/limit strings to seconds (DoubleType).

    Grammar (reference slurm2sql.py:84-107, pinned by test.py:317-327):

    - With ``-``: ``dd-hh[:mm[:ss]]`` — the anchor is the *front*.
    - Without ``-``: ``[[hh:]mm:]ss``-style anchoring from the *back*,
      EXCEPT a bare number means **minutes**; fractional seconds allowed
      (``00:15.057``).
    - ``UNLIMITED`` / ``Partition_Limit`` / '' -> NULL.
    """
    c = _c(col)

    # dd-hh[:mm[:ss]] — anchored at the front after the day split.
    day_parts = F.split(c, "-", 2)
    days = F.element_at(day_parts, 1).cast("double")
    hms_d = F.split(F.element_at(day_parts, 2), ":")
    nd = F.size(hms_d)
    with_days = (
        days * 86400.0
        + F.element_at(hms_d, 1).cast("double") * 3600.0
        + F.when(nd >= 2, F.element_at(hms_d, 2).cast("double") * 60.0).otherwise(0.0)
        + F.when(nd >= 3, F.element_at(hms_d, 3).cast("double")).otherwise(0.0)
    )

    # [[hh:]mm:]ss anchored at the back; bare number = minutes.
    hms = F.split(c, ":")
    n = F.size(hms)
    without_days = (
        F.when(n >= 3, F.element_at(hms, -3).cast("double") * 3600.0).otherwise(0.0)
        + F.when(
            n >= 2,
            F.element_at(hms, -2).cast("double") * 60.0
            + F.element_at(hms, -1).cast("double"),
        ).otherwise(F.element_at(hms, -1).cast("double") * 60.0)
    )

    return (
        F.when(
            c.isNull() | c.isin("", "UNLIMITED", "Partition_Limit"),
            F.lit(None).cast("double"),
        )
        .when(c.contains("-"), with_days)
        .otherwise(without_days)
    )


# --- C10-C13: unit-suffixed numbers (reference slurm2sql.py:122-164) -------


def _unit_scaled(c: Column, base: int) -> Column:
    """num[kmgtpezy] -> num * base**k, where k is the unit's rank."""
    unit = F.lower(c.substr(-1, 1))
    num = c.substr(F.lit(1), F.length(c) - 1)
    k = F.instr(F.lit(_BINARY_UNITS), unit)  # 1-based rank; 0 if absent
    scale = F.pow(F.lit(float(base)), k.cast("double"))
    return F.when(k > 0, num.cast("double") * scale).otherwise(c.cast("double"))


def float_bytes(col: Column | str) -> Column:
    """``2.5G`` -> bytes with binary units, 2**(10k) (slurm2sql.py:140-147)."""
    c = _c(col)
    return _null_if_empty(c, _unit_scaled(c, 1024), "double")


def int_bytes(col: Column | str) -> Column:
    """Same, truncated to integer (reference slurm2sql.py:149-151)."""
    c = _c(col)
    return _null_if_empty(c, _unit_scaled(c, 1024).cast("long"), "long")


def float_metric(col: Column | str) -> Column:
    """``2.5k`` -> 2500.0 with metric units, 1000**k (slurm2sql.py:153-160)."""
    c = _c(col)
    return _null_if_empty(c, _unit_scaled(c, 1000), "double")


def int_metric(col: Column | str) -> Column:
    """Same, truncated to integer (reference slurm2sql.py:162-164)."""
    c = _c(col)
    return _null_if_empty(c, _unit_scaled(c, 1000).cast("long"), "long")


def slurmmem(col: Column | str) -> Column:
    """Memory value: strip trailing ``n``/``c`` flag, then binary bytes
    (reference slurm2sql.py:122-127)."""
    c = _c(col)
    stripped = F.regexp_replace(c, "[nc]+$", "")
    return _null_if_empty(c, _unit_scaled(stripped, 1024), "double")
