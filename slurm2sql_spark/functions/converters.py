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

import functools

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


# --- construction-cost control: SQL expression templates -------------------
#
# Every Column-API call is a py4j round trip. The branch-free converters
# below build 40-60 JVM calls each, and slurm_transform invokes them
# ~40 times per plan — measured 17k round trips ≈ 4-6 s of pure
# DRIVER-side construction per fresh plan (the execution itself is
# whole-stage-codegen'd and fast). Prepared-statement trick: build the
# expression tree once per distinct input expression, render it to SQL
# text, and reconstruct every later identical call with a single
# F.expr() parse. Falls back silently to direct construction where SQL
# rendering is unavailable (Spark Connect Columns have no _jc) — the
# result is identical either way, only construction cost differs.

# Thread-safety: this cache (and transform._PLAN_SQL_CACHE) relies on
# GIL-atomic dict get/set only — concurrent driver threads may at worst
# duplicate one template construction, never corrupt.  A None (Connect)
# entry persists if the process later switches to a classic session;
# that staleness costs construction speed, never correctness.
_SQL_TEMPLATE_CACHE: dict[tuple, str | list[str]] = {}

#: JVM handle to the classic-mode ColumnNode -> catalyst Expression
#: converter (Spark 4 removed Column.expr()); lazily bound, re-bound
#: once if the JVM restarted under us.
_NODE_CONVERTER = None


def _node_converter():
    global _NODE_CONVERTER
    if _NODE_CONVERTER is None:
        from pyspark import SparkContext

        jvm = SparkContext._jvm
        cls = jvm.java.lang.Class.forName(
            "org.apache.spark.sql.classic.ColumnNodeToExpressionConverter$"
        )
        _NODE_CONVERTER = cls.getField("MODULE$").get(None)
    return _NODE_CONVERTER


def _col_sql(col: Column | str) -> str | None:
    global _NODE_CONVERTER
    try:
        conv = _node_converter()
    except Exception:
        return None  # no classic JVM (Spark Connect) — direct build path
    try:
        return conv.apply(_c(col)._jc.node()).sql()
    except Exception:
        # Two distinct failures land here: THIS expression cannot
        # render (keep the binding — other expressions still can), or
        # the JVM restarted under us (handle is dead — rebind next
        # call). Distinguish with a cheap liveness probe instead of
        # unconditionally clearing, which would re-pay Class.forName
        # reflection on every unrenderable expression.
        try:
            conv.toString()
        except Exception:
            _NODE_CONVERTER = None
        return None


def cached_columns(key: tuple, build) -> list[Column]:
    """Build a LIST of Column expressions once per ``key``, render each
    to SQL text, and replay later calls as one ``F.expr`` parse per
    element — the list-shaped sibling of ``sql_templated`` for
    generated expression families (64 minhash aggs, 64 simhash bit
    sums, band explodes). The expressions must reference fixed column
    names; parameters that change the tree must be part of ``key``.
    Falls back to the direct build when rendering is unavailable."""
    sqls = _SQL_TEMPLATE_CACHE.get(key)
    if sqls is None:
        cols = build()
        rendered = [_col_sql(c) for c in cols]
        if any(s is None for s in rendered):
            return cols
        _SQL_TEMPLATE_CACHE[key] = rendered
        return cols
    return [F.expr(s) for s in sqls]


def sql_templated(fn):
    """Memoize ``fn``'s expression tree as re-parseable SQL text, keyed
    by (converter name, input-expression SQL). Non-default extra
    arguments bypass the cache (they change the tree)."""

    @functools.wraps(fn)
    def wrapper(col: Column | str, *args, **kwargs) -> Column:
        if args or kwargs:
            return fn(col, *args, **kwargs)
        in_sql = _col_sql(col)
        if in_sql is None:
            return fn(col)
        key = (fn.__qualname__, in_sql)
        out = _SQL_TEMPLATE_CACHE.get(key)
        if out is None:
            built = fn(col)
            rendered = _col_sql(built)
            if rendered is None:
                return built
            _SQL_TEMPLATE_CACHE[key] = out = rendered
        return F.expr(out)

    return wrapper


def _null_if_empty(c: Column, typed: Column, dtype: str) -> Column:
    """'' or NULL input -> typed NULL, else the converted expression."""
    return F.when(c.isNull() | (c == ""), F.lit(None).cast(dtype)).otherwise(typed)


# --- C1-C4: casts with null guards (reference slurm2sql.py:47-65) ----------


@sql_templated
def int_(col: Column | str) -> Column:
    """Strict integer (reference slurm2sql.py:47-50)."""
    return _c(col).cast("long")


@sql_templated
def nullint(col: Column | str) -> Column:
    """Integer, '' -> NULL (reference slurm2sql.py:52-55)."""
    c = _c(col)
    return _null_if_empty(c, c.cast("long"), "long")


@sql_templated
def nullstr(col: Column | str) -> Column:
    """String, '' -> NULL (reference slurm2sql.py:57-60)."""
    c = _c(col)
    return _null_if_empty(c, c, "string")


@sql_templated
def nullstr_strip(col: Column | str) -> Column:
    """Trimmed string, '' -> NULL (reference slurm2sql.py:62-65)."""
    c = _c(col)
    return _null_if_empty(c, F.trim(c), "string")


# --- C5/C8/C9: timestamps (reference slurm2sql.py:67-120) ------------------


@sql_templated
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


@sql_templated
def str_unknown(col: Column | str) -> Column:
    """'Unknown' -> NULL, otherwise passthrough (slurm2sql.py:117-120)."""
    c = _c(col)
    return F.when(c == "Unknown", F.lit(None).cast("string")).otherwise(c)


# --- C7: Slurm duration grammar (reference slurm2sql.py:84-107) ------------


@sql_templated
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

    # Perf shape — BRANCH-FREE by design. Spark's subexpression
    # elimination skips expressions inside CASE WHEN branch values, so a
    # CASE-structured parser re-evaluates split() once per element
    # reference (~1.9s/column at 750k rows). This form: one split over
    # `translate(c, '-', ':')` ("dd-hh:mm:ss" -> "dd:hh:mm:ss"), all
    # element reads unconditional (out-of-range -> NULL -> 0.0), the
    # day/standard/bare-minutes selection as 0/1 multiplier arithmetic,
    # and NULL propagation restored by one additive CASE whose branch
    # values are literals. Measures ~4x faster, same truth table.
    p = F.split(F.translate(c, "-", ":"), ":")
    n = F.size(p)
    d = "double"

    def at(i):
        return F.coalesce(F.element_at(p, i).cast(d), F.lit(0.0))

    # dd-hh[:mm[:ss]] — front-anchored after the day element.
    v_day = at(1) * 86400.0 + at(2) * 3600.0 + at(3) * 60.0 + at(4)
    # [[hh:]mm:]ss — back-anchored (absent parts read as 0).
    v_std = at(-3) * 3600.0 + at(-2) * 60.0 + at(-1)
    # bare number = minutes.
    v_bare = at(1) * 60.0

    day_f = c.contains("-").cast(d)
    bare_f = (n == 1).cast(d)
    value = day_f * v_day + (1.0 - day_f) * (
        bare_f * v_bare + (1.0 - bare_f) * v_std
    )

    # NULL restoration: for ''/UNLIMITED/Partition_Limit/garbage the
    # last element casts to NULL, so add a NULL instead of 0 (branch
    # values are literals — no recomputation).
    null_helper = F.when(
        F.element_at(p, -1).cast(d).isNull(), F.lit(None).cast(d)
    ).otherwise(F.lit(0.0))
    return value + null_helper


# --- C10-C13: unit-suffixed numbers (reference slurm2sql.py:122-164) -------


def _unit_scaled(c: Column, base: int, truncate: bool = False) -> Column:
    """num[kmgtpezy] -> num * base**k, where k is the unit's rank.

    Branch-free for the same reason as ``slurmtime``: CASE branch values
    are excluded from subexpression elimination, so the old
    ``when(k>0, num*scale).otherwise(cast)`` form re-evaluated the
    substr/instr chain per branch (~1.5s/column at 750k rows). Here the
    selection is 0/1 multiplier arithmetic over unconditional
    subexpressions, with NULL-ness restored additively; '' and NULL
    inputs fall out as NULL without a separate guard (their casts are
    NULL -> the helper fires).

    ``truncate=True`` truncates the numeric *mantissa* toward zero
    before applying the unit scale — the reference's int variants do
    ``int(float(x[:-1])) * scale`` (slurm2sql.py:149-151, 162-164), so
    '2.5k' -> 2*1024 = 2048, not trunc(2560). Spark's double->long cast
    truncates toward zero exactly like Python ``int()``.

    r7: single-cast form. The earlier branch-free form cast BOTH the
    trimmed mantissa and the raw string every row plus two coalesces
    and a NULL-restore CASE; trimming by a CONDITIONAL LENGTH
    (``substr(c, 1, length - (k>0))``) needs one cast and nothing else
    — the no-unit case trims zero chars, the unit case one, and every
    NULL/''/garbage input falls out of the single cast as NULL
    (NULL * scale stays NULL). Measured 2x on a 3-column 6M-row parse
    (10.8 -> 5.3 s), bit-identical on the unit/edge truth table
    (including '' where ``instr(units, '') = 1`` makes k=1 — harmless,
    the empty mantissa still casts to NULL).
    """
    d = "double"
    k = F.instr(F.lit(_BINARY_UNITS), F.lower(c.substr(-1, 1)))
    v = c.substr(F.lit(1), F.length(c) - (k > 0).cast("int")).cast(d)
    if truncate:
        v = v.cast("long").cast(d)
    return v * F.pow(F.lit(float(base)), k.cast(d))


@sql_templated
def float_bytes(col: Column | str) -> Column:
    """``2.5G`` -> bytes with binary units, 2**(10k) (slurm2sql.py:140-147)."""
    return _unit_scaled(_c(col), 1024)


@sql_templated
def int_bytes(col: Column | str) -> Column:
    """Binary units with the mantissa truncated *before* scaling
    (reference slurm2sql.py:149-151: ``int(float(x[:-1])) * 1024**k``)."""
    return _unit_scaled(_c(col), 1024, truncate=True).cast("long")


@sql_templated
def float_metric(col: Column | str) -> Column:
    """``2.5k`` -> 2500.0 with metric units, 1000**k (slurm2sql.py:153-160)."""
    return _unit_scaled(_c(col), 1000)


@sql_templated
def int_metric(col: Column | str) -> Column:
    """Metric units with the mantissa truncated *before* scaling
    (reference slurm2sql.py:162-164: ``int(float(x[:-1])) * 1000**k``)."""
    return _unit_scaled(_c(col), 1000, truncate=True).cast("long")


@sql_templated
def slurmmem(col: Column | str) -> Column:
    """Memory value: strip trailing ``n``/``c`` flag, then binary bytes
    (reference slurm2sql.py:122-127)."""
    return _unit_scaled(F.regexp_replace(_c(col), "[nc]+$", ""), 1024)
