"""TRES/GRES ``key=value,key=value`` field extraction.

The reference's ``ExtractField`` generator (reference slurm2sql.py:178-197)
compiles ``\\bfield=([^,]*)\\b`` per field and is instantiated 9 times in
the COLUMNS registry (slurm2sql.py:643-686). Here it is one Column
builder: extract -> typed convert -> optional scale.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["tres_field"]


def tres_field(
    col: Column | str,
    field: str,
    converter: Callable[[Column], Column] | None = None,
    wrap: Callable[[Column], Column] | None = None,
) -> Column:
    """Extract ``field=<value>`` from a TRES-style string column.

    ``converter`` is one of the scalar converters (e.g. ``float_bytes``,
    ``float_metric``, ``slurmtime``); ``wrap`` post-processes the typed
    value (the reference's ``wrap`` hook, used for gpuutil/100 at
    slurm2sql.py:684 — kept as a division, not a *0.01, for bit-exact
    float parity).

    Field names may contain ``/`` (``gres/gpu``); the match mirrors the
    reference's word-boundary regex ``\\bfield=([^,]*)\\b`` exactly, so
    ``gres/gpu=`` does not match inside ``gres/gpuutil=`` (the literal
    ``=`` anchors the key) and an empty value fails the trailing ``\\b``
    -> NULL, as in the reference.
    """
    c = F.col(col) if isinstance(col, str) else col
    import re as _re

    pattern = rf"\b{_re.escape(field)}=([^,]*)\b"
    raw = F.regexp_extract(c, pattern, 1)
    # regexp_extract yields '' both for no-match and empty value; the
    # reference returns NULL for no-match and converts '' -> NULL too.
    value = F.when(raw == "", F.lit(None).cast("string")).otherwise(raw)
    out = converter(value) if converter is not None else value
    if wrap is not None:
        out = wrap(out)
    return out
