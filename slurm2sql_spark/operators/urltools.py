"""URL normalization and domain extraction — the crawl-side curation
stage that precedes content work in every web-corpus pipeline
(CommonCrawl processing dedups by canonical URL and mixes/filters by
domain BEFORE fetching or extracting text; L57's HTML extraction and
the dedup family consume what this stage admits).

Everything is a Column expression over an RFC-3986-lite URL subset —
``scheme://host[:port][/path][?query][#fragment]`` — kept RE2-portable
so the DuckDB oracle reproduces the canonical form bit-for-bit:

- scheme and host lowercase (path/query stay case-sensitive, per RFC);
- default ports drop (http:80, https:443), explicit others stay;
- the fragment drops (never sent to the server);
- query parameters: tracking params drop (``utm_*``, ``fbclid``,
  ``gclid``, ``ref``), the rest SORT bytewise and rejoin — parameter
  order is the #1 source of spurious URL-dedup misses;
- empty path canonicalizes to ``/``;
- ``domain`` is the last two host labels (a heuristic, NOT the Public
  Suffix List — co.uk-style suffixes group one level too coarse; a
  production deployment swaps in a broadcast PSL lookup, same plan
  shape).

Scale: one scan-stage projection per URL — no UDF, no shuffle; the
per-domain rollup downstream is a map-side-combined count. No
reference-repo analog; extends the L57+ web-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["url_normalize", "url_domain", "TRACKING_PARAM_RE"]

#: Query parameters that never affect content identity (the standard
#: analytics/click-id families). Anchored NAME match — shared with the
#: oracle via the catalog fragment.
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref)(=|$)"

#: scheme://authority capture (authority = everything to the first
#: /, ? or #)
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def _parts(url: Column):
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    hostport = F.regexp_extract(url, _HOSTPORT_RE, 1)
    host = F.lower(
        F.when(
            hostport.contains(":"),
            F.substring_index(hostport, ":", 1),
        ).otherwise(hostport)
    )
    port = F.when(
        hostport.contains(":"), F.substring_index(hostport, ":", -1)
    ).otherwise(F.lit(""))
    path = F.regexp_extract(url, _PATH_RE, 1)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    return scheme, host, port, path, query


def url_normalize(url: Column) -> Column:
    """Canonical form of ``url`` (see module doc). Malformed input
    (no ``scheme://``) returns NULL rather than a half-parsed string —
    a downstream URL-dedup key must never collide real URLs with
    garbage. NULL input stays NULL."""
    scheme, host, port, path, query = _parts(url)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (F.length(p) > 0)
            & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.concat_ws("&", kept)
    norm = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(default_port, F.lit("")).otherwise(
            F.concat(F.lit(":"), port)
        ),
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(F.size(kept) > 0, F.concat(F.lit("?"), qs)).otherwise(
            F.lit("")
        ),
    )
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(norm)


def url_domain(url: Column) -> Column:
    """Last-two-labels domain of the URL's host (lowercased); NULL for
    malformed URLs or bare-label hosts (e.g. ``localhost``)."""
    _, host, _, _, _ = _parts(url)
    dom = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(dom == "", F.lit(None).cast("string")).otherwise(dom)


def url_table(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """Per-row canonicalization frame: ``(id, url_norm, domain)`` —
    the URL-dedup key and the domain-mixing stratum in one projection.
    Feed ``url_norm`` to ``dedup.exact_dedup`` (URL-level dedup) and
    ``domain`` to ``sampling.mix_temperature`` (domain mixing)."""
    u = F.col(url_col)
    return df.select(
        F.col(id_col),
        url_normalize(u).alias("url_norm"),
        url_domain(u).alias("domain"),
    )
