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
#: query extraction runs on the FRAGMENT-STRIPPED url (see _parts) so a
#: '?' living only inside the fragment (SPA hash routing,
#: https://h/p#/route?x=1) can never resurrect as a query string.
_QUERY_RE = r"\?(.*)$"


def _parts(url: Column):
    """(scheme, host, port, path, query, bad_port) columns.

    - userinfo (``user:pass@``) is stripped from the authority before
      the host/port split, so lowercasing / default-port logic applies
      to the real host;
    - port is parsed NUMERICALLY (``:080`` == ``:80``); a present but
      non-numeric/empty port surfaces as ``bad_port`` and the caller
      treats the whole URL as malformed (NULL) — a wrong dedup key is
      worse than no key. Bracketed IPv6 authorities (``[::1]``) are
      outside the RFC-3986-lite subset and also flag ``bad_port``.
    - the fragment is stripped FIRST, so neither path nor query can
      see fragment bytes.
    """
    nofrag = F.substring_index(url, "#", 1)
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    hostport = F.regexp_extract(nofrag, _HOSTPORT_RE, 1)
    hp = F.substring_index(hostport, "@", -1)
    has_port = hp.contains(":")
    host = F.lower(
        F.when(has_port, F.substring_index(hp, ":", 1)).otherwise(hp)
    )
    # try_cast, not cast: a garbage port must flag bad_port, not throw
    # under the driver's ANSI-on session
    port = F.when(
        has_port, F.substring_index(hp, ":", -1).try_cast("int")
    ).otherwise(F.lit(None).cast("int"))
    bad_port = (has_port & port.isNull()) | hp.contains("[")
    path = F.regexp_extract(nofrag, _PATH_RE, 1)
    query = F.regexp_extract(nofrag, _QUERY_RE, 1)
    return scheme, host, port, path, query, bad_port


def url_normalize(url: Column) -> Column:
    """Canonical form of ``url`` (see module doc). Malformed input
    (no ``scheme://``) returns NULL rather than a half-parsed string —
    a downstream URL-dedup key must never collide real URLs with
    garbage. NULL input stays NULL. A present-but-non-numeric port (or
    a bracketed IPv6 authority, outside the documented subset) also
    returns NULL — same wrong-key-is-worse-than-no-key contract."""
    scheme, host, port, path, query, bad_port = _parts(url)
    default_port = (
        ((scheme == "http") & (port.eqNullSafe(80)))
        | ((scheme == "https") & (port.eqNullSafe(443)))
        | port.isNull()
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
            F.concat(F.lit(":"), port.cast("string"))
        ),
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(F.size(kept) > 0, F.concat(F.lit("?"), qs)).otherwise(
            F.lit("")
        ),
    )
    return F.when(
        (scheme == "") | bad_port, F.lit(None).cast("string")
    ).otherwise(norm)


def url_domain(url: Column) -> Column:
    """Last-two-labels domain of the URL's host (lowercased); NULL for
    malformed URLs or bare-label hosts (e.g. ``localhost``). This is
    the documented heuristic tier — ``url_domain_psl`` (public-suffix
    longest-match) is the production path."""
    _, host, _, _, _, bad_port = _parts(url)
    dom = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(
        (dom == "") | bad_port, F.lit(None).cast("string")
    ).otherwise(dom)


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
