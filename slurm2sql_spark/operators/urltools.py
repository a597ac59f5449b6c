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
- ``domain`` is the PSL registrable domain ("eTLD+1"): a pinned
  Public Suffix List snapshot compiles into ONE chained-CASE
  expression of constant-k trailing-label slices (longest rule wins,
  exception rules beat all, unlisted TLDs fall to the default rule =
  the old last-two-labels heuristic). ``load_psl(path)`` swaps in the
  full published list; ``url_domain`` keeps the bare heuristic.

Scale: one scan-stage projection per URL — no UDF, no shuffle; the
per-domain rollup downstream is a map-side-combined count. No
reference-repo analog; extends the L57+ web-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "url_normalize",
    "url_domain",
    "url_domain_psl",
    "url_table",
    "registrable_domain",
    "registrable_domain_sql",
    "load_psl",
    "PSL_SNAPSHOT",
    "TRACKING_PARAM_RE",
]

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


# --------------------------------------------------------------------
# Public-Suffix-List registrable domains (the r11 verdict's #1 ask:
# the last-two-labels heuristic collapses every co.uk host into one
# stratum, corrupting domain mixing on ccTLD-heavy crawls)
# --------------------------------------------------------------------

#: Pinned snapshot of the Public Suffix List (publicsuffix.org — the
#: public, community-maintained registry Mozilla publishes; full file
#: is ~9.5k rules). This subset carries the high-traffic ccTLD
#: second-level registries, the canonical wildcard/exception rules
#: (``*.ck`` / ``!www.ck``), multi-label private suffixes
#: (``s3.amazonaws.com``, ``*.compute.amazonaws.com``) and the common
#: hosting platforms. Unlisted TLDs fall through to the PSL default
#: rule ``*`` (public suffix = last label), which is exactly the old
#: heuristic — so the snapshot only ever *refines* strata, never
#: coarsens them. Production swap-in: ``load_psl(path)`` on the full
#: published file, passed as ``rules=`` — same compiled plan shape.
PSL_SNAPSHOT = (
    # --- United Kingdom ---
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk",
    "sch.uk", "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    # --- Australia ---
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au",
    "id.au",
    # --- Japan ---
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    # --- New Zealand ---
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "kiwi.nz",
    "maori.nz", "net.nz", "org.nz", "school.nz",
    # --- Brazil ---
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br",
    "blog.br",
    # --- China ---
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "net.cn", "org.cn",
    "mil.cn",
    # --- India ---
    "co.in", "firm.in", "net.in", "org.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "res.in", "gov.in", "mil.in",
    # --- South Korea ---
    "ac.kr", "co.kr", "go.kr", "mil.kr", "ne.kr", "or.kr", "pe.kr",
    "re.kr", "sc.kr",
    # --- South Africa ---
    "ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za",
    "net.za", "nom.za", "org.za", "school.za", "web.za",
    # --- Mexico / Argentina ---
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "edu.ar", "gob.ar", "gov.ar", "int.ar", "mil.ar",
    "net.ar", "org.ar",
    # --- Turkey ---
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "mil.tr",
    "av.tr", "web.tr",
    # --- Taiwan / Hong Kong / Singapore ---
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "mil.tw",
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg",
    # --- Israel / Thailand / Indonesia / Malaysia ---
    "ac.il", "co.il", "gov.il", "muni.il", "net.il", "org.il",
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "ac.id", "biz.id", "co.id", "go.id", "mil.id", "my.id",
    "net.id", "or.id", "sch.id", "web.id",
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my",
    "name.my",
    # --- Poland / Ukraine / Vietnam / Philippines ---
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    "kiev.ua", "kyiv.ua",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn",
    "ac.vn", "biz.vn", "info.vn", "name.vn", "pro.vn",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph",
    "mil.ph",
    # --- Egypt / Saudi Arabia / Nigeria / Kenya / Pakistan ---
    "com.eg", "edu.eg", "gov.eg", "mil.eg", "name.eg", "net.eg",
    "org.eg", "sci.eg",
    "com.sa", "net.sa", "org.sa", "gov.sa", "med.sa", "pub.sa",
    "edu.sa", "sch.sa",
    "com.ng", "edu.ng", "gov.ng", "mil.ng", "name.ng", "net.ng",
    "org.ng", "sch.ng",
    "ac.ke", "co.ke", "go.ke", "info.ke", "me.ke", "mobi.ke",
    "ne.ke", "or.ke", "sc.ke",
    "com.pk", "net.pk", "edu.pk", "org.pk", "gov.pk", "biz.pk",
    "web.pk", "fam.pk",
    # --- wildcard + exception rules (the PSL's canonical forms) ---
    "*.ck", "!www.ck",
    "*.bd",
    "*.np",
    # --- private-section platforms (subdomains = distinct owners) ---
    "github.io", "githubusercontent.com", "gitlab.io",
    "blogspot.com", "appspot.com", "herokuapp.com", "netlify.app",
    "vercel.app", "pages.dev", "workers.dev", "web.app",
    "firebaseapp.com", "azurewebsites.net", "cloudapp.net",
    "cloudfront.net", "readthedocs.io", "wordpress.com",
    "s3.amazonaws.com", "*.compute.amazonaws.com",
)

#: Host shape both engines agree to score: dot-separated non-empty
#: ASCII labels (IDN hosts must arrive punycoded; trailing dots /
#: empty labels return NULL rather than diverging).
_HOST_SHAPE_RE = r"^[A-Za-z0-9_-]+(\.[A-Za-z0-9_-]+)*$"


def load_psl(path: str) -> tuple[str, ...]:
    """Parse a full published Public Suffix List file into the rule
    tuple ``registrable_domain`` consumes: strips ``//`` comments and
    blank lines, keeps wildcard (``*.``) and exception (``!``) syntax
    verbatim. The production swap-in for :data:`PSL_SNAPSHOT`."""
    rules: list[str] = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("//"):
                continue
            rules.append(line.lower())
    return tuple(rules)


def _psl_compile(rules):
    """Parse rules into the ordered branch list BOTH engine backends
    compile from (shared structure = guaranteed Spark/DuckDB parity).

    Returns ``(branches, max_k)`` where each branch is one of
    ``("exc", k, values)`` (exception rules of k labels — registrable
    domain is the matched suffix itself), ``("wild", k, bases)``
    (wildcard rules: full rule spans k labels, base = rule minus the
    ``*`` = k-1 labels) or ``("exact", k, values)``; ordered by PSL
    precedence: all exceptions first, then descending label count
    (longest rule wins), exact before wildcard within a tier.
    """
    exc: dict[int, set] = {}
    wild: dict[int, set] = {}
    exact: dict[int, set] = {}
    for r in rules:
        r = r.lower()
        if r.startswith("!"):
            d = r[1:]
            exc.setdefault(d.count(".") + 1, set()).add(d)
        elif r.startswith("*."):
            base = r[2:]
            wild.setdefault(base.count(".") + 2, set()).add(base)
        else:
            exact.setdefault(r.count(".") + 1, set()).add(r)
    branches = []
    for k in sorted(exc, reverse=True):
        branches.append(("exc", k, tuple(sorted(exc[k]))))
    ks = sorted(set(exact) | set(wild), reverse=True)
    for k in ks:
        if k in exact:
            branches.append(("exact", k, tuple(sorted(exact[k]))))
        if k in wild:
            branches.append(("wild", k, tuple(sorted(wild[k]))))
    max_k = max([k for _, k, _ in branches], default=1) + 1
    return branches, max_k


def registrable_domain(host: Column, rules=None) -> Column:
    """PSL registrable domain ("eTLD+1") of a lowercased host, as one
    chained-CASE Column over constant-``k`` trailing-label slices —
    zero shuffle, zero join, zero UDF; the rule table is compile-time
    constant folded into the plan (strictly cheaper at 100 TB than the
    broadcast-join formulation, and Catalyst turns the large IN lists
    into hash-set ``InSet`` lookups). NULL when the host IS a public
    suffix, is a bare label, or fails the host shape gate.

    PSL semantics (publicsuffix.org algorithm): exception rules win
    outright; otherwise the matching rule with the most labels is the
    public suffix; unmatched hosts use the default rule ``*``;
    registrable = public suffix + one preceding label.
    """
    branches, max_k = _psl_compile(PSL_SNAPSHOT if rules is None else rules)
    nl = F.size(F.split(host, r"\."))

    def sfx(k):
        return F.substring_index(host, ".", -k)

    out = None
    for kind, k, values in branches:
        if kind == "exc":
            cond = sfx(k).isin(*values)
            val = sfx(k)
        elif kind == "wild":
            cond = (nl >= k) & sfx(k - 1).isin(*values)
            val = F.when(nl > k, sfx(k + 1)).otherwise(
                F.lit(None).cast("string")
            )
        else:
            cond = sfx(k).isin(*values)
            val = F.when(nl > k, sfx(k + 1)).otherwise(
                F.lit(None).cast("string")
            )
        out = F.when(cond, val) if out is None else out.when(cond, val)
    default = F.when(nl > 1, sfx(2)).otherwise(F.lit(None).cast("string"))
    out = default if out is None else out.otherwise(default)
    return F.when(host.rlike(_HOST_SHAPE_RE), out).otherwise(
        F.lit(None).cast("string")
    )


def registrable_domain_sql(host_sql: str, rules=None) -> str:
    """The DuckDB twin of :func:`registrable_domain`, generated from
    the SAME compiled branch list (the ``PII_PATTERNS`` discipline:
    one constant, two engine renderings). ``host_sql`` must be a
    lowercased host expression; the result is a scalar SQL expression.

    Trailing-``k``-label slices render as anchored ``regexp_extract``
    (no ``substring_index`` in DuckDB); a failed extract yields ``''``
    which matches no rule — the same containment the Spark side gets
    from ``substring_index``'s whole-host clamp.
    """
    branches, max_k = _psl_compile(PSL_SNAPSHOT if rules is None else rules)
    h = f"lower({host_sql})"
    nl = f"len(string_split({h}, '.'))"

    def sfx(k):
        if k == 1:
            return f"regexp_extract({h}, '([^.]+)$', 1)"
        return (
            f"regexp_extract({h}, "
            f"'(?:^|\\.)((?:[^.]+\\.){{{k - 1}}}[^.]+)$', 1)"
        )

    def inlist(values):
        return "(" + ", ".join("'" + v + "'" for v in values) + ")"

    parts = ["CASE"]
    for kind, k, values in branches:
        if kind == "exc":
            parts.append(
                f"WHEN {sfx(k)} IN {inlist(values)} THEN {sfx(k)}"
            )
        elif kind == "wild":
            parts.append(
                f"WHEN {nl} >= {k} AND {sfx(k - 1)} IN {inlist(values)} "
                f"THEN CASE WHEN {nl} > {k} THEN {sfx(k + 1)} END"
            )
        else:
            parts.append(
                f"WHEN {sfx(k)} IN {inlist(values)} "
                f"THEN CASE WHEN {nl} > {k} THEN {sfx(k + 1)} END"
            )
    parts.append(f"ELSE CASE WHEN {nl} > 1 THEN {sfx(2)} END END")
    case = "\n      ".join(parts)
    return (
        f"CASE WHEN regexp_matches({h}, '{_HOST_SHAPE_RE}') "
        f"THEN {case} END"
    )


def url_domain_psl(url: Column, rules=None) -> Column:
    """Registrable domain of the URL's host via the PSL longest-match
    (the production domain tier; ``url_domain`` is the last-two-labels
    heuristic it replaces). NULL for malformed URLs and public-suffix
    hosts."""
    scheme, host, _, _, _, bad_port = _parts(url)
    dom = registrable_domain(host, rules=rules)
    return F.when(
        (scheme == "") | bad_port, F.lit(None).cast("string")
    ).otherwise(dom)


def url_table(
    df: DataFrame, id_col: str, url_col: str, psl: bool = True
) -> DataFrame:
    """Per-row canonicalization frame: ``(id, url_norm, domain)`` —
    the URL-dedup key and the domain-mixing stratum in one projection.
    Feed ``url_norm`` to ``dedup.exact_dedup`` (URL-level dedup) and
    ``domain`` to ``sampling.mix_temperature`` (domain mixing).
    ``domain`` is the PSL registrable domain by default (``psl=False``
    falls back to the last-two-labels heuristic)."""
    u = F.col(url_col)
    dom = url_domain_psl(u) if psl else url_domain(u)
    return df.select(
        F.col(id_col),
        url_normalize(u).alias("url_norm"),
        dom.alias("domain"),
    )
