"""URL canonicalization — webtext-native key normalization.

Why it exists: the engine's CDC key is ``url`` (BASELINE.json input_hint),
and real crawl WALs carry the same page under syntactic variants
(scheme/host case, default ports, fragments, query-parameter order).
Canonicalizing BEFORE keying is what makes LWW collapse, dedup, and
MERGE actually converge per page — the reference normalizes its join
keys the same way (addresses are lowercased before use as keys:
src/tasks/extract/uniswap_v2_event.py:20, src/tasks/extract/pool.py:143-144).

Everything here is pure JVM column expressions (regexp_extract /
array_sort — whole-stage codegen, zero Python, zero shuffle), so at
100 TB it rides inside the scan projection for free.

Canonical form (RFC 3986 syntax-based normalization, the conservative
subset that never changes which resource is referenced):

- scheme and host lowercased
- default port stripped (``:80`` for http, ``:443`` for https)
- fragment removed
- empty path -> ``/``
- query parameters sorted bytewise (``?b=2&a=1`` -> ``?a=1&b=2``);
  empty query (bare ``?``) removed

Percent-decoding is deliberately NOT done: decoding reserved characters
can change semantics, and unreserved-only decoding needs a lookup table
per escape — not worth leaving codegen for a normalization whose gain
is marginal on real crawls.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"^[^#]*\?([^#]*)"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(url: str | Column) -> Column:
    """Lowercased scheme, '' if the value isn't an absolute URL."""
    return F.lower(F.regexp_extract(_c(url), _SCHEME_RE, 1))


def url_host(url: str | Column) -> Column:
    """Lowercased host with any default port stripped."""
    u = _c(url)
    hostport = F.lower(F.regexp_extract(u, _HOSTPORT_RE, 1))
    scheme = url_scheme(u)
    return (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )


def url_path(url: str | Column) -> Column:
    """Path component; empty path normalizes to '/'."""
    p = F.regexp_extract(_c(url), _PATH_RE, 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_query_sorted(url: str | Column) -> Column:
    """Query string with '&'-separated parameters sorted bytewise;
    '' when absent or empty. Sorting is array_sort over the split —
    bytewise on ASCII, matching DuckDB's binary varchar collation so
    the canonical form is engine-independent."""
    q = F.regexp_extract(_c(url), _QUERY_RE, 1)
    return F.when(
        q == "", F.lit("")
    ).otherwise(F.array_join(F.array_sort(F.split(q, "&")), "&"))


def canonical_url(url: str | Column) -> Column:
    """Full canonical form; non-absolute inputs pass through unchanged
    (canonicalization must be idempotent and total)."""
    u = _c(url)
    scheme = url_scheme(u)
    q = url_query_sorted(u)
    canon = F.concat(
        scheme,
        F.lit("://"),
        url_host(u),
        url_path(u),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
    return F.when(scheme == "", u).otherwise(canon)


#: Two-label PUBLIC suffixes (publicsuffix.org data, the high-traffic
#: subset): a host ending in one of these registers at the THIRD label
#: (bbc.co.uk, not co.uk). Shipped as a data literal so the expression
#: stays pure codegen (a constant IN set); the full ~9k-rule PSL with
#: wildcard/exception rules would swap in as a broadcast map join with
#: the same output column shape.
_PSL_TWO_LABEL = frozenset({
    # UK / IE
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk", "mod.uk",
    # Japan
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    # Australia / New Zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "geek.nz",
    # Americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.mx", "org.mx", "gob.mx", "edu.mx", "net.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co",
    "com.pe", "com.ve", "com.uy", "com.ec", "com.bo", "com.py",
    # Asia
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "res.in", "gov.in", "nic.in",
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "ac.kr",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "co.th", "in.th", "ac.th", "go.th", "or.th", "net.th",
    "com.ph", "net.ph", "org.ph", "com.vn", "net.vn", "org.vn",
    "com.pk", "net.pk", "org.pk", "com.bd", "com.np", "com.lk",
    # Europe / Africa / MEA
    "com.tr", "net.tr", "org.tr", "gen.tr", "web.tr", "edu.tr", "gov.tr",
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il",
    "co.za", "net.za", "org.za", "web.za", "gov.za", "ac.za",
    "com.eg", "com.sa", "com.ae", "com.qa", "com.kw", "com.ng",
    "co.ke", "or.ke", "ac.ke", "go.ke", "co.tz", "co.ug", "com.gh",
    "com.pl", "net.pl", "org.pl", "edu.pl", "waw.pl",
    "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru",
    "com.ua", "net.ua", "org.ua", "in.ua", "kiev.ua",
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    "com.pt", "com.ro", "com.es", "nom.es", "org.es", "gob.es",
})


def registered_domain(host: str | Column) -> Column:
    """Registrable domain of a host per the public-suffix list (the
    shipped two-label-suffix subset, see ``_PSL_TWO_LABEL``): one label
    below the public suffix — ``example.com`` from ``www.example.com``,
    ``bbc.co.uk`` from ``news.bbc.co.uk``. Hosts at or below a public
    suffix (or single-label hosts) pass through unchanged. Pure codegen
    column expressions: split + constant IN set, zero Python, zero
    shuffle."""
    h = _c(host)
    parts = F.split(h, r"\.")
    last2 = F.array_join(F.slice(parts, -2, 2), ".")
    last3 = F.array_join(F.slice(parts, -3, 3), ".")
    return (
        F.when(F.size(parts) <= 2, h)
        .when(last2.isin(*sorted(_PSL_TWO_LABEL)), last3)
        .otherwise(last2)
    )
