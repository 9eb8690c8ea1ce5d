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


def registered_domain(host: str | Column) -> Column:
    """Registrable-domain heuristic: last two dot-labels of the host
    (example.com from www.example.com). A production build swaps in the
    public-suffix list via a broadcast map; the column shape and the
    grouping it feeds are identical."""
    parts = F.split(_c(host), r"\.")
    return F.when(
        F.size(parts) <= 2, _c(host)
    ).otherwise(F.array_join(F.slice(parts, -2, 2), "."))
