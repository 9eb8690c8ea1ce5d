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


# ---------------------------------------------------------------------------
# Public-suffix list: FULL algorithm (exact + wildcard + exception rules,
# longest-match, publicsuffix.org spec), pure codegen
# ---------------------------------------------------------------------------


class PslRules:
    """Parsed public-suffix rules, grouped the way the matching
    expression consumes them:

    - ``exact_by_k``:  {label_count: frozenset of rules} — rule
      ``co.uk`` (k=2) makes a host ending in it register at k+1 labels;
    - ``wild_by_k``:   {tail_label_count: frozenset of tails} — rule
      ``*.ck`` stores tail ``ck`` (k=1); a host ending in the tail with
      ≥k+1 labels has a (k+1)-label public suffix;
    - ``exc_by_k``:    {label_count: frozenset} — exception rule
      ``!www.ck`` stores ``www.ck`` (k=2); a matching host's public
      suffix is the rule minus its leftmost label (k−1 labels), and
      exceptions beat every other rule (PSL spec §algorithm step 2).

    The default rule ``*`` (unlisted TLD ⇒ 1-label public suffix) is
    implicit. All sets become constant codegen ``InSet`` lookups — the
    full ~9k-rule PSL fits this shape with no broadcast join: a hash
    set probe per host, zero shuffle, zero Python at any scale.
    """

    def __init__(self, rules: "list[str]"):
        exact: dict[int, set] = {}
        wild: dict[int, set] = {}
        exc: dict[int, set] = {}
        for r in rules:
            r = r.strip().lower()
            if r.startswith("!"):
                body = r[1:]
                exc.setdefault(body.count(".") + 1, set()).add(body)
            elif r.startswith("*."):
                tail = r[2:]
                wild.setdefault(tail.count(".") + 1, set()).add(tail)
            elif r and r != "*":
                exact.setdefault(r.count(".") + 1, set()).add(r)
        self.exact_by_k = {k: frozenset(v) for k, v in exact.items()}
        self.wild_by_k = {k: frozenset(v) for k, v in wild.items()}
        self.exc_by_k = {k: frozenset(v) for k, v in exc.items()}
        self.max_ps_labels = max(
            [k for k in self.exact_by_k]
            + [k + 1 for k in self.wild_by_k]
            + [k - 1 for k in self.exc_by_k]
            + [1]
        )


def parse_psl(text: str) -> PslRules:
    """Parse publicsuffix.org list format (``//`` comments, blank
    lines, one rule per line; everything after whitespace ignored per
    spec). Use to load the complete production PSL from a file:
    ``registered_domain(host, rules=parse_psl(open(p).read()))``."""
    rules = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        rules.append(line.split()[0])
    return PslRules(rules)


#: Two-label PUBLIC suffixes (publicsuffix.org data, the high-traffic
#: subset): a host ending in one of these registers at the THIRD label
#: (bbc.co.uk, not co.uk). Part of the shipped snapshot below.
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


#: Deeper rules of the shipped snapshot: wildcard rules (``*.ck`` — any
#: label under .ck is itself a public suffix), their exceptions
#: (``!www.ck`` — www.ck is registrable despite the wildcard), the
#: Japanese geographic city wildcards + city exceptions, sample 2/3-label
#: jp prefecture suffixes, and a deep private-section wildcard
#: (``*.compute.amazonaws.com``) exercising 4-label public suffixes.
#: A SNAPSHOT SUBSET of publicsuffix.org — the matching ALGORITHM is
#: complete (exact/wildcard/exception, longest-match, any depth); swap
#: in the full list via ``parse_psl`` for production.
_PSL_DEEP_RULES = (
    # wildcard TLDs (whole-TLD delegation): <anything>.<tld> is a suffix
    "*.bd", "*.ck", "*.er", "*.fk", "*.jm", "*.kh", "*.mm", "*.np", "*.pg",
    "!www.ck",  # the registry's own site is the lone exception under .ck
    # jp geographic: prefecture suffixes (2- and 3-label exact rules)
    "aichi.jp", "hokkaido.jp", "kyoto.jp", "okinawa.jp", "osaka.jp",
    "pref.aichi.jp", "pref.hokkaido.jp", "pref.kyoto.jp", "pref.okinawa.jp",
    "pref.osaka.jp", "aisai.aichi.jp", "tahara.aichi.jp",
    # jp designated-city wildcards with the city-government exception
    "*.kawasaki.jp", "*.kitakyushu.jp", "*.kobe.jp", "*.nagoya.jp",
    "*.sapporo.jp", "*.sendai.jp", "*.yokohama.jp",
    "!city.kawasaki.jp", "!city.kitakyushu.jp", "!city.kobe.jp",
    "!city.nagoya.jp", "!city.sapporo.jp", "!city.sendai.jp",
    "!city.yokohama.jp",
    # private-section depth sample: EC2 hostnames register at 5 labels
    "*.compute.amazonaws.com", "*.compute-1.amazonaws.com",
    "s3.amazonaws.com", "github.io", "gitlab.io", "blogspot.com",
)

_PSL_SNAPSHOT = PslRules(sorted(_PSL_TWO_LABEL) + list(_PSL_DEEP_RULES))


def public_suffix_len(host: str | Column, rules: PslRules | None = None) -> Column:
    """Label count of the host's public suffix under ``rules`` (default:
    the shipped snapshot). Implements the publicsuffix.org algorithm as
    a constant-folded when-chain over last-k-label InSet probes:
    exceptions first (they beat all other rules), then exact+wildcard
    matches longest-first, default ``*`` (=1) last. Pure whole-stage
    codegen — no Python, no join, no shuffle; the full 9k-rule list is
    just bigger hash sets in the same expression."""
    r = rules or _PSL_SNAPSHOT
    h = _c(host)
    parts = F.split(h, r"\.")
    n = F.size(parts)

    def lastk(k: int) -> Column:
        return F.array_join(F.slice(parts, -k, k), ".")

    chain = None

    def add(cond: Column, val: int) -> None:
        nonlocal chain
        chain = F.when(cond, F.lit(val)) if chain is None else chain.when(cond, F.lit(val))

    # exceptions beat everything; among themselves longest-first
    for k in sorted(r.exc_by_k, reverse=True):
        add((n >= k) & lastk(k).isin(*sorted(r.exc_by_k[k])), k - 1)
    # exact/wildcard, longest candidate public suffix first
    top = max([k for k in r.exact_by_k] + [k + 1 for k in r.wild_by_k] + [1])
    for k in range(top, 1, -1):
        conds = []
        if k in r.exact_by_k:
            conds.append((n >= k) & lastk(k).isin(*sorted(r.exact_by_k[k])))
        if (k - 1) in r.wild_by_k:
            conds.append((n >= k) & lastk(k - 1).isin(*sorted(r.wild_by_k[k - 1])))
        if conds:
            c = conds[0]
            for extra in conds[1:]:
                c = c | extra
            add(c, k)
    return chain.otherwise(F.lit(1)) if chain is not None else F.lit(1)


def registered_domain(host: str | Column, rules: PslRules | None = None) -> Column:
    """Registrable domain of a host per the public-suffix list: one
    label below the public suffix — ``example.com`` from
    ``www.example.com``, ``bbc.co.uk`` from ``news.bbc.co.uk``,
    ``foo.bar.ck`` from ``a.foo.bar.ck`` (wildcard ``*.ck``),
    ``www.ck`` from ``x.www.ck`` (exception ``!www.ck``),
    ``x.pref.aichi.jp`` from ``www.x.pref.aichi.jp`` (3-label suffix).
    Hosts at or below a public suffix pass through unchanged. Default
    rules are the shipped snapshot (``_PSL_SNAPSHOT``); pass the full
    production list via ``parse_psl``. Pure codegen column
    expressions: split + constant InSet probes, zero Python, zero
    shuffle."""
    h = _c(host)
    parts = F.split(h, r"\.")
    n = F.size(parts)
    ps = public_suffix_len(h, rules)
    reg_len = ps + F.lit(1)
    return F.when(n <= ps, h).otherwise(
        F.array_join(F.slice(parts, -reg_len, reg_len), ".")
    )
