"""URL canonicalization + registrable-domain extraction — the crawl
frontier's key normalizer, pure Catalyst.

Between link extraction (``text.extract_links``) and per-domain
dedup/politeness caps sits URL canonicalization: without it the
frontier treats ``HTTP://Example.COM:80/a/../b?utm_source=x`` and
``http://example.com/b`` as different pages and recrawls, and
per-domain accounting fragments across host spellings.  The operators
here are COLUMN EXPRESSIONS (zero UDF — the whole chain inlines into
whole-stage codegen next to the scan), with ``*_sql`` mirrors in the
RE2 ∩ Java-regex common dialect so a DuckDB oracle can run the
byte-identical chain through a different regex engine (the q218
cross-engine pattern).

Canonicalization steps (RFC 3986 §6 syntax-based normalization, the
subset expressible without per-byte rewriting, applied in order):

1. trim; drop the fragment,
2. lowercase the scheme; non-absolute inputs (no ``scheme://``) → NULL,
3. drop userinfo; lowercase the host; strip one trailing root dot,
4. strip the scheme's default port (http 80 / https 443 / ftp 21),
5. resolve ``/./`` and ``/segment/../`` dot-segments — BOUNDED at
   ``_DOT_PASSES`` replacement passes (nesting deeper than that
   survives; documented, deterministic on both engines),
6. collapse duplicate slashes; empty path → ``/``,
7. drop tracking query params (``utm_*``/``gclid``/``fbclid``/
   ``msclkid``), sort the rest bytewise, rejoin.

NOT done (documented): percent-escape normalization (needs per-escape
byte mapping, not regex-expressible), IDN/punycode (needs tables).

``registrable_domain`` is the eTLD+1 heuristic: a built-in set of
COMMON two-label public suffixes (``co.uk``-style); the full Mozilla
PSL is external data this container doesn't ship, so this is honestly
a subset — the set is a keyword table, swap-able at call time.

100 TB notes: map-only, no shuffle, no Python boundary; the natural
downstream is ``groupBy(registrable_domain)`` for politeness caps and
``dropDuplicates([url_canon])`` for frontier dedup, both of which then
shuffle on ALREADY-normalized keys (canonicalize-then-shuffle, never
the reverse — un-normalized keys split the same page across
partitions).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# patterns shared verbatim by the Spark (Java regex) and DuckDB (RE2)
# sides: explicit classes only — no \s/\d/\w (dialect-divergent), no
# lookaround, no backrefs.
_P_FRAG = "#.*$"
_P_SCHEME = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_P_USERINFO = "^[^@/?]*@"
_P_TRAILING_DOT = "\\.$"
_P_DOT_SEG = "/\\.(/|$)"
_P_PARENT_SEG = "/[^/]+/\\.\\.(/|$)"
_P_LEAD_PARENT = "^/\\.\\.(/|$)"
_P_MULTISLASH = "//+"
_P_TRACKING = "^(utm_[a-zA-Z0-9_]*|gclid|fbclid|msclkid)="
_P_BRACKET_HOST = "^(\\[[^\\]]*\\])"  # RFC 3986 §3.2.2 IP-literal

_DOT_PASSES = 4  # bounded dot-segment resolution depth

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}

# common two-label public suffixes (heuristic subset of the PSL)
PUBLIC_SUFFIXES_2 = (
    "ac.uk", "co.uk", "gov.uk", "org.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.in", "net.in", "org.in", "gen.in",
    "com.mx", "org.mx", "gob.mx",
    "co.za", "org.za", "web.za",
    "com.tr", "org.tr", "gov.tr",
    "co.kr", "or.kr", "go.kr",
    "com.ar", "com.sg", "com.hk", "com.tw", "com.my", "co.id",
    "co.nz", "org.nz", "net.nz",
    "com.pl", "com.ru", "org.ru", "com.ua",
)


def _strip_scheme(u: Column) -> Column:
    return F.regexp_replace(u, _P_SCHEME, "")


def url_scheme(url: Column) -> Column:
    """Lowercased scheme of an absolute URL; '' when not absolute."""
    return F.lower(F.regexp_extract(F.trim(url), _P_SCHEME, 1))


def url_host(url: Column) -> Column:
    """Canonical host: userinfo dropped, lowercased, trailing root dot
    stripped, port removed.  Bracketed IP-literals (RFC 3986 §3.2.2,
    ``[::1]``) keep their brackets — the colon split only applies to
    reg-name/IPv4 hosts; an unterminated ``[`` yields '' (→ NULL from
    :func:`url_normalize`), never a mangled host."""
    u = F.regexp_replace(F.trim(url), _P_FRAG, "")
    auth = F.regexp_extract(_strip_scheme(u), "^([^/?]*)", 1)
    host = F.lower(F.regexp_replace(auth, _P_USERINFO, ""))
    host = F.when(
        host.startswith("["), F.regexp_extract(host, _P_BRACKET_HOST, 1)
    ).otherwise(F.regexp_extract(host, "^([^:]*)", 1))
    return F.regexp_replace(host, _P_TRAILING_DOT, "")


def _url_port(url: Column) -> Column:
    u = F.regexp_replace(F.trim(url), _P_FRAG, "")
    auth = F.regexp_extract(_strip_scheme(u), "^([^/?]*)", 1)
    return F.regexp_extract(F.regexp_replace(auth, _P_USERINFO, ""), ":([0-9]+)$", 1)


def url_path_canonical(url: Column) -> Column:
    """Path with bounded dot-segment resolution, duplicate slashes
    collapsed, '' → '/'."""
    u = F.regexp_replace(F.trim(url), _P_FRAG, "")
    pathq = F.regexp_replace(_strip_scheme(u), "^[^/?]*", "")
    p = F.regexp_extract(pathq, "^([^?]*)", 1)
    p = F.regexp_replace(p, _P_MULTISLASH, "/")
    for _ in range(_DOT_PASSES):
        p = F.regexp_replace(p, _P_DOT_SEG, "/")
        p = F.regexp_replace(p, _P_PARENT_SEG, "/")
        p = F.regexp_replace(p, _P_LEAD_PARENT, "/")
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_query_canonical(url: Column) -> Column:
    """Query with tracking params dropped and the rest sorted bytewise;
    '' when nothing survives."""
    u = F.regexp_replace(F.trim(url), _P_FRAG, "")
    q = F.regexp_extract(u, "\\?(.*)$", 1)
    params = F.filter(
        F.split(q, "&"),
        lambda x: (x != "") & ~x.rlike(_P_TRACKING),
    )
    return F.array_join(F.array_sort(params), "&")


def url_normalize(url: Column) -> Column:
    """The full canonical URL (steps 1-7 above); NULL for non-absolute
    inputs."""
    scheme = url_scheme(url)
    host = url_host(url)
    port = _url_port(url)
    default = F.coalesce(
        *[
            F.when(scheme == s, F.lit(p))
            for s, p in sorted(_DEFAULT_PORTS.items())
        ],
        F.lit(""),
    )
    port_part = F.when(
        (port == "") | (port == default), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    q = url_query_canonical(url)
    q_part = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    out = F.concat(
        scheme, F.lit("://"), host, port_part, url_path_canonical(url), q_part
    )
    return F.when((scheme == "") | (host == ""), F.lit(None)).otherwise(out)


def registrable_domain(host: Column, suffixes: tuple[str, ...] = PUBLIC_SUFFIXES_2) -> Column:
    """eTLD+1 heuristic: last THREE labels when the last two form a
    known public suffix, else last two; IP literals and single-label
    hosts pass through unchanged."""
    labels = F.split(host, "\\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    is_ip = host.rlike("^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$") | host.startswith(
        "["
    )
    return (
        F.when(is_ip | (n <= 1), host)
        .when((n >= 3) & last2.isin(*suffixes), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


# ----------------------------------------------------------- SQL mirrors
#
# DuckDB mirrors of the exact chains above, for cross-engine oracles.
# DuckDB's regexp_replace is NON-global by default — every call passes
# 'g' to match Spark's always-global semantics.


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def url_scheme_sql(expr: str) -> str:
    return (
        f"lower(coalesce(regexp_extract(trim({expr}), "
        f"{_sql_quote(_P_SCHEME)}, 1), ''))"
    )


def _strip_scheme_sql(u: str) -> str:
    return f"regexp_replace({u}, {_sql_quote(_P_SCHEME)}, '', 'g')"


def _nofrag_sql(expr: str) -> str:
    return f"regexp_replace(trim({expr}), {_sql_quote(_P_FRAG)}, '', 'g')"


def url_host_sql(expr: str) -> str:
    auth = (
        f"coalesce(regexp_extract({_strip_scheme_sql(_nofrag_sql(expr))}, "
        f"'^([^/?]*)', 1), '')"
    )
    host = (
        f"lower(regexp_replace({auth}, {_sql_quote(_P_USERINFO)}, '', 'g'))"
    )
    host = (
        f"(CASE WHEN {host} LIKE '[%' THEN "
        f"coalesce(regexp_extract({host}, {_sql_quote(_P_BRACKET_HOST)}, 1), '') "
        f"ELSE coalesce(regexp_extract({host}, '^([^:]*)', 1), '') END)"
    )
    return f"regexp_replace({host}, {_sql_quote(_P_TRAILING_DOT)}, '', 'g')"


def _url_port_sql(expr: str) -> str:
    auth = (
        f"coalesce(regexp_extract({_strip_scheme_sql(_nofrag_sql(expr))}, "
        f"'^([^/?]*)', 1), '')"
    )
    noui = f"regexp_replace({auth}, {_sql_quote(_P_USERINFO)}, '', 'g')"
    return f"coalesce(regexp_extract({noui}, ':([0-9]+)$', 1), '')"


def url_path_canonical_sql(expr: str) -> str:
    pathq = (
        f"regexp_replace({_strip_scheme_sql(_nofrag_sql(expr))}, "
        f"'^[^/?]*', '', 'g')"
    )
    p = f"coalesce(regexp_extract({pathq}, '^([^?]*)', 1), '')"
    p = f"regexp_replace({p}, {_sql_quote(_P_MULTISLASH)}, '/', 'g')"
    for _ in range(_DOT_PASSES):
        p = f"regexp_replace({p}, {_sql_quote(_P_DOT_SEG)}, '/', 'g')"
        p = f"regexp_replace({p}, {_sql_quote(_P_PARENT_SEG)}, '/', 'g')"
        p = f"regexp_replace({p}, {_sql_quote(_P_LEAD_PARENT)}, '/', 'g')"
    return f"(CASE WHEN {p} = '' THEN '/' ELSE {p} END)"


def url_query_canonical_sql(expr: str) -> str:
    q = (
        f"coalesce(regexp_extract({_nofrag_sql(expr)}, '\\?(.*)$', 1), '')"
    )
    params = (
        f"list_filter(string_split({q}, '&'), x -> x <> '' AND NOT "
        f"regexp_matches(x, {_sql_quote(_P_TRACKING)}))"
    )
    # DuckDB: array_to_string([]) is NULL (Spark's array_join gives '')
    return f"coalesce(array_to_string(list_sort({params}), '&'), '')"


def url_normalize_sql(expr: str) -> str:
    scheme = url_scheme_sql(expr)
    host = url_host_sql(expr)
    port = _url_port_sql(expr)
    default = (
        f"(CASE {scheme} "
        + " ".join(
            f"WHEN '{s}' THEN '{p}'" for s, p in sorted(_DEFAULT_PORTS.items())
        )
        + " ELSE '' END)"
    )
    port_part = (
        f"(CASE WHEN {port} = '' OR {port} = {default} THEN '' "
        f"ELSE ':' || {port} END)"
    )
    q = url_query_canonical_sql(expr)
    q_part = f"(CASE WHEN {q} = '' THEN '' ELSE '?' || {q} END)"
    out = (
        f"({scheme} || '://' || {host} || {port_part} || "
        f"{url_path_canonical_sql(expr)} || {q_part})"
    )
    return (
        f"(CASE WHEN {url_scheme_sql(expr)} = '' OR {url_host_sql(expr)} = '' "
        f"THEN NULL ELSE {out} END)"
    )


def registrable_domain_sql(
    host_expr: str, suffixes: tuple[str, ...] = PUBLIC_SUFFIXES_2
) -> str:
    labels = f"string_split({host_expr}, '.')"
    n = f"len({labels})"
    last2 = f"({labels}[-2] || '.' || {labels}[-1])"
    last3 = f"({labels}[-3] || '.' || {last2})"
    suffix_list = ", ".join(_sql_quote(s) for s in suffixes)
    is_ip = (
        f"(regexp_matches({host_expr}, '^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$') "
        f"OR {host_expr} LIKE '[%')"
    )
    return (
        f"(CASE WHEN {is_ip} OR {n} <= 1 THEN {host_expr} "
        f"WHEN {n} >= 3 AND {last2} IN ({suffix_list}) THEN {last3} "
        f"WHEN {n} >= 2 THEN {last2} ELSE {host_expr} END)"
    )
