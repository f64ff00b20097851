"""URL canonicalization + registrable domain: targeted semantics,
cross-engine battery vs DuckDB (the q218 pattern — same chain, second
regex engine), frontier-dedup use-case."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators.url import (
    PUBLIC_SUFFIXES_2,
    registrable_domain,
    registrable_domain_sql,
    url_host,
    url_host_sql,
    url_normalize,
    url_normalize_sql,
    url_path_canonical,
    url_query_canonical,
    url_scheme,
)

MESSY = [
    "HTTP://Example.COM:80/a/../b?utm_source=x&z=2&a=1#frag",
    "https://user:pw@WWW.Site.co.uk.:443//x/./y/../z?b=2&a=1&utm_campaign=c",
    "http://example.com",
    "http://example.com./path/",
    "ftp://Files.Example.org:21/pub//data",
    "https://sub.deep.example.com:8443/p?gclid=g&q=term",
    "http://192.168.0.1:8080/admin?fbclid=f",
    "relative/path/only",
    "  http://spaces.example.com/a  ",
    "http://example.com/a/b/c/../../d",
    "http://example.com/../top",
    "http://example.com/?",
    "http://h.example.com/x?msclkid=1&utm_a=2",
    "https://example.com.au/shop?x=1&x=0",
    "http://example.com:8080/a/./././b",
    "https://a.co.jp:443/x?z&y=",
    "mailto:someone@example.com",
    "//protocol-relative.example.com/x",
    "http://[::1]:8080/x?b=2&a=1",
    "https://[2001:DB8::7]/p#f",
    "http://[::ffff:192.0.2.1]:80/y",
]


def _one(spark, col_expr, url: str):
    return (
        spark.range(1)
        .select(col_expr(F.lit(url)).alias("v"))
        .collect()[0]["v"]
    )


def test_normalize_semantics(spark):
    cases = {
        # case, default port, fragment, tracking params, param sort
        MESSY[0]: "http://example.com/b?a=1&z=2",
        # userinfo, trailing root dot, //, dot segments
        MESSY[1]: "https://www.site.co.uk/x/z?a=1&b=2",
        # bare host → '/'
        "http://example.com": "http://example.com/",
        # NON-default port survives
        "https://sub.deep.example.com:8443/p?gclid=g&q=term": (
            "https://sub.deep.example.com:8443/p?q=term"
        ),
        # parent segments, bounded resolution
        "http://example.com/a/b/c/../../d": "http://example.com/a/d",
        # leading parent clamps at root
        "http://example.com/../top": "http://example.com/top",
        # '?' with empty query drops
        "http://example.com/?": "http://example.com/",
        # valueless / empty-value params sort bytewise and survive
        "https://a.co.jp:443/x?z&y=": "https://a.co.jp/x?y=&z",
        # not absolute → NULL (mailto has no ://-authority)
        "relative/path/only": None,
        "mailto:someone@example.com": None,
        "//protocol-relative.example.com/x": None,
    }
    for url, want in cases.items():
        assert _one(spark, url_normalize, url) == want, url


def test_component_accessors(spark):
    u = "HTTPS://User@Host.Example.ORG.:1234/A/b/?q=1#f"
    assert _one(spark, url_scheme, u) == "https"
    assert _one(spark, url_host, u) == "host.example.org"
    assert _one(spark, url_path_canonical, u) == "/A/b/"  # path case kept
    assert _one(spark, url_query_canonical, u) == "q=1"


def test_registrable_domain_cases(spark):
    cases = {
        "www.example.com": "example.com",
        "a.b.c.example.co.uk": "example.co.uk",
        "example.co.uk": "example.co.uk",
        "co.uk": "co.uk",  # bare suffix: nothing to register
        "deep.sub.site.com.au": "site.com.au",
        "localhost": "localhost",
        "192.168.0.1": "192.168.0.1",  # IP passes through
        "x.io": "x.io",
    }
    for host, want in cases.items():
        got = _one(spark, registrable_domain, host)
        assert got == want, host


def test_cross_engine_battery(spark):
    """The full messy battery through BOTH engines — Spark (Java regex)
    and DuckDB (RE2) must produce identical canonical forms, hosts, and
    registrable domains."""
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(MESSY)], "i long, url string"
    )
    got = {
        r["i"]: (r["c"], r["h"], r["d"])
        for r in df.select(
            "i",
            url_normalize(F.col("url")).alias("c"),
            url_host(F.col("url")).alias("h"),
            registrable_domain(url_host(F.col("url"))).alias("d"),
        ).collect()
    }
    vals = ", ".join(f"({i}, '{u}')" for i, u in enumerate(MESSY))
    sql = (
        f"SELECT i, {url_normalize_sql('url')} AS c, "
        f"{url_host_sql('url')} AS h, "
        f"{registrable_domain_sql(url_host_sql('url'))} AS d "
        f"FROM (VALUES {vals}) AS t(i, url)"
    )
    want = {int(r[0]): (r[1], r[2], r[3]) for r in duckdb.sql(sql).fetchall()}
    assert got == want


def test_ipv6_bracket_hosts(spark):
    """RFC 3986 §3.2.2 IP-literals: brackets survive, the port split
    doesn't mangle the colons, default ports still drop, and the
    registrable-domain heuristic passes literals through unchanged.
    An unterminated bracket is rejected (NULL), not garbled."""
    cases = {
        "http://[::1]:8080/x?b=2&a=1": "http://[::1]:8080/x?a=1&b=2",
        "https://[2001:DB8::7]/p#f": "https://[2001:db8::7]/p",
        "http://[::ffff:192.0.2.1]:80/y": "http://[::ffff:192.0.2.1]/y",
        "http://[::1/broken": None,
    }
    for url, want in cases.items():
        assert _one(spark, url_normalize, url) == want, url
    assert _one(spark, url_host, "http://[::1]:8080/x") == "[::1]"
    assert (
        _one(spark, registrable_domain, "[::ffff:192.0.2.1]")
        == "[::ffff:192.0.2.1]"
    )


def test_frontier_dedup_use_case(spark):
    """The reason this operator exists: spelling variants of the same
    page collapse onto one frontier entry."""
    variants = [
        "http://example.com/b",
        "HTTP://EXAMPLE.COM:80/b#top",
        "http://example.com/a/../b?utm_source=feed",
        "http://example.com//b",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    canon = df.select(url_normalize(F.col("url")).alias("c"))
    assert canon.distinct().count() == 1
    assert canon.first()["c"] == "http://example.com/b"


def test_suffix_set_is_lowercase_two_label():
    for s in PUBLIC_SUFFIXES_2:
        assert s == s.lower() and s.count(".") == 1


def test_documented_limits(spark):
    # percent-escapes pass through UN-normalized (documented)
    assert (
        _one(spark, url_normalize, "http://example.com/a%2Fb")
        == "http://example.com/a%2Fb"
    )
    # dot-segment resolution is bounded: pathological depth survives
    deep = "http://example.com/" + "a/" * 40 + "../" * 40 + "end"
    out = _one(spark, url_normalize, deep)
    assert out is not None and out.endswith("end")


def test_cross_engine_generative_fuzz(spark):
    """300 grammar-generated messy URLs through BOTH engines — any
    Java-regex/RE2 dialect divergence in the chain (or either mirror
    drifting from its Column twin) fails here before a fixed-battery
    case exists for it.  Deterministic seed: failures reproduce."""
    import random as _random

    rng = _random.Random(0xC0FFEE)
    schemes = ["http", "HTTP", "https", "ftp", "Http"]
    hosts = [
        "Example.COM", "example.com.", "WWW.Site.co.uk", "a.b.c.d.example",
        "192.168.0.1", "[::1]", "[2001:DB8::7]", "localhost", "x.io.",
    ]
    ports = ["", ":80", ":443", ":21", ":8080", ":0443"]
    segs = ["a", "b", ".", "..", "a.b", "x%2Fy", "", "name.html", "~u"]
    params = [
        "a=1", "z=2", "utm_source=x", "utm_campaign", "gclid=g", "q=a+b",
        "b=", "fbclid=f", "empty", "k=v=w", "msclkid=m", "a=2",
    ]

    def gen() -> str:
        path = "/".join(rng.choice(segs) for _ in range(rng.randint(0, 5)))
        q = "&".join(
            rng.choice(params) for _ in range(rng.randint(0, 4))
        )
        frag = rng.choice(["", "#f", "#a/b?c=1"])
        user = rng.choice(["", "user@", "u:p@"])
        lead = rng.choice(["", " ", "  "])
        url = (
            f"{lead}{rng.choice(schemes)}://{user}{rng.choice(hosts)}"
            f"{rng.choice(ports)}/{path}"
        )
        if q:
            url += f"?{q}"
        return url + frag + lead

    urls = [gen() for _ in range(300)]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, url string"
    )
    got = {
        r["i"]: (r["c"], r["h"], r["d"])
        for r in df.select(
            "i",
            url_normalize(F.col("url")).alias("c"),
            url_host(F.col("url")).alias("h"),
            registrable_domain(url_host(F.col("url"))).alias("d"),
        ).collect()
    }
    vals = ", ".join(
        "(%d, '%s')" % (i, u.replace("'", "''")) for i, u in enumerate(urls)
    )
    sql = (
        f"SELECT i, {url_normalize_sql('url')} AS c, "
        f"{url_host_sql('url')} AS h, "
        f"{registrable_domain_sql(url_host_sql('url'))} AS d "
        f"FROM (VALUES {vals}) AS t(i, url)"
    )
    want = {int(r[0]): (r[1], r[2], r[3]) for r in duckdb.sql(sql).fetchall()}
    bad = {i: (got[i], want[i], urls[i]) for i in got if got[i] != want[i]}
    assert not bad, dict(list(bad.items())[:5])
