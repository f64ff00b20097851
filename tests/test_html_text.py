"""HTML → text extraction: cross-engine (Catalyst/Java vs DuckDB/RE2)
byte equality, entity ordering, structure preservation, link pulls."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators.text import (
    extract_links,
    extract_links_sql,
    html_to_text,
    html_to_text_sql,
)

NASTY = [
    # script containing < > && and a fake closing-ish tag in a string
    "<script>if (a < b && b > c) { s = '</div>'; }</script><p>keep</p>",
    # upper-case tags, multi-line style block
    "<STYLE>\np { color: red }\n</STYLE><H1>Title</H1>after",
    # comments spanning lines, nested-looking tags inside
    "<!-- a <p>not text</p>\n more -->visible",
    # double-escaped entity must decode exactly ONCE
    "x &amp;lt; y &amp; z &lt; w",
    # block structure → newlines, inline tags → spaces
    "<div>para one</div><div>para two</div><span>a</span><b>b</b>",
    # br/hr variants
    "line1<br>line2<br/>line3<BR >line4<hr>line5",
    # attributes with > inside quoted values are OUT of scope (dialect
    # regex can't pair quotes without backrefs) — plain attrs only
    '<a href="http://e.example/p?a=1&amp;b=2" class="x">link</a> tail',
    # whitespace storm
    "  <p>  spaced\t\tout  </p>\n\n\n<p>next</p>  ",
    # no HTML at all — text passes through (entities still decode)
    "plain &quot;text&quot; only",
    # empty and tag-only
    "",
    "<p></p><div></div>",
]


def test_cross_engine_byte_equality(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(NASTY)], "i long, html string"
    )
    got = {
        r["i"]: r["t"]
        for r in df.select(
            "i", html_to_text(F.col("html")).alias("t")
        ).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(NASTY):
        (oracle,) = con.execute(
            f"SELECT {html_to_text_sql('?')}", [s]
        ).fetchone()
        assert got[i] == oracle, (i, got[i], oracle)


def test_entity_order_single_decode():
    con = duckdb.connect()
    (out,) = con.execute(
        f"SELECT {html_to_text_sql('?')}", ["x &amp;lt; y"]
    ).fetchone()
    assert out == "x &lt; y"  # decoded once, not twice


def test_block_structure_becomes_newlines(spark):
    df = spark.createDataFrame(
        [("<h1>T</h1><p>a</p><p>b</p><ul><li>i1</li><li>i2</li></ul>",)],
        "html string",
    )
    (r,) = df.select(html_to_text(F.col("html")).alias("t")).collect()
    assert r["t"] == "T\na\nb\ni1\ni2"


def test_script_and_comment_content_never_leaks(spark):
    html = "<script>SECRET1</script><!-- SECRET2 --><p>ok</p>"
    df = spark.createDataFrame([(html,)], "html string")
    (r,) = df.select(html_to_text(F.col("html")).alias("t")).collect()
    assert r["t"] == "ok"


def test_extract_links_cross_engine(spark):
    html = (
        '<a href="http://a.example/1">x</a>'
        "<a href='http://b.example/2?q=3'>y</a>"
        '<area HREF="http://c.example/3">'
        "<p>no link</p>"
    )
    df = spark.createDataFrame([(html,)], "html string")
    (r,) = df.select(extract_links(F.col("html")).alias("l")).collect()
    expect = [
        "http://a.example/1",
        "http://b.example/2?q=3",
        "http://c.example/3",
    ]
    assert list(r["l"]) == expect
    con = duckdb.connect()
    (oracle,) = con.execute(
        f"SELECT {extract_links_sql('?')}", [html]
    ).fetchone()
    assert list(oracle) == expect


@pytest.mark.parametrize("bad", ["\x0b", "a\x0bb"])
def test_vertical_tab_survives_both_engines(spark, bad):
    """The one \\s dialect divergence (Java includes \\x0B, RE2 does
    not) is kept OUT of the patterns — \\x0B must pass through
    identically in both engines."""
    df = spark.createDataFrame([(bad,)], "html string")
    (r,) = df.select(html_to_text(F.col("html")).alias("t")).collect()
    con = duckdb.connect()
    (oracle,) = con.execute(f"SELECT {html_to_text_sql('?')}", [bad]).fetchone()
    assert r["t"] == oracle


def test_cross_engine_generative_fuzz(spark):
    """300 grammar-generated HTML fragments through BOTH engines —
    random compositions of the constructs the fixed NASTY battery pins
    one at a time (scripts with operators, comments, entities incl.
    double-escapes, block/inline/void tags, attribute links, case
    storms, whitespace storms).  Deterministic seed."""
    import random as _random

    rng = _random.Random(0xBEEF)
    pieces = [
        lambda r: f"<p>para {r.randint(0, 99)}</p>",
        lambda r: f"<div>block {r.randint(0, 99)}</div>",
        lambda r: f"<span>s{r.randint(0, 9)}</span>",
        lambda r: "<script>if (a < b && c > d) { x = '</div>'; }</script>",
        lambda r: "<STYLE>p { color: red }</STYLE>",
        lambda r: f"<!-- hidden {r.randint(0, 99)} <p>x</p> -->",
        lambda r: r.choice(
            ["&amp;", "&lt;", "&gt;", "&quot;", "&apos;", "&nbsp;",
             "&amp;lt;", "&amp;amp;"]
        ),
        lambda r: r.choice(["<br>", "<br/>", "<BR >", "<hr>"]),
        lambda r: (
            f'<a href="http://h{r.randint(0, 5)}.example/p{r.randint(0, 9)}'
            f'?a={r.randint(0, 9)}&amp;b=2">L{r.randint(0, 9)}</a>'
        ),
        lambda r: f"<a href='http://q{r.randint(0, 5)}.example/x'>Q</a>",
        lambda r: r.choice(["plain text", "  spaced\t\tout  ", "\n\n", " "]),
        lambda r: f"<H{r.randint(1, 3)}>Head</H{r.randint(1, 3)}>",
        lambda r: f"<ul><li>i{r.randint(0, 9)}</li></ul>",
    ]

    def gen() -> str:
        return "".join(
            rng.choice(pieces)(rng) for _ in range(rng.randint(1, 12))
        )

    docs = [gen() for _ in range(300)]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(docs)], "i long, html string"
    )
    got = {
        r["i"]: (r["t"], r["l"])
        for r in df.select(
            "i",
            html_to_text(F.col("html")).alias("t"),
            F.array_join(extract_links(F.col("html")), "|").alias("l"),
        ).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(docs):
        (t, l) = con.execute(
            f"SELECT {html_to_text_sql('?')}, "
            f"coalesce(array_to_string({extract_links_sql('?')}, '|'), '')",
            [s, s],
        ).fetchone()
        assert got[i] == (t, l), (i, docs[i], got[i], (t, l))
