"""End-to-end crawl-ingestion chain: compressed shard (gzip AND zstd)
→ WARC records → HTML→text → quality/langid gate → exact dedup →
link graph.  Each stage is hash-gated on its own elsewhere
(q215/q217/q218/q219/q20); this test pins that they COMPOSE — the
pipeline a 100 TB Common-Crawl curation run would execute, in one
Spark plan chain with a single Arrow decode pass at the front."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators.dedup import exact_dedup
from graphdb_neo4j_spark.operators.text import (
    extract_links,
    html_to_text,
    lang_guess,
    quality_score,
)
from graphdb_neo4j_spark.sources.warc import build_warc, warc_records
from graphdb_neo4j_spark.sources.zstd_codec import zstd_compress

BODY = (
    "<p>The quick brown fox jumps over the lazy dog and then the dog "
    "sleeps in the sun for a while.</p>"
)


def _page(sid: int, r: int, *, dup_of: tuple[int, int] | None = None,
          junk: bool = False) -> dict:
    """One WARC 'response' record carrying HTML."""
    key = dup_of or (sid, r)
    if junk:
        html = "<html><body>%%%% !!!! ???? ;;;; ####</body></html>"
    else:
        html = (
            f"<html><head><title>page {key[0]}-{key[1]}</title>"
            "<script>var x=1;</script></head>"
            f"<body><h1>Page {key[0]}-{key[1]}</h1>{BODY}"
            f'<a href="http://site-{key[0]}.example/page-{key[1] + 1}">next</a>'
            "</body></html>"
        )
    return {
        "warc_type": "response",
        "target_uri": f"http://site-{sid}.example/page-{r}",
        "record_id": f"<urn:uuid:{sid}-{r}>",
        "warc_date": "2024-01-01T00:00:00Z",
        "content_type": "text/html",
        "payload": html.encode(),
    }


def test_crawl_chain_composes(spark):
    # 6 shards: even ids gzip (one member per record, the CC layout),
    # odd ids zstd (one frame per record, concatenated).  Shard 4
    # duplicates shard 0's pages under different URIs; shard 5 is junk.
    rows = []
    for sid in range(6):
        if sid == 4:
            recs = [_page(sid, r, dup_of=(0, r)) for r in (1, 2)]
        elif sid == 5:
            recs = [_page(sid, 1, junk=True)]
        else:
            recs = [_page(sid, r) for r in (1, 2)]
        if sid % 2 == 0:
            payload = b"".join(
                gzip.compress(build_warc([r]), mtime=0) for r in recs
            )
            codec = "gzip"
        else:
            payload = b"".join(zstd_compress(build_warc([r])) for r in recs)
            codec = "zstd"
        rows.append((sid, codec, bytearray(payload)))
    shards = spark.createDataFrame(
        rows, "shard_id long, codec string, payload binary"
    ).repartition(3)

    recs = warc_records(shards, strict=True)  # codec column wins
    docs = recs.select(
        "shard_id",
        "record_no",
        "target_uri",
        html_to_text(F.col("text")).alias("text"),
        extract_links(F.col("text")).alias("links"),
    )
    assert docs.count() == 11  # 2+2+2+2+2+1 records through both codecs

    scored = docs.withColumn("q", quality_score(F.col("text"))).withColumn(
        "lang", lang_guess(F.col("text"))
    )
    kept = scored.filter((F.col("q") >= 2 / 3) & (F.col("lang") == "en"))
    kept_rows = kept.collect()
    # the junk shard dies at the quality gate, everything else survives
    assert {r["shard_id"] for r in kept_rows} == {0, 1, 2, 3, 4}
    assert len(kept_rows) == 10

    # exact dedup over the extracted text: shard 4's two pages collapse
    # onto shard 0's (keyed by uri for determinism)
    clusters = exact_dedup(
        kept.withColumn("doc_id", F.col("target_uri")),
        text_col="text",
        id_col="doc_id",
    )
    assert clusters.count() == 8  # 10 kept docs, 2 dup pairs
    dups = {
        r["keep_id"]: r["dup_count"]
        for r in clusters.filter(F.col("dup_count") > 1).collect()
    }
    assert dups == {
        "http://site-0.example/page-1": 2,
        "http://site-0.example/page-2": 2,
    }

    # the crawl graph edges come out of the SAME pass
    edges = kept.select(
        "target_uri", F.explode("links").alias("href")
    )
    edge_rows = edges.collect()
    assert len(edge_rows) == 10
    assert all(e["href"].startswith("http://site-") for e in edge_rows)

    # ... and feed the NEXT crawl wave: canonicalize the extracted
    # links, apply robots verdicts, and dedup the frontier
    from graphdb_neo4j_spark.operators.robots import (
        parse_robots,
        robots_allowed,
    )
    from graphdb_neo4j_spark.operators.url import (
        url_host,
        url_normalize,
        url_path_canonical,
    )

    frontier = edges.select(
        url_normalize(F.col("href")).alias("url"),
        url_host(F.col("href")).alias("host"),
        url_path_canonical(F.col("href")).alias("path"),
    ).dropDuplicates(["url"])
    # shard 4 duplicated shard 0's pages: its links canonicalize onto
    # shard 0's, so 10 edges → 8 frontier URLs
    assert frontier.count() == 8

    robots = spark.createDataFrame(
        [("site-1.example", "User-agent: *\nDisallow: /page-3\n")],
        "host string, robots_txt string",
    )
    verdicts = robots_allowed(frontier, parse_robots(robots), agent="bot")
    blocked = [r.url for r in verdicts.filter(~F.col("allowed")).collect()]
    assert blocked == ["http://site-1.example/page-3"]
    assert verdicts.filter(F.col("allowed")).count() == 7
