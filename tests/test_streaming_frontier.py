"""Streaming crawl-frontier dedup: canonicalized first-seen across
batches — stream ≡ batch on the q220 frontier semantics, exactly-once
replay, append-only ledger layout, and the bounded-state watermarked
variant."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators.url import (
    registrable_domain,
    url_host,
    url_normalize,
)
from graphdb_neo4j_spark.streaming.crawl import (
    frontier_urls,
    streaming_frontier_dedup,
    streaming_frontier_ingest,
)

URL_SCHEMA = "url string, event_time timestamp"

WAVE1 = [
    ("HTTP://Example.COM:80/a/../b?utm_source=x", "2024-01-01 00:00:01"),
    ("http://example.com/b", "2024-01-01 00:00:02"),  # same page, later
    ("http://other.example/x?q=1", "2024-01-01 00:00:03"),
    ("not-a-url", "2024-01-01 00:00:04"),  # non-absolute: dropped
]
WAVE2 = [
    ("http://example.com//b", "2024-01-01 00:10:00"),  # dup of wave-1 page
    ("https://News.Site.co.uk./story-1#top", "2024-01-01 00:10:01"),
    ("http://other.example/x?q=1&utm_campaign=z", "2024-01-01 00:10:02"),  # dup
    ("http://fresh.example/new", "2024-01-01 00:10:03"),
]


def _rows(spark, wave):
    return spark.createDataFrame(
        [(u, t) for u, t in wave], "url string, event_time string"
    ).withColumn("event_time", F.col("event_time").cast("timestamp"))


def _run(builder, ckpt: str):
    q = builder.option("checkpointLocation", ckpt).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(300)


def _batch_frontier(spark, waves):
    """The q220 semantics run in batch: canonicalize, then the window
    picks the first arrival per canonical form by (time, raw url)."""
    df = _rows(spark, [r for w in waves for r in w])
    canon = F.coalesce(url_normalize(F.col("url")), F.lit(""))
    w = Window.partitionBy("canon").orderBy("event_time", "url")
    return (
        df.withColumn("canon", canon)
        .filter(F.col("canon") != "")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "canon",
            "url",
            url_host(F.col("url")).alias("host"),
            registrable_domain(url_host(F.col("url"))).alias("domain"),
        )
    )


def test_frontier_ingest_stream_equals_batch_and_replays(spark, tmp_path):
    src = tmp_path / "urls"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _rows(spark, WAVE1).write.parquet(f"{src}/w1.parquet")

    def builder():
        return streaming_frontier_ingest(
            spark.readStream.schema(URL_SCHEMA).parquet(str(src) + "/*"),
            state,
        )

    _run(builder(), ckpt)
    got1 = frontier_urls(spark, state)
    # wave 1: example.com/b admitted ONCE (earliest spelling), other
    # admitted, non-absolute dropped
    assert got1.count() == 2
    first_b = got1.filter(F.col("canon") == "http://example.com/b").collect()
    assert [r.url for r in first_b] == [
        "HTTP://Example.COM:80/a/../b?utm_source=x"
    ]

    # wave 2: both dup spellings rejected, two genuinely new admitted
    _rows(spark, WAVE2).write.parquet(f"{src}/w2.parquet")
    _run(builder(), ckpt)
    got = frontier_urls(spark, state)
    assert got.count() == 4

    # stream ≡ batch: ledger equals the q220 first-seen window run
    # over the full input
    want = _batch_frontier(spark, [WAVE1, WAVE2])
    key = lambda r: (r["canon"], r["url"], r["host"], r["domain"])
    assert sorted(map(key, got.select(*want.columns).collect())) == sorted(
        map(key, want.collect())
    )

    # exactly-once: a restart with no new data is a no-op
    _run(builder(), str(tmp_path / "ckpt2"))
    assert frontier_urls(spark, state).count() == 4

    # the ledger is append-only per batch: each batch_id partition
    # holds only ITS admissions
    ledger = spark.read.parquet(f"{state}/frontier")
    per_batch = {
        r.batch_id: r.n for r in
        ledger.groupBy("batch_id").agg(F.count("*").alias("n")).collect()
    }
    assert sum(per_batch.values()) == 4 and len(per_batch) >= 2


def test_frontier_dedup_watermarked_variant(spark, tmp_path):
    src = tmp_path / "urls"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _rows(spark, WAVE1).write.parquet(f"{src}/w1.parquet")
    _rows(spark, WAVE2).write.parquet(f"{src}/w2.parquet")

    stream = spark.readStream.schema(URL_SCHEMA).parquet(str(src) + "/*")
    q = (
        streaming_frontier_dedup(stream, watermark_delay="2 hours")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    # one row per canonical page; non-absolute dropped
    canons = sorted(r.canon for r in got.select("canon").collect())
    assert canons == [
        "http://example.com/b",
        "http://fresh.example/new",
        "http://other.example/x?q=1",
        "https://news.site.co.uk/story-1",
    ]


def test_frontier_ingest_arrival_order_beats_late_event_time(spark, tmp_path):
    """Cross-batch precedence is ARRIVAL order: a late-arriving
    spelling variant with an EARLIER event time must not displace the
    already-admitted row — the ledger is fetch history."""
    src = tmp_path / "urls"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _rows(
        spark, [("http://example.com/b", "2024-01-01 12:00:00")]
    ).write.parquet(f"{src}/w1.parquet")

    def builder():
        return streaming_frontier_ingest(
            spark.readStream.schema(URL_SCHEMA).parquet(str(src) + "/*"),
            state,
        )

    _run(builder(), ckpt)
    # a variant spelling of the SAME page arrives later with an
    # earlier event time
    _rows(
        spark,
        [("HTTP://Example.COM:80/a/../b", "2024-01-01 00:00:00")],
    ).write.parquet(f"{src}/w2.parquet")
    _run(builder(), ckpt)

    got = frontier_urls(spark, state).collect()
    assert len(got) == 1
    assert got[0].url == "http://example.com/b"  # the first ARRIVAL


def test_frontier_ingest_survives_checkpoint_loss(spark, tmp_path):
    """The finding this pins: batch ids restart at 0 under a fresh
    checkpoint lineage, so a bare-batch_id meta gate would silently
    SKIP the recovery batch and drop its new URLs.  The run-scoped
    gate must instead reprocess it content-idempotently: old
    admissions stay single, new URLs are admitted."""
    src = tmp_path / "urls"
    src.mkdir()
    state = str(tmp_path / "state")

    _rows(spark, WAVE1).write.parquet(f"{src}/w1.parquet")

    def builder():
        return streaming_frontier_ingest(
            spark.readStream.schema(URL_SCHEMA).parquet(str(src) + "/*"),
            state,
        )

    _run(builder(), str(tmp_path / "ckpt1"))
    assert frontier_urls(spark, state).count() == 2

    # checkpoint is lost; new URLs arrive; recovery runs with a FRESH
    # checkpoint — the engine replays EVERYTHING as batch 0
    _rows(
        spark, [("http://brand.new.example/page", "2024-01-02 00:00:00")]
    ).write.parquet(f"{src}/w3.parquet")
    _run(builder(), str(tmp_path / "ckpt-recovered"))

    got = frontier_urls(spark, state)
    # old admissions not duplicated, the new URL not lost
    assert got.count() == 3
    assert (
        got.filter(F.col("canon") == "http://brand.new.example/page").count()
        == 1
    )
    assert got.groupBy("canon").count().filter("count > 1").count() == 0


def test_frontier_ingest_with_politeness_schedule(spark, tmp_path):
    """Scheduled admissions: slot numbering continues per host across
    batches (prior-count base + in-batch rank) and stream ≡ batch
    against politeness_schedule run over the batch frontier."""
    from graphdb_neo4j_spark.operators.robots import (
        crawl_delays,
        politeness_schedule,
    )

    robots = spark.createDataFrame(
        [
            ("example.com", "User-agent: *\nDisallow: /p/\nCrawl-delay: 2\n"),
            ("other.example", "User-agent: *\nDisallow: /q/\n"),
        ],
        "host string, robots_txt string",
    )
    src = tmp_path / "urls"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    w1 = [
        ("http://example.com/a", "2024-01-01 00:00:01"),
        ("http://example.com/b", "2024-01-01 00:00:02"),
        ("http://other.example/x", "2024-01-01 00:00:03"),
    ]
    w2 = [
        ("http://example.com/c", "2024-01-01 00:10:00"),
        ("HTTP://Example.COM:80/a", "2024-01-01 00:10:01"),  # dup: no slot
        ("http://other.example/y", "2024-01-01 00:10:02"),
    ]
    _rows(spark, w1).write.parquet(f"{src}/w1.parquet")

    def builder():
        return streaming_frontier_ingest(
            spark.readStream.schema(URL_SCHEMA).parquet(str(src) + "/*"),
            state,
            delays=crawl_delays(robots),
            agent="trainbot",
            default_delay_s=1.0,
        )

    _run(builder(), ckpt)
    _rows(spark, w2).write.parquet(f"{src}/w2.parquet")
    _run(builder(), ckpt)

    got = {
        r.canon: (r.slot_no, r.delay_s, r.fetch_offset_s)
        for r in frontier_urls(spark, state).collect()
    }
    assert got == {
        "http://example.com/a": (0, 2.0, 0.0),
        "http://example.com/b": (1, 2.0, 2.0),
        "http://example.com/c": (2, 2.0, 4.0),  # slot continues
        "http://other.example/x": (0, 1.0, 0.0),  # default delay
        "http://other.example/y": (1, 1.0, 1.0),
    }

    # stream ≡ batch: politeness_schedule over the batch frontier
    # (event-time order consistent with arrival) gives identical slots
    frontier = _batch_frontier(spark, [w1, w2])
    sched, handle = politeness_schedule(
        frontier,
        crawl_delays(robots),
        agent="trainbot",
        order_cols=("canon",),
        default_delay_s=1.0,
    )
    want = {
        r.canon: (r.slot_no, r.delay_s, r.fetch_offset_s)
        for r in sched.collect()
    }
    handle.release()
    assert got == want


def test_frontier_ledger_survives_delays_toggle(spark, tmp_path):
    """ADVICE r8: a ledger whose early partitions predate a delays
    toggle has mixed parquet schemas; the readers merge schemas, so
    pre-toggle admissions surface with NULL schedule columns instead of
    the read failing (or silently dropping the columns, depending on
    which file the schema was sampled from)."""
    from graphdb_neo4j_spark.operators.robots import crawl_delays

    robots = spark.createDataFrame(
        [("example.com", "User-agent: *\nDisallow: /p/\nCrawl-delay: 2\n")],
        "host string, robots_txt string",
    )
    src = tmp_path / "urls"
    src.mkdir()
    state = str(tmp_path / "state")

    _rows(
        spark, [("http://example.com/a", "2024-01-01 00:00:01")]
    ).write.parquet(f"{src}/w1.parquet")
    unscheduled = streaming_frontier_ingest(
        spark.readStream.schema(URL_SCHEMA).parquet(str(src) + "/*"), state
    )
    _run(unscheduled, str(tmp_path / "ckpt1"))

    _rows(
        spark, [("http://example.com/c", "2024-01-01 00:10:00")]
    ).write.parquet(f"{src}/w2.parquet")
    scheduled = streaming_frontier_ingest(
        spark.readStream.schema(URL_SCHEMA).parquet(str(src) + "/*"),
        state,
        delays=crawl_delays(robots),
        default_delay_s=1.0,
    )
    _run(scheduled, str(tmp_path / "ckpt2"))

    got = {
        r.canon: (r.slot_no, r.delay_s)
        for r in frontier_urls(spark, state).collect()
    }
    # pre-toggle admission: NULL schedule columns, still readable;
    # post-toggle admission: slot continues from the prior count (1)
    assert got == {
        "http://example.com/a": (None, None),
        "http://example.com/c": (1, 2.0),
    }
