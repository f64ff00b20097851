"""Streaming crawl-shard ingest: stream ≡ batch, exactly-once replay,
quarantine contract, both decode modes, zstd + gzip shards."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from graphdb_neo4j_spark.sources.compressed import decode_shards_union
from graphdb_neo4j_spark.sources.warc import build_warc, warc_records
from graphdb_neo4j_spark.sources.zstd_codec import zstd_compress
from graphdb_neo4j_spark.streaming.crawl import streaming_crawl_ingest

SHARD_SCHEMA = "shard_id long, codec string, payload binary"


def _wet_shard(sid: int, n_recs: int, codec: str) -> tuple:
    members = []
    for r in range(1, n_recs + 1):
        rec = build_warc([{
            "warc_type": "conversion",
            "target_uri": f"http://s{sid}.example/p{r}",
            "record_id": f"<urn:uuid:{sid}-{r}>",
            "warc_date": "2024-01-01T00:00:00Z",
            "content_type": "text/plain",
            "payload": b"text %d-%d" % (sid, r),
        }])
        members.append(
            gzip.compress(rec, mtime=0) if codec == "gzip" else zstd_compress(rec)
        )
    return (sid, codec, bytearray(b"".join(members)))


def _run(builder, ckpt: str):
    q = builder.option("checkpointLocation", ckpt).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(300)


def test_streaming_warc_ingest_waves_and_replay(spark, tmp_path):
    src = tmp_path / "shards"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    wave1 = [_wet_shard(0, 2, "gzip"), _wet_shard(1, 3, "zstd")]
    spark.createDataFrame(wave1, SHARD_SCHEMA).write.parquet(
        f"{src}/w1.parquet"
    )

    def builder():
        return streaming_crawl_ingest(
            spark.readStream.schema(SHARD_SCHEMA).parquet(str(src) + "/*"),
            state,
            mode="warc",
        )

    _run(builder(), ckpt)
    good = spark.read.parquet(f"{state}/good")
    assert good.count() == 5

    # wave 2 arrives (including one undecodable shard)
    wave2 = [_wet_shard(2, 1, "gzip"), (3, "gzip", bytearray(b"garbage"))]
    spark.createDataFrame(wave2, SHARD_SCHEMA).write.parquet(
        f"{src}/w2.parquet"
    )
    _run(builder(), ckpt)
    good = spark.read.parquet(f"{state}/good")
    quar = spark.read.parquet(f"{state}/quarantine")
    assert good.count() == 6
    assert [r.shard_id for r in quar.collect()] == [3]

    # stream ≡ batch on the full shard set
    all_shards = spark.createDataFrame(wave1 + wave2, SHARD_SCHEMA)
    batch = warc_records(all_shards, strict=False)
    bgood = batch.filter(F.col("error").isNull())
    got = sorted(
        (r.shard_id, r.record_no, r.target_uri, r.text)
        for r in good.collect()
    )
    want = sorted(
        (r.shard_id, r.record_no, r.target_uri, r.text)
        for r in bgood.collect()
    )
    assert got == want

    # replay with the same checkpoint: no duplicates
    _run(builder(), ckpt)
    assert spark.read.parquet(f"{state}/good").count() == 6
    meta = spark.read.parquet(f"{state}/meta")
    assert meta.agg(F.sum("n_good")).first()[0] == 6
    assert meta.agg(F.sum("n_quarantined")).first()[0] == 1


def test_streaming_lines_mode_matches_batch(spark, tmp_path):
    src = tmp_path / "shards"
    src.mkdir()
    state = str(tmp_path / "state")
    rows = [
        (0, "zstd", bytearray(zstd_compress(b"l1\nl2\nl3\n"))),
        (1, "gzip", bytearray(gzip.compress(b"m1\nm2\n"))),
    ]
    spark.createDataFrame(rows, SHARD_SCHEMA).write.parquet(
        f"{src}/w.parquet"
    )
    q = (
        streaming_crawl_ingest(
            spark.readStream.schema(SHARD_SCHEMA).parquet(str(src) + "/*"),
            state,
            mode="lines",
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    good = spark.read.parquet(f"{state}/good")
    batch = decode_shards_union(
        spark.createDataFrame(rows, SHARD_SCHEMA)
    ).filter(F.col("error").isNull())
    assert sorted(
        (r.shard_id, r.line_no, r.text) for r in good.collect()
    ) == sorted((r.shard_id, r.line_no, r.text) for r in batch.collect())


def test_bad_mode_rejected(spark):
    import pytest

    with pytest.raises(ValueError, match="mode"):
        streaming_crawl_ingest(None, "/tmp/x", mode="nope")
