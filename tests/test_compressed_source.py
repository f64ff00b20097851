"""Compressed text-shard source: stdlib codecs, multi-member streams,
bomb guard, line-split semantics, strict/quarantine contract."""

from __future__ import annotations

import bz2
import gzip
import lzma
import zlib

import pytest

from graphdb_neo4j_spark.sources.compressed import (
    decompress_bytes,
    decompress_text_shards,
    read_compressed_shards,
    split_lines,
)

MAX = 1 << 24


# ---------------------------------------------------------------- core


@pytest.mark.parametrize(
    "codec,comp",
    [
        ("gzip", gzip.compress),
        ("zlib", zlib.compress),
        ("bz2", bz2.compress),
        ("xz", lzma.compress),
        ("none", bytes),
    ],
)
def test_roundtrip_single_member(codec, comp):
    raw = b"alpha\nbeta\ngamma\n" * 500
    assert decompress_bytes(codec, comp(raw), MAX) == raw


@pytest.mark.parametrize(
    "codec,comp",
    [
        ("gzip", gzip.compress),
        ("zlib", zlib.compress),
        ("bz2", bz2.compress),
        ("xz", lzma.compress),
    ],
)
def test_multi_member_concatenation(codec, comp):
    # the Common-Crawl WET shape: one stream per record, concatenated.
    # A naive single-member decode returns only b"part0\n".
    members = [comp(b"part%d\n" % i) for i in range(4)]
    assert decompress_bytes(codec, b"".join(members), MAX) == (
        b"part0\npart1\npart2\npart3\n"
    )


def test_bomb_guard_never_materializes():
    bomb = gzip.compress(b"\0" * (64 << 20))  # 64 MiB of zeros, ~64 KiB gz
    with pytest.raises(ValueError, match="bomb"):
        decompress_bytes("gzip", bomb, 1 << 20)


def test_bomb_guard_none_codec():
    with pytest.raises(ValueError, match="max_bytes"):
        decompress_bytes("none", b"x" * 100, 10)


@pytest.mark.parametrize(
    "codec,comp",
    [("gzip", gzip.compress), ("bz2", bz2.compress), ("xz", lzma.compress)],
)
def test_truncated_stream_raises(codec, comp):
    full = comp(b"0123456789" * 1000)
    with pytest.raises(ValueError, match="truncated"):
        decompress_bytes(codec, full[: len(full) // 2], MAX)


def test_empty_payload_is_empty():
    assert decompress_bytes("gzip", b"", MAX) == b""
    assert decompress_bytes("none", b"", MAX) == b""


def test_zstd_roundtrip_single_member():
    from graphdb_neo4j_spark.sources.zstd_codec import zstd_compress

    raw = b"alpha\nbeta\ngamma\n" * 500
    assert decompress_bytes("zstd", zstd_compress(raw), MAX) == raw


def test_zstd_multi_member_concatenation():
    from graphdb_neo4j_spark.sources.zstd_codec import zstd_compress

    members = [zstd_compress(b"part%d\n" % i) for i in range(4)]
    assert decompress_bytes("zstd", b"".join(members), MAX) == (
        b"part0\npart1\npart2\npart3\n"
    )


def test_zstd_truncated_stream_raises():
    from graphdb_neo4j_spark.sources.zstd_codec import zstd_compress

    full = zstd_compress(b"0123456789" * 1000)
    with pytest.raises(ValueError, match="truncated"):
        decompress_bytes("zstd", full[: len(full) // 2], MAX)


def test_zstd_bomb_guard():
    from graphdb_neo4j_spark.sources.zstd_codec import zstd_compress

    bomb = zstd_compress(
        b"\0" * (64 << 20), block_types="rle", block_size=128 << 10, verify=False
    )
    assert len(bomb) < 4096  # the bomb is tiny on the wire
    with pytest.raises(ValueError, match="bomb"):
        decompress_bytes("zstd", bomb, 1 << 20)


def test_zstd_dictionary_frames_quarantine_without_a_dictionary():
    # dictionaries ARE supported at the codec level (zstd_decompress
    # dictionary=), but the shard source has no dictionary channel —
    # a dict frame must fail loudly, not decode wrong
    frame = b"\x28\xb5\x2f\xfd" + bytes([0x21, 7, 0]) + b"\x01\x00\x00"
    with pytest.raises(ValueError, match="dictionary"):
        decompress_bytes("zstd", frame, MAX)


def test_unknown_codec_rejected():
    with pytest.raises(ValueError, match="unknown codec"):
        decompress_bytes("brotli", b"x", MAX)


def test_split_lines_semantics():
    assert split_lines("") == []
    assert split_lines("a\nb\n") == ["a", "b"]  # no phantom trailing line
    assert split_lines("a\nb") == ["a", "b"]  # unterminated final kept
    assert split_lines("\n") == [""]  # one empty line
    assert split_lines("a\r\nb\n") == ["a\r", "b"]  # \r preserved verbatim


# ------------------------------------------------------------- operator


def test_shards_to_lines(spark):
    rows = [
        (0, "gzip", bytearray(gzip.compress(b"a\nbb\n"))),
        (1, "bz2", bytearray(bz2.compress(b"ccc\n"))),
        (2, "xz", bytearray(lzma.compress(b"dddd\neeeee"))),
        (3, "zlib", bytearray(zlib.compress(b""))),  # empty shard: 0 lines
    ]
    df = spark.createDataFrame(rows, "shard_id long, codec string, payload binary")
    out = decompress_text_shards(df, strict=True)
    got = sorted(
        (r["shard_id"], r["line_no"], r["text"]) for r in out.collect()
    )
    assert got == [
        (0, 1, "a"),
        (0, 2, "bb"),
        (1, 1, "ccc"),
        (2, 1, "dddd"),
        (2, 2, "eeeee"),
    ]


def test_uniform_codec_param(spark):
    df = spark.createDataFrame(
        [(7, bytearray(gzip.compress("héllo\nwörld\n".encode())))],
        "shard_id long, payload binary",
    )
    out = decompress_text_shards(df, codec="gzip")
    assert [r["text"] for r in out.orderBy("line_no").collect()] == [
        "héllo",
        "wörld",
    ]


def test_codec_required_when_no_column(spark):
    df = spark.createDataFrame([(0, bytearray(b""))], "shard_id long, payload binary")
    with pytest.raises(ValueError, match="codec"):
        decompress_text_shards(df)


def test_strict_raises_on_bad_shard(spark):
    df = spark.createDataFrame(
        [(0, "gzip", bytearray(b"not a gzip stream"))],
        "shard_id long, codec string, payload binary",
    )
    with pytest.raises(Exception):  # zlib.error surfaces through the task
        decompress_text_shards(df, strict=True).collect()


def test_quarantine_contract(spark):
    rows = [
        (0, "gzip", bytearray(gzip.compress(b"good\n"))),
        (1, "gzip", bytearray(b"garbage")),  # bad stream
        (2, "zstd", bytearray(b"\x28\xb5\x2f\xfd")),  # truncated zstd frame
        (3, "gzip", bytearray(gzip.compress(b"\xff\xfe invalid utf8"))),
    ]
    df = spark.createDataFrame(rows, "shard_id long, codec string, payload binary")
    lines, quarantine = read_compressed_shards(df)
    assert [r["shard_id"] for r in lines.collect()] == [0]
    bad = {r["shard_id"]: r["error"] for r in quarantine.collect()}
    assert set(bad) == {1, 2, 3}
    assert "truncated" in bad[2]
    assert "UnicodeDecodeError" in bad[3]


def test_multi_member_through_operator(spark):
    payload = gzip.compress(b"rec1\n") + gzip.compress(b"rec2\nrec3\n")
    df = spark.createDataFrame(
        [(0, bytearray(payload))], "shard_id long, payload binary"
    )
    out = decompress_text_shards(df, codec="gzip")
    assert [r["text"] for r in out.orderBy("line_no").collect()] == [
        "rec1",
        "rec2",
        "rec3",
    ]


def test_union_single_pass_shape(spark):
    from graphdb_neo4j_spark.sources.compressed import decode_shards_union

    rows = [
        (0, "gzip", bytearray(gzip.compress(b"a\nb\n"))),
        (1, "gzip", bytearray(b"garbage")),
    ]
    df = spark.createDataFrame(rows, "shard_id long, codec string, payload binary")
    got = decode_shards_union(df).orderBy("shard_id", "line_no").collect()
    assert [(r["shard_id"], r["line_no"], r["text"], r["error"] is None) for r in got] == [
        (0, 1, "a", True),
        (0, 2, "b", True),
        (1, None, None, False),
    ]
