"""WARC/WET record source: Content-Length-counted payloads,
case-insensitive headers, multi-member gzip composition, quarantine."""

from __future__ import annotations

import gzip

import pytest

from graphdb_neo4j_spark.sources.warc import build_warc, parse_warc, warc_records


def _wet_records():
    return [
        {"warc_type": "warcinfo", "content_type": "application/warc-fields",
         "payload": b"software: fixture\r\n"},
        {"warc_type": "conversion", "target_uri": "http://a.example/x",
         "record_id": "<urn:uuid:1>", "warc_date": "2024-01-01T00:00:00Z",
         "content_type": "text/plain", "payload": "héllo\ntext".encode()},
    ]


# ---------------------------------------------------------------- core


def test_roundtrip_and_optional_headers():
    got = parse_warc(build_warc(_wet_records()))
    assert [r["warc_type"] for r in got] == ["warcinfo", "conversion"]
    assert got[0]["target_uri"] is None and got[0]["warc_date"] is None
    assert got[1]["payload"].decode() == "héllo\ntext"
    assert got[1]["content_length"] == len("héllo\ntext".encode())


def test_content_length_beats_separator_scan():
    # an HTTP response payload contains \r\n\r\n — a scanner would cut
    # the record short; the counted read must not
    rec = {"warc_type": "response", "target_uri": "http://b.example/y",
           "payload": b"HTTP/1.1 200 OK\r\n\r\n<html>ok</html>"}
    got = parse_warc(build_warc([rec, _wet_records()[1]]))
    assert got[0]["payload"].endswith(b"<html>ok</html>")
    assert got[1]["warc_type"] == "conversion"


def test_header_names_case_insensitive():
    blob = (
        b"WARC/1.0\r\nwarc-TYPE: conversion\r\nCONTENT-length: 2\r\n\r\n"
        b"ab\r\n\r\n"
    )
    got = parse_warc(blob)
    assert got[0]["warc_type"] == "conversion" and got[0]["payload"] == b"ab"


def test_structural_damage_raises():
    blob = build_warc(_wet_records())
    with pytest.raises(ValueError):
        parse_warc(blob[: len(blob) // 2])
    with pytest.raises(ValueError, match="version"):
        parse_warc(b"NOT A WARC\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: conversion\r\n\r\n")
    with pytest.raises(ValueError, match="past end"):
        parse_warc(b"WARC/1.0\r\nContent-Length: 99\r\n\r\nshort")


def test_empty_stream_is_empty():
    assert parse_warc(b"") == []
    assert parse_warc(b"\r\n\r\n") == []


# ------------------------------------------------------------- operator


def test_warc_records_multi_member_gzip(spark):
    # one gzip member per record — the Common-Crawl layout
    recs = _wet_records()
    payload = b"".join(gzip.compress(build_warc([r])) for r in recs)
    df = spark.createDataFrame(
        [(0, bytearray(payload))], "shard_id long, payload binary"
    )
    out = warc_records(df, codec="gzip").orderBy("record_no").collect()
    assert [r["record_no"] for r in out] == [1, 2]
    assert out[1]["target_uri"] == "http://a.example/x"
    assert out[1]["text"] == "héllo\ntext"
    assert all(r["error"] is None for r in out)


def test_warc_records_plain_and_quarantine(spark):
    rows = [
        (0, "none", bytearray(build_warc(_wet_records()))),
        (1, "none", bytearray(b"garbage stream")),
        (2, "gzip", bytearray(b"not gzip either")),
    ]
    df = spark.createDataFrame(rows, "shard_id long, codec string, payload binary")
    out = warc_records(df, strict=False).collect()
    good = [r for r in out if r["error"] is None]
    bad = {r["shard_id"]: r["error"] for r in out if r["error"] is not None}
    assert {r["shard_id"] for r in good} == {0}
    assert len(good) == 2
    assert set(bad) == {1, 2}
    assert "ValueError" in bad[1]


def test_warc_records_strict_raises(spark):
    df = spark.createDataFrame(
        [(0, bytearray(b"garbage"))], "shard_id long, payload binary"
    )
    with pytest.raises(Exception):
        warc_records(df, codec="none", strict=True).collect()


def test_folded_header_continuation_lines():
    # ISO 28500 §4 allows RFC-822-style folded values; Content-Length
    # still counts the payload correctly afterwards
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: http://example.com/a-very-long\r\n"
        b"\t-continued-path\r\n"
        b"Content-Length: 5\r\n"
        b"\r\n"
        b"hello\r\n\r\n"
    )
    recs = parse_warc(raw)
    assert len(recs) == 1
    assert recs[0]["target_uri"] == "http://example.com/a-very-long -continued-path"
    assert recs[0]["payload"] == b"hello"


def test_folded_line_without_previous_header_raises():
    raw = (
        b"WARC/1.0\r\n"
        b" orphan-continuation\r\n"
        b"Content-Length: 0\r\n"
        b"\r\n\r\n\r\n"
    )
    with pytest.raises(ValueError, match="malformed WARC header"):
        parse_warc(raw)
