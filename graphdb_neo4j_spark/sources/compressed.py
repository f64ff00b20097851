"""Compressed text-shard source — gzip / zlib / bz2 / xz line shards
decompressed in ONE Arrow-batched ``mapInPandas`` pass.

Web-scale text corpora rarely arrive as parquet: Common-Crawl-style
dumps are millions of gzip members, news/forum archives ship as .bz2
or .xz, and API exports hand you raw zlib streams.  The operator here
is the front door for that shape — input is a binary-payload frame
``(shard_id, payload[, codec])``, output is one row per text line,
ready for the curation pipeline (quality → dedup → pack) or a
parquet repack.

Four codecs are Python-stdlib (``zlib`` / ``bz2`` / ``lzma``); ``zstd``
— THE Common-Crawl/HF shard codec going forward — decodes through the
dependency-free RFC 8878 implementation in
:mod:`graphdb_neo4j_spark.sources.zstd_codec` (frames, FSE, Huffman
literals, sequences, XXH64 checksums, dictionaries; this source has
no dictionary channel, so a dictionary-compressed shard quarantines
loudly rather than decoding wrong).

Semantics pinned by tests (tests/test_compressed_source.py):

* **multi-member streams** — a gzip "file" is legally a concatenation
  of independent members (RFC 1952 §2.2; exactly how Common Crawl WET
  files are built, one member per record).  All codecs here loop on
  ``unused_data`` so concatenated members decode as one byte stream.
  Naive ``zlib.decompressobj().decompress`` would silently truncate
  at the first member — the classic WET-file bug.
* **decompression-bomb guard** — payloads are untrusted at corpus
  scale; decoding is incremental (``max_length``-bounded calls) and a
  shard whose plaintext exceeds ``max_bytes`` fails FAST without ever
  materializing the bomb, instead of OOMing the executor.
* **line split** — exact ``\\n`` split; a trailing newline yields no
  phantom empty line; a final unterminated line is kept.  (``\\r`` is
  preserved in the text — byte-faithful, no hidden normalization.)
* **strict vs quarantine** — ``strict=True`` raises on the first bad
  shard (fixture/audit mode); ``strict=False`` skips undecodable
  shards and reports them in the companion ``quarantine`` frame from
  :func:`read_compressed_shards`, never silently.

100 TB notes: gzip/bz2/xz streams are NOT splittable — parallelism
equals the shard count, so the right pipeline decompresses each shard
exactly once and lands lines in a splittable format (parquet) before
any heavy transform; this operator is that single pass.  The payload
crosses the JVM↔Arrow boundary once per batch and is dropped from the
output (blobs never outlive the stage that consumes them).  Executor
memory bounds one decompressed shard (≤ ``max_bytes``), not the whole
corpus; Spark's own gzip-text reader has the same one-task-per-file
constraint but row-strings it — here the bomb guard and the
quarantine channel come with.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas

CODECS = ("gzip", "zlib", "bz2", "xz", "zstd", "none")

_CHUNK = 1 << 20  # incremental decompress granularity (1 MiB)

LINES_SCHEMA = StructType(
    [
        StructField("shard_id", LongType()),
        StructField("codec", StringType()),
        StructField("line_no", IntegerType()),  # 1-based within shard
        StructField("text", StringType()),
    ]
)

QUARANTINE_SCHEMA = StructType(
    [
        StructField("shard_id", LongType()),
        StructField("codec", StringType()),
        StructField("error", StringType()),
    ]
)

# union shape of the single-pass kernel: line rows carry text (error
# NULL), quarantine rows carry error (line_no/text NULL)
UNION_SCHEMA = StructType(
    [
        StructField("shard_id", LongType()),
        StructField("codec", StringType()),
        StructField("line_no", IntegerType()),
        StructField("text", StringType()),
        StructField("error", StringType()),
    ]
)


def _new_decompressor(codec: str):
    if codec == "gzip":
        import zlib

        return lambda: zlib.decompressobj(wbits=31)  # RFC 1952 wrapper
    if codec == "zlib":
        import zlib

        return lambda: zlib.decompressobj(wbits=15)  # RFC 1950 wrapper
    if codec == "bz2":
        import bz2

        return bz2.BZ2Decompressor
    if codec == "xz":
        import lzma

        return lambda: lzma.LZMADecompressor(format=lzma.FORMAT_XZ)
    if codec == "zstd":
        from graphdb_neo4j_spark.sources.zstd_codec import ZstdDecompressor

        return ZstdDecompressor
    raise ValueError(f"unknown codec {codec!r} (supported: {CODECS})")


def decompress_bytes(codec: str, payload: bytes, max_bytes: int) -> bytes:
    """Decompress one shard incrementally with a plaintext size cap.

    Loops over CONCATENATED members (``unused_data``) for every codec
    and feeds each member through ``max_length``-bounded calls, so a
    decompression bomb raises after at most ``max_bytes`` + one chunk
    of output exists — it is never fully materialized."""
    if codec == "none":
        if len(payload) > max_bytes:
            raise ValueError(
                f"shard plaintext {len(payload)}B exceeds max_bytes={max_bytes}"
            )
        return bytes(payload)
    make = _new_decompressor(codec)
    out: list[bytes] = []
    total = 0
    data = bytes(payload)
    while data:
        d = make()
        feed = data
        # member loop: max_length-bounded pulls until the stream ends.
        # zlib parks capped input in .unconsumed_tail (re-feed it);
        # bz2/lzma buffer it internally (re-pull with b"").
        while not d.eof:
            chunk = d.decompress(feed, _CHUNK)
            total += len(chunk)
            if total > max_bytes:
                raise ValueError(
                    f"shard plaintext exceeds max_bytes={max_bytes} "
                    "(decompression bomb guard)"
                )
            out.append(chunk)
            feed = getattr(d, "unconsumed_tail", b"")
            if not d.eof and not chunk and not feed:
                # no output, no pending input, stream unfinished
                raise ValueError(f"truncated {codec} stream")
        data = d.unused_data  # next concatenated member, if any
    return b"".join(out)


def split_lines(text: str) -> list[str]:
    """Exact ``\\n`` split; trailing newline adds no phantom line."""
    if not text:
        return []
    parts = text.split("\n")
    if parts and parts[-1] == "":
        parts.pop()
    return parts


def decode_shards_union(
    df: DataFrame,
    codec: str | None = None,
    max_bytes: int = 1 << 30,
    strict: bool = False,
    encoding: str = "utf-8",
) -> DataFrame:
    """(shard_id, codec, line_no, text, error) — the SINGLE-PASS
    kernel: every shard decodes exactly once; good shards fan out to
    line rows (``error`` NULL), undecodable shards yield exactly one
    quarantine row (``line_no``/``text`` NULL, ``error`` = verbatim
    exception).  ``strict=True`` raises on the first bad shard
    instead (fixture/audit mode).

    This is the frame to WRITE: land it in parquet once (decode cost
    paid once — the whole point at corpus scale, where each shard is
    an unsplittable stream) and take the clean/quarantine views with
    one partition-prunable filter each.  :func:`decompress_text_shards`
    and :func:`read_compressed_shards` are those views; materializing
    BOTH from an unwritten, unpersisted union runs the decode twice —
    fine for tests, wrong for a 100 TB pass."""
    has_codec_col = "codec" in df.columns
    if not has_codec_col and codec is None:
        raise ValueError("pass codec= or include a 'codec' column")
    src = df.select(
        F.col("shard_id").cast("long").alias("shard_id"),
        (F.col("codec") if has_codec_col else F.lit(codec)).alias("codec"),
        F.col("payload"),
    )

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            sid_out: list[int] = []
            codec_out: list[str] = []
            no_out: list[object] = []
            text_out: list[object] = []
            err_out: list[object] = []
            for sid, cdc, payload in zip(
                pdf["shard_id"], pdf["codec"], pdf["payload"]
            ):
                try:
                    raw = decompress_bytes(
                        cdc, bytes(payload) if payload is not None else b"",
                        max_bytes,
                    )
                    lines = split_lines(raw.decode(encoding))
                except Exception as e:  # noqa: BLE001 — verbatim to audit
                    if strict:
                        raise
                    sid_out.append(int(sid))
                    codec_out.append(cdc)
                    no_out.append(None)
                    text_out.append(None)
                    err_out.append(f"{type(e).__name__}: {e}")
                    continue
                for i, line in enumerate(lines, start=1):
                    sid_out.append(int(sid))
                    codec_out.append(cdc)
                    no_out.append(i)
                    text_out.append(line)
                    err_out.append(None)
            yield pd.DataFrame(
                {
                    "shard_id": pd.Series(sid_out, dtype="int64"),
                    "codec": pd.Series(codec_out, dtype="object"),
                    "line_no": pd.Series(no_out, dtype="Int32"),
                    "text": pd.Series(text_out, dtype="object"),
                    "error": pd.Series(err_out, dtype="object"),
                }
            )

    return src.mapInPandas(run, UNION_SCHEMA)


def decompress_text_shards(
    df: DataFrame,
    codec: str | None = None,
    max_bytes: int = 1 << 30,
    strict: bool = True,
    encoding: str = "utf-8",
) -> DataFrame:
    """(shard_id, codec, line_no, text) — one row per line of every
    shard's decompressed payload.

    ``df`` carries ``(shard_id long, payload binary)`` plus an optional
    per-shard ``codec`` string column; a uniform corpus can instead
    pass ``codec=`` once.  ``strict=True`` raises on the first
    undecodable shard; ``strict=False`` skips it (use
    :func:`read_compressed_shards` to also get the quarantine frame,
    or :func:`decode_shards_union` to pay the decode exactly once).

    One Arrow-batched ``mapInPandas`` pass; the payload column dies
    here."""
    union = decode_shards_union(
        df, codec=codec, max_bytes=max_bytes, strict=strict, encoding=encoding
    )
    return union.filter(F.col("error").isNull()).drop("error")


def read_compressed_shards(
    df: DataFrame,
    codec: str | None = None,
    max_bytes: int = 1 << 30,
    encoding: str = "utf-8",
) -> tuple[DataFrame, DataFrame]:
    """(lines, quarantine) — the non-strict front door: good shards
    yield their lines, undecodable shards land in the quarantine frame
    with the exception text (same contract as the CSV/JSONL sources —
    no silent loss).  Both are filter views of ONE
    :func:`decode_shards_union` kernel; at corpus scale, write that
    union once and filter from storage — materializing both views
    straight off this call decodes every shard twice."""
    union = decode_shards_union(
        df, codec=codec, max_bytes=max_bytes, strict=False, encoding=encoding
    )
    lines = union.filter(F.col("error").isNull()).drop("error")
    quarantine = union.filter(F.col("error").isNotNull()).select(
        "shard_id", "codec", "error"
    )
    return lines, quarantine
