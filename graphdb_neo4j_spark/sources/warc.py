"""WARC / WET record source (ISO 28500) — the container web-scale
text corpora actually ship in.

A Common-Crawl shard is a gzip stream of concatenated members, one
WARC record per member; each record is a ``WARC/1.x`` version line,
CRLF-delimited named headers, a blank line, exactly
``Content-Length`` payload bytes, and a two-CRLF trailer.  WET
("conversion") records carry extracted plain text — the direct input
to a curation pipeline.  This module parses that, composed with
:mod:`graphdb_neo4j_spark.sources.compressed` for the decompression
(multi-member loop + bomb guard).

Semantics pinned by tests (tests/test_warc_source.py):

* **Content-Length is authoritative** — payload bytes are taken by
  count, never by scanning for a separator, so payloads containing
  ``\\r\\n\\r\\n`` (HTTP responses, nested WARC) parse correctly.
* **header names are case-insensitive** (RFC-822 style); values keep
  their exact bytes, surrounding whitespace stripped.
* **missing optional headers → NULL** columns, never fabricated.
* **strict vs quarantine** — ``strict=True`` raises on the first
  malformed shard; otherwise the shard yields one error row and its
  remaining records are skipped (a broken length field desynchronizes
  the whole stream — resync is guesswork, and guessed records are
  worse than a quarantine row).

100 TB notes: same shape as the compressed source — parallelism =
shard count (gzip members are not independently seekable without the
offset index), one Arrow pass, payload text lands in the output and
the compressed blob dies at the stage.  The right pipeline runs this
once per crawl snapshot into parquet partitioned by language/source,
then everything downstream is columnar.
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

from graphdb_neo4j_spark.sources.compressed import decompress_bytes

if TYPE_CHECKING:  # pragma: no cover
    import pandas

WARC_SCHEMA = StructType(
    [
        StructField("shard_id", LongType()),
        StructField("record_no", IntegerType()),  # 1-based within shard
        StructField("warc_type", StringType()),
        StructField("record_id", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_type", StringType()),
        StructField("content_length", LongType()),
        StructField("text", StringType()),  # payload, utf-8 (replace)
        StructField("error", StringType()),  # quarantine row when set
    ]
)


def parse_warc(data: bytes) -> list[dict]:
    """Parse one decompressed WARC stream into record dicts — version
    line, case-insensitive headers, Content-Length-counted payload,
    two-CRLF trailer.  Raises ``ValueError`` on structural damage
    (anything after which record boundaries are guesswork)."""
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate extra CRLF padding between records
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError("truncated WARC header block")
        head_lines = data[pos:head_end].split(b"\r\n")
        version = head_lines[0]
        if not version.startswith(b"WARC/"):
            raise ValueError(
                f"expected WARC version line, got {version[:20]!r}"
            )
        headers: dict[str, str] = {}
        last_key: str | None = None
        for line in head_lines[1:]:
            if line[:1] in (b" ", b"\t") and last_key is not None:
                # RFC-822-style folded continuation (ISO 28500 §4 allows
                # long values to wrap): append to the previous header
                headers[last_key] += " " + line.strip().decode(
                    "utf-8", "replace"
                )
                continue
            sep = line.find(b":")
            if sep < 0:
                raise ValueError(f"malformed WARC header line {line[:40]!r}")
            last_key = line[:sep].strip().lower().decode("ascii", "replace")
            headers[last_key] = line[sep + 1 :].strip().decode(
                "utf-8", "replace"
            )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("missing or non-integer Content-Length") from None
        body_start = head_end + 4
        if body_start + length > n:
            raise ValueError("payload extends past end of WARC stream")
        payload = data[body_start : body_start + length]
        pos = body_start + length
        if data[pos : pos + 4] != b"\r\n\r\n" and pos != n:
            raise ValueError("missing two-CRLF record trailer")
        pos += 4
        records.append(
            {
                "warc_type": headers.get("warc-type"),
                "record_id": headers.get("warc-record-id"),
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "content_type": headers.get("content-type"),
                "content_length": length,
                "payload": payload,
            }
        )
    return records


def warc_records(
    df: DataFrame,
    codec: str | None = "gzip",
    max_bytes: int = 1 << 30,
    strict: bool = True,
) -> DataFrame:
    """(shard_id, record_no, warc headers…, content_length, text,
    error) — decompress each shard (``codec=None`` or ``"none"`` for
    already-plain payloads; a ``codec`` column overrides) and parse
    its WARC records in the SAME Arrow pass.

    Good shards fan out to record rows (``error`` NULL, payload
    decoded utf-8-replace into ``text``); a malformed shard yields one
    quarantine row (``error`` = verbatim exception) unless
    ``strict=True``, which raises.  Filter ``error IS NULL`` for the
    clean frame — or write this union once and filter from storage,
    exactly like :func:`~graphdb_neo4j_spark.sources.compressed.decode_shards_union`."""
    has_codec_col = "codec" in df.columns
    eff_codec = codec if codec is not None else "none"
    src = df.select(
        F.col("shard_id").cast("long").alias("shard_id"),
        (F.col("codec") if has_codec_col else F.lit(eff_codec)).alias("codec"),
        F.col("payload"),
    )

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:
        import pandas as pd

        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            rows: list[tuple] = []
            for sid, cdc, payload in zip(
                pdf["shard_id"], pdf["codec"], pdf["payload"]
            ):
                sid = int(sid)
                try:
                    raw = decompress_bytes(
                        cdc, bytes(payload) if payload is not None else b"",
                        max_bytes,
                    )
                    recs = parse_warc(raw)
                except Exception as e:  # noqa: BLE001 — verbatim to audit
                    if strict:
                        raise
                    rows.append(
                        (sid, None, None, None, None, None, None, None, None,
                         f"{type(e).__name__}: {e}")
                    )
                    continue
                for i, r in enumerate(recs, start=1):
                    rows.append(
                        (
                            sid, i, r["warc_type"], r["record_id"],
                            r["target_uri"], r["warc_date"], r["content_type"],
                            r["content_length"],
                            r["payload"].decode("utf-8", "replace"),
                            None,
                        )
                    )
            out = pd.DataFrame(rows, columns=cols)
            out["shard_id"] = out["shard_id"].astype("int64")
            out["record_no"] = out["record_no"].astype("Int32")
            out["content_length"] = out["content_length"].astype("Int64")
            yield out

    return src.mapInPandas(run, WARC_SCHEMA)


def build_warc(records: list[dict]) -> bytes:
    """Fixture-side inverse of :func:`parse_warc`: serialize record
    dicts (``warc_type``, ``target_uri``, optional ``record_id`` /
    ``warc_date`` / ``content_type``, ``payload`` bytes) to a valid
    WARC stream."""
    out = bytearray()
    for r in records:
        payload = r["payload"]
        head = [b"WARC/1.0"]
        pairs = [
            ("WARC-Type", r.get("warc_type")),
            ("WARC-Record-ID", r.get("record_id")),
            ("WARC-Date", r.get("warc_date")),
            ("WARC-Target-URI", r.get("target_uri")),
            ("Content-Type", r.get("content_type")),
            ("Content-Length", str(len(payload))),
        ]
        for k, v in pairs:
            if v is not None:
                head.append(f"{k}: {v}".encode())
        out += b"\r\n".join(head) + b"\r\n\r\n" + bytes(payload) + b"\r\n\r\n"
    return bytes(out)
