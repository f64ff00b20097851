"""Multimodal column plumbing — image/audio/video as opaque binary.

Pattern for 100 TB multimodal training pipelines: payloads ride as
``binary`` columns with typed metadata next to them; decode / feature
extraction runs in Arrow-batched ``mapInPandas`` so bytes cross the
JVM↔Python boundary once per batch, never per row, and the pipeline
stays a single narrow stage (no shuffle).

Codec status: these formats decode FOR REAL with no external
dependency — PPM P6 pixels (:func:`decode_ppm`), BMP BI_RGB 24/32-bit
pixels (:func:`decode_bmp`), WAV PCM16 samples (:func:`decode_wav`),
and PNG 8-bit gray/RGB/RGBA with all five scanline filters
(:func:`decode_png` — DEFLATE via stdlib ``zlib``) — feeding
:func:`extract_media_features` end to end.  Codecs that genuinely
need external libraries (JPEG/H.264/AAC) raise
``NotImplementedError`` unless a deterministic fake is requested; the
Spark-side plumbing — schema, batching, partitioning, UDF signature —
is identical for both paths.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("source_uri", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("sha_prefix", StringType()),
    ]
)


def sniff_format(payload: bytes | None) -> str:
    if not payload:
        return "empty"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


def png_dims(payload: bytes) -> tuple[int, int] | None:
    """PNG IHDR width/height — a real, dependency-free header decode."""
    if len(payload) >= 24 and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return w, h
    return None


# IHDR color type -> channel count of the DECODED image (RFC 2083 §4.1.1;
# palette (3) expands to RGB)
_PNG_COLOR_CHANNELS = {0: 1, 2: 3, 3: 3, 4: 2, 6: 4}


def png_channels(payload: bytes) -> int | None:
    """Channel count from the IHDR color type (ADVICE r5: the
    header-only fallback used to hardcode 3, misreporting grayscale /
    RGBA degradations); None when the header is absent or the color
    type is out of spec."""
    if len(payload) >= 26 and payload[12:16] == b"IHDR":
        return _PNG_COLOR_CHANNELS.get(payload[25])
    return None


def decode_ppm(payload: bytes):
    """REAL pixel decode of binary PPM (P6, maxval ≤ 255) — no external
    dependency.  Returns ``(width, height, ndarray[h, w, 3] uint8)``.

    P6 grammar: ``P6`` then whitespace-separated width, height, maxval
    (with ``#`` comments allowed between tokens), one whitespace byte,
    then ``3*w*h`` raw RGB bytes.
    """
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    need = 3 * w * h
    raw = payload[pos : pos + need]
    if len(raw) != need:
        raise ValueError(f"truncated PPM: need {need} bytes, got {len(raw)}")
    return w, h, np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def decode_png(payload: bytes):
    """REAL pixel decode of PNG — stdlib-only (``zlib`` is the whole
    dependency: PNG's IDAT stream is DEFLATE).  Returns
    ``(width, height, ndarray[h, w, ch] uint8)``.

    Supported: 8-bit depth, color types 0 (gray, ch=1), 2 (RGB, ch=3),
    6 (RGBA, ch=4), interlace 0, with ALL FIVE scanline filters
    (None/Sub/Up/Average/Paeth, RFC 2083 §6) unfiltered exactly.
    Ancillary chunks are skipped; multiple IDAT chunks concatenate
    (they are one zlib stream split arbitrarily).  16-bit, palette,
    and Adam7 payloads raise — honest gates, not silent wrong answers.
    """
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(payload):
        ln = struct.unpack(">I", payload[pos : pos + 4])[0]
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data[:13])
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # length + type + data + crc
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    nch = {0: 1, 2: 3, 6: 4}.get(ctype)
    if depth != 8 or nch is None or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"only 8-bit gray/RGB/RGBA non-interlaced PNG supported "
            f"(depth={depth}, color_type={ctype}, interlace={interlace})"
        )
    if not idat:
        raise ValueError("missing IDAT")
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if len(raw) != (stride + 1) * h:
        raise ValueError(
            f"bad scanline data: need {(stride + 1) * h} bytes, got {len(raw)}"
        )
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    at = 0
    for y in range(h):
        ftype = raw[at]
        cur = np.frombuffer(raw, np.uint8, stride, at + 1).copy()
        at += stride + 1
        if ftype == 0:  # None
            pass
        elif ftype == 2:  # Up — vectorized (uint8 addition wraps mod 256)
            cur += prev
        elif ftype == 1:  # Sub == per-channel cumulative sum (mod 256):
            # accumulate in uint8 so the wrap IS the mod — fully
            # vectorized, no per-byte Python
            cur = np.add.accumulate(
                cur.reshape(w, nch), axis=0, dtype=np.uint8
            ).reshape(stride)
        elif ftype == 3:  # Average — x-sequential; plain-int lists keep
            # the loop free of numpy scalar boxing
            c_ = cur.tolist()
            p_ = prev.tolist()
            for x in range(stride):
                a = c_[x - nch] if x >= nch else 0
                c_[x] = (c_[x] + ((a + p_[x]) >> 1)) & 0xFF
            cur = np.asarray(c_, dtype=np.uint8)
        elif ftype == 4:  # Paeth — x-sequential, same de-boxed loop
            c_ = cur.tolist()
            p_ = prev.tolist()
            for x in range(stride):
                a = c_[x - nch] if x >= nch else 0
                b = p_[x]
                cc = p_[x - nch] if x >= nch else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                c_[x] = (c_[x] + pred) & 0xFF
            cur = np.asarray(c_, dtype=np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur
        prev = out[y]
    return w, h, out.reshape(h, w, nch)


def encode_png(px, filters: list[int] | None = None) -> bytes:
    """Encode ``ndarray[h, w, ch] uint8`` (ch ∈ {1, 3, 4}) as a valid
    PNG — the fixture-side inverse of :func:`decode_png`, stdlib-only.

    ``filters`` optionally fixes the per-row filter type (default all
    0); passing varied types makes a fixture that exercises every
    unfilter path in the decoder — the point of the q212 audit.
    """
    import zlib

    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    h, w, nch = px.shape
    ctype = {1: 0, 3: 2, 4: 6}[nch]
    stride = w * nch
    flat = px.reshape(h, stride).astype(np.int64)
    lines = bytearray()
    for y in range(h):
        f = filters[y % len(filters)] if filters else 0
        cur = flat[y]
        up = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
        left = np.concatenate([np.zeros(nch, dtype=np.int64), cur[:-nch]])
        ul = np.concatenate([np.zeros(nch, dtype=np.int64), up[:-nch]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - up
        elif f == 3:
            enc = cur - ((left + up) >> 1)
        elif f == 4:
            p = left + up - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
            )
            enc = cur - pred
        else:
            raise ValueError(f"unknown filter {f}")
        lines.append(f)
        lines.extend((enc & 0xFF).astype(np.uint8).tobytes())

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def decode_bmp(payload: bytes):
    """REAL pixel decode of uncompressed BMP (BITMAPINFOHEADER, BI_RGB,
    24- or 32-bit) — no external dependency.  Returns
    ``(width, height, ndarray[h, w, 3] uint8)`` in top-down RGB order
    (BMP stores BGR bottom-up with rows padded to 4 bytes).
    """
    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack("<I", payload[10:14])[0]
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    w, h_signed = struct.unpack("<ii", payload[18:26])
    bpp = struct.unpack("<H", payload[28:30])[0]
    compression = struct.unpack("<I", payload[30:34])[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"only BI_RGB 24/32-bit supported (bpp={bpp})")
    h = abs(h_signed)
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3
    need = stride * h
    raw = payload[data_off : data_off + need]
    if len(raw) != need:
        raise ValueError(f"truncated BMP: need {need} bytes, got {len(raw)}")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    px = rows[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    if h_signed > 0:  # bottom-up storage → flip to top-down
        px = px[::-1]
    return w, h, px[:, :, 2::-1].copy()  # BGR(A) → RGB


def decode_wav(payload: bytes):
    """REAL sample decode of RIFF/WAVE PCM16 — no external dependency.
    Returns ``(sample_rate, n_channels, ndarray[int16] interleaved)``.

    Walks RIFF chunks (tolerating extra chunks like LIST before data),
    supports format 1 (PCM) at 16 bits/sample.
    """
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = channels = bits = None
    samples = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt_tag != 1 or bits != 16:
                raise ValueError(
                    f"only PCM16 supported (fmt={fmt_tag}, bits={bits})"
                )
        elif cid == b"data":
            samples = np.frombuffer(body[: len(body) & ~1], dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, channels, samples


def decode_image_meta(payload: bytes, deterministic_fake: bool = True):
    """Header-level decode; full pixel decode is environment-gated.

    With ``deterministic_fake`` (the default in this container), unknown
    dimensions are derived from a stable hash of the payload so
    downstream plumbing (resize planning, batch shaping) is testable.
    Set it False to get the production behavior: raise until a real
    codec (PIL / libvips) is installed.
    """
    fmt = sniff_format(payload)
    if fmt == "png":
        dims = png_dims(payload)
        if dims:
            return fmt, dims[0], dims[1]
    if fmt == "ppm":
        w, h, _ = decode_ppm(payload)
        return fmt, w, h
    if fmt == "bmp":
        w, h, _ = decode_bmp(payload)
        return fmt, w, h
    if deterministic_fake:
        import hashlib

        h = int.from_bytes(hashlib.md5(payload or b"").digest()[:4], "big")
        return fmt, 64 + h % 1920, 64 + (h >> 8) % 1080
    raise NotImplementedError(
        "full image decode requires PIL/libvips — not present in this "
        "environment; plumbing is real, codec is stubbed"
    )


def extract_media_meta(df: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column.

    One ``mapInPandas`` pass: per input batch of N rows the payload
    bytes move JVM→Python once; output is the compact DECODED_SCHEMA
    (payload dropped — never carry blobs past the stage that needs
    them).
    """

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import hashlib

        import pandas as pd

        for pdf in batches:
            fmts, ws, hs, nb, shas = [], [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                fmt, w, h = decode_image_meta(b, deterministic_fake)
                fmts.append(fmt)
                ws.append(w)
                hs.append(h)
                nb.append(len(b))
                shas.append(hashlib.sha256(b).hexdigest()[:12])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": fmts,
                    "width": ws,
                    "height": hs,
                    "n_bytes": nb,
                    "sha_prefix": shas,
                }
            )

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),      # images; NULL for audio
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),   # RGB=3 / wav channels
        StructField("n_values", LongType()),      # pixels*3 or samples
        StructField("mean_val", DoubleType()),
        StructField("min_val", IntegerType()),
        StructField("max_val", IntegerType()),
        StructField("sample_rate", IntegerType()),  # audio; NULL for images
    ]
)


def extract_media_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """END-TO-END content feature extraction: REAL pixel/sample decode
    for the dependency-free formats (PPM P6, BMP BI_RGB, WAV PCM16,
    PNG 8-bit via stdlib zlib), header-only dims for undecodable PNG
    variants, NULL stats for codec-gated formats (JPEG/MP4 — raise
    instead when ``strict=True``).

    Same 100 TB shape as :func:`extract_media_meta`: one Arrow-batched
    ``mapInPandas`` pass, payload crosses the JVM↔Python boundary once
    per batch and is dropped from the output (never carry blobs past
    the stage that consumes them).
    """

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        def feats(payload):
            b = bytes(payload) if payload is not None else b""
            fmt = sniff_format(b)
            w = h = ch = nv = mean = mn = mx = rate = None
            if fmt == "ppm" or fmt == "bmp":
                w, h, px = (decode_ppm if fmt == "ppm" else decode_bmp)(b)
                flat = px.reshape(-1).astype(np.int64)
                ch, nv = 3, int(flat.size)
                mean = float(flat.mean()) if nv else None
                mn, mx = (int(flat.min()), int(flat.max())) if nv else (None, None)
            elif fmt == "wav":
                rate, ch, samples = decode_wav(b)
                s = samples.astype(np.int64)
                nv = int(s.size)
                mean = float(s.mean()) if nv else None
                mn, mx = (int(s.min()), int(s.max())) if nv else (None, None)
            elif fmt == "png":
                import zlib as _zlib

                try:
                    w, h, px = decode_png(b)
                    flat = px.reshape(-1).astype(np.int64)
                    ch, nv = int(px.shape[2]), int(flat.size)
                    mean = float(flat.mean()) if nv else None
                    mn, mx = (
                        (int(flat.min()), int(flat.max())) if nv else (None, None)
                    )
                except (ValueError, _zlib.error, struct.error):
                    # undecodable variant (16-bit / palette / Adam7),
                    # corrupt DEFLATE stream, truncated header, or a
                    # header-only payload: dims from IHDR, no stats
                    if strict:
                        raise
                    dims = png_dims(b)
                    if dims:
                        w, h, ch = dims[0], dims[1], png_channels(b)
            elif strict:
                raise NotImplementedError(
                    f"decode of {fmt!r} needs a codec library (PIL/ffmpeg) "
                    "not present in this environment"
                )
            return fmt, w, h, ch, nv, mean, mn, mx, rate

        for pdf in batches:
            cols = list(zip(*(feats(p) for p in pdf["payload"]))) or [[]] * 9
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": cols[0],
                    "width": cols[1],
                    "height": cols[2],
                    "channels": cols[3],
                    "n_values": cols[4],
                    "mean_val": cols[5],
                    "min_val": cols[6],
                    "max_val": cols[7],
                    "sample_rate": cols[8],
                }
            )

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


def plan_frame_samples(
    media: DataFrame,
    fps: float = 1.0,
    duration_col: str = "duration_us",
    id_col: str = "media_id",
) -> DataFrame:
    """Frame-sampling plan for video payloads: one row per
    (media_id, frame_idx, ts_us) at ``fps`` frames/second — pure
    Catalyst (sequence + explode), no Python.

    This is the fan-out half of video ingestion: the plan rows are what
    a decode fleet consumes (each row = one seek+decode task), so
    partitioning the PLAN spreads decode work independently of how the
    source files are laid out.  Feed the result to
    :func:`extract_frame_stub` for the (stubbed) decode itself.
    """
    step_us = int(1_000_000 / fps)
    n_frames = (F.col(duration_col) / F.lit(step_us)).cast("long") + F.lit(1)
    return (
        media.select(
            F.col(id_col).alias("media_id"),
            F.explode(
                F.sequence(F.lit(0), n_frames - F.lit(1))
            ).alias("frame_idx"),
        )
        .withColumn("ts_us", F.col("frame_idx") * F.lit(step_us))
    )


def extract_frame_stub(
    plan: DataFrame, deterministic_fake: bool = True
) -> DataFrame:
    """Arrow-batched frame extraction over a :func:`plan_frame_samples`
    plan — the mapInPandas shape is real (batch in, compact features
    out); the codec is honestly stubbed (no video libs in this
    sandbox): deterministic fake features derived from (media_id,
    frame_idx), or NotImplementedError when a real decode is demanded.
    """

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import hashlib

        import pandas as pd

        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real video decode needs a codec library (PyAV/ffmpeg) "
                    "not present in this environment"
                )
            feats = [
                int(hashlib.md5(f"{m}|{i}".encode()).hexdigest()[:8], 16)
                for m, i in zip(pdf["media_id"], pdf["frame_idx"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    "ts_us": pdf["ts_us"],
                    "feature_hash": feats,
                }
            )

    return plan.mapInPandas(
        run,
        schema="media_id string, frame_idx long, ts_us long, feature_hash long",
    )


def probe_batch_shapes(df: DataFrame, payload_col: str | None = "payload") -> DataFrame:
    """Diagnostic: one output row PER ARROW BATCH entering ``mapInPandas``
    — ``(batch_rows, batch_payload_bytes)``.

    This is how you validate decode-fleet batch sizing before burning
    GPU hours: batch row counts are governed by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` (default 10k), but
    for multimodal BYTES per batch is what sizes worker memory — a 10k
    batch of 4 MB images is 40 GB in flight.  Tune maxRecordsPerBatch
    so ``batch_payload_bytes`` fits the decode worker's budget; the
    shape probe costs one narrow pass, no shuffle.
    """

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            nbytes = 0
            if payload_col is not None and payload_col in pdf.columns:
                nbytes = int(
                    sum(0 if p is None else len(p) for p in pdf[payload_col])
                )
            yield pd.DataFrame(
                {"batch_rows": [len(pdf)], "batch_payload_bytes": [nbytes]}
            )

    return df.mapInPandas(run, schema="batch_rows long, batch_payload_bytes long")


def plan_resize_batches(meta: DataFrame, target_pixels: int = 256 * 256) -> DataFrame:
    """Pure-Catalyst post-processing of decoded metadata: bucket media by
    resize work (pixels/target ratio) so heavy items spread evenly —
    the partition-balancing step that precedes a real GPU decode fleet."""
    ratio = (F.col("width") * F.col("height")) / F.lit(target_pixels)
    return meta.withColumn("resize_ratio", F.round(ratio, 3)).withColumn(
        "work_bucket",
        F.when(ratio <= 1, "noop").when(ratio <= 4, "small").otherwise("large"),
    )
