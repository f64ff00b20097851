"""Multimodal plumbing tests: schema, Arrow batching, header decode."""

from __future__ import annotations

import struct
import zlib

import pytest
from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators.multimodal import (
    DECODED_SCHEMA,
    MEDIA_SCHEMA,
    extract_media_meta,
    plan_resize_batches,
    sniff_format,
)


def make_png(w: int, h: int) -> bytes:
    ihdr = struct.pack(">II", w, h) + b"\x08\x06\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", make_png(640, 480), "image/png", "s3://x/1.png"),
        (2, "image", b"\xff\xd8\xff\xe0fakejpeg", "image/jpeg", "s3://x/2.jpg"),
        (3, "audio", b"RIFF\x00\x00\x00\x00WAVEfmt ", "audio/wav", "s3://x/3.wav"),
        (4, "video", b"\x00\x00\x00 ftypisom", "video/mp4", "s3://x/4.mp4"),
        (5, "image", None, "image/png", "s3://x/5.png"),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_sniff_format():
    assert sniff_format(make_png(1, 1)) == "png"
    assert sniff_format(b"\xff\xd8\xff\xe0") == "jpeg"
    assert sniff_format(None) == "empty"
    assert sniff_format(b"garbage") == "unknown"


def test_extract_media_meta_schema_and_real_png_dims(spark, media):
    meta = extract_media_meta(media)
    assert meta.schema == DECODED_SCHEMA
    rows = {r.media_id: r for r in meta.collect()}
    assert rows[1].format == "png"
    assert (rows[1].width, rows[1].height) == (640, 480)  # real header decode
    assert rows[3].format == "wav"
    assert rows[4].format == "mp4"
    assert rows[5].n_bytes == 0
    # deterministic fake: same payload → same dims across runs
    again = {r.media_id: r for r in extract_media_meta(media).collect()}
    assert all(
        (rows[i].width, rows[i].height) == (again[i].width, again[i].height)
        for i in rows
    )


def test_decode_raises_without_fake(spark, media):
    from graphdb_neo4j_spark.operators.multimodal import decode_image_meta

    with pytest.raises(NotImplementedError):
        decode_image_meta(b"\xff\xd8\xff\xe0fakejpeg", deterministic_fake=False)


def test_plan_resize_batches(spark, media):
    planned = plan_resize_batches(extract_media_meta(media))
    buckets = {r.media_id: r.work_bucket for r in planned.collect()}
    assert buckets[1] == "large"  # 640*480 = 4.7x target 256*256
    assert set(buckets.values()) <= {"noop", "small", "large"}


def test_frame_sampling_plan_and_stub(spark):
    from graphdb_neo4j_spark.operators.multimodal import (
        extract_frame_stub,
        plan_frame_samples,
    )

    media = spark.createDataFrame(
        [("vid1", 3_500_000), ("vid2", 0), ("vid3", 1_000_000)],
        "media_id string, duration_us long",
    )
    plan = plan_frame_samples(media, fps=1.0)
    rows = {(r.media_id, r.frame_idx, r.ts_us) for r in plan.collect()}
    # 3.5s at 1 fps → frames at 0,1,2,3s; 0s → single frame at 0
    assert {(m, i) for m, i, _ in rows if m == "vid1"} == {("vid1", j) for j in range(4)}
    assert ("vid2", 0, 0) in rows
    assert ("vid3", 1, 1_000_000) in rows

    feats = extract_frame_stub(plan).collect()
    assert len(feats) == len(rows)
    by_key = {(r.media_id, r.frame_idx): r.feature_hash for r in feats}
    # deterministic: same key → same fake feature on recompute
    feats2 = extract_frame_stub(plan).collect()
    assert {(r.media_id, r.frame_idx): r.feature_hash for r in feats2} == by_key

    import pytest as _pt
    with _pt.raises(Exception):
        extract_frame_stub(plan, deterministic_fake=False).collect()


def test_probe_batch_shapes_respects_arrow_batch_size(spark):
    """Arrow batch row counts follow maxRecordsPerBatch, and the probe
    reports payload bytes per batch (the decode-fleet sizing input)."""
    from graphdb_neo4j_spark.operators.multimodal import probe_batch_shapes

    n, payload = 1000, b"x" * 100
    df = spark.range(n).select(
        F.col("id").alias("media_id"), F.lit(payload).alias("payload")
    ).coalesce(1)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
        shapes = probe_batch_shapes(df).collect()
        rows = [r.batch_rows for r in shapes]
        assert sum(rows) == n
        # 1000 rows / 128 per batch -> 8 batches, all but last full
        assert len(rows) == 8
        assert all(r == 128 for r in rows[:-1]) and rows[-1] == n % 128
        assert all(
            r.batch_payload_bytes == r.batch_rows * len(payload) for r in shapes
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_media_parquet_prunes_payload_and_pushes_filters(spark, media, tmp_path):
    """The 100 TB contract for multimodal tables: a metadata-only query
    over the media parquet must NOT read the payload bytes (column
    pruning) and must push the kind filter to the scan."""
    p = str(tmp_path / "media")
    media.write.parquet(p)
    q = (
        spark.read.parquet(p)
        .filter(F.col("kind") == "image")
        .select("media_id", "mime")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan.split("ReadSchema")[1][:200]
    assert "PushedFilters: [" in plan and "kind" in plan.split("PushedFilters")[1][:80]
    assert {r.media_id for r in q.collect()} == {1, 2, 5}


# -- real dependency-free codecs (PPM / BMP / WAV) --------------------------

def make_ppm(w: int, h: int, rgb=(10, 200, 30)) -> bytes:
    header = f"P6\n# planted fixture\n{w} {h}\n255\n".encode()
    return header + bytes(rgb) * (w * h)


def make_bmp(w: int, h: int, bgr=(30, 200, 10)) -> bytes:
    stride = (w * 3 + 3) & ~3
    pad = stride - w * 3
    pixel_data = (bytes(bgr) * w + b"\x00" * pad) * h
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data),
                       2835, 2835, 0, 0)
    off = 14 + 40
    file_hdr = b"BM" + struct.pack("<IHHI", off + len(pixel_data), 0, 0, off)
    return file_hdr + info + pixel_data


def make_wav(rate: int, samples: list[int], channels: int = 1) -> bytes:
    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_ppm_real_pixels():
    from graphdb_neo4j_spark.operators.multimodal import decode_ppm

    w, h, px = decode_ppm(make_ppm(4, 3))
    assert (w, h) == (4, 3) and px.shape == (3, 4, 3)
    assert px[0, 0].tolist() == [10, 200, 30]


def test_decode_bmp_real_pixels_bottom_up_bgr():
    from graphdb_neo4j_spark.operators.multimodal import decode_bmp

    w, h, px = decode_bmp(make_bmp(5, 2))  # stride pad = 1 byte per row
    assert (w, h) == (5, 2) and px.shape == (2, 5, 3)
    assert px[0, 0].tolist() == [10, 200, 30]  # BGR→RGB swapped


def test_decode_wav_real_samples():
    from graphdb_neo4j_spark.operators.multimodal import decode_wav

    rate, ch, s = decode_wav(make_wav(8000, [0, 100, -100, 32767]))
    assert (rate, ch) == (8000, 1)
    assert s.tolist() == [0, 100, -100, 32767]


def test_extract_media_features_end_to_end(spark):
    """Real bytes planted in the media table decode through the Arrow
    batch path: exact pixel/sample statistics, payload dropped."""
    from graphdb_neo4j_spark.operators.multimodal import (
        FEATURES_SCHEMA,
        extract_media_features,
    )

    rows = [
        (1, "image", make_ppm(4, 3), "image/x-ppm", "s3://x/1.ppm"),
        (2, "image", make_bmp(5, 2), "image/bmp", "s3://x/2.bmp"),
        (3, "audio", make_wav(8000, [0, 100, -100, 32767]), "audio/wav",
         "s3://x/3.wav"),
        (4, "image", make_png(640, 480), "image/png", "s3://x/4.png"),
        (5, "video", b"\x00\x00\x00 ftypisom", "video/mp4", "s3://x/5.mp4"),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_media_features(df)
    assert out.schema == FEATURES_SCHEMA
    got = {r.media_id: r for r in out.collect()}
    ppm = got[1]
    assert (ppm.format, ppm.width, ppm.height, ppm.channels) == ("ppm", 4, 3, 3)
    assert ppm.n_values == 36 and ppm.min_val == 10 and ppm.max_val == 200
    assert abs(ppm.mean_val - (10 + 200 + 30) / 3) < 1e-9
    bmp = got[2]
    assert (bmp.format, bmp.width, bmp.height) == ("bmp", 5, 2)
    assert bmp.min_val == 10 and bmp.max_val == 200
    wav = got[3]
    assert (wav.format, wav.sample_rate, wav.channels) == ("wav", 8000, 1)
    assert wav.n_values == 4 and wav.min_val == -100 and wav.max_val == 32767
    assert abs(wav.mean_val - (0 + 100 - 100 + 32767) / 4) < 1e-9
    png = got[4]
    assert (png.format, png.width, png.height) == ("png", 640, 480)
    assert png.n_values is None  # header-only: no pixel stats
    assert got[5].format == "mp4" and got[5].n_values is None


def test_extract_media_features_strict_raises(spark):
    from pyspark.errors.exceptions.captured import PythonException

    from graphdb_neo4j_spark.operators.multimodal import extract_media_features

    df = spark.createDataFrame(
        [(1, "video", b"\x00\x00\x00 ftypisom", "video/mp4", "u")], MEDIA_SCHEMA
    )
    with pytest.raises(PythonException, match="codec library"):
        extract_media_features(df, strict=True).collect()


def test_png_roundtrip_all_filters_and_channels():
    """decode_png must invert encode_png exactly for every scanline
    filter (None/Sub/Up/Average/Paeth) and channel count (gray/RGB/
    RGBA) — the DEFLATE stream is stdlib zlib, so this is a REAL
    compressed-codec round-trip with no external dependency."""
    import numpy as np

    from graphdb_neo4j_spark.operators.multimodal import (
        decode_png,
        encode_png,
        sniff_format,
    )

    rng = np.random.RandomState(7)
    for nch in (1, 3, 4):
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            px = rng.randint(0, 256, size=(11, 7, nch), dtype=np.uint8)
            blob = encode_png(px, filters=filters)
            assert sniff_format(blob) == "png"
            w, h, out = decode_png(blob)
            assert (w, h) == (7, 11)
            assert np.array_equal(out, px), (nch, filters)


def test_png_full_ihdr_matrix_roundtrip():
    """EVERY legal IHDR combination decodes exactly: channel counts
    1/2/3/4, bit depths 8 and 16, interlace 0 and Adam7, with the
    filter cycle exercising all five unfilter paths per pass."""
    import numpy as np

    from graphdb_neo4j_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.RandomState(11)
    fil = [0, 1, 2, 3, 4]
    for nch in (1, 2, 3, 4):
        for il in (0, 1):
            px8 = rng.randint(0, 256, size=(13, 11, nch), dtype=np.uint8)
            w, h, out = decode_png(encode_png(px8, filters=fil, interlace=il))
            assert out.dtype == np.uint8 and np.array_equal(out, px8), (nch, il)
            px16 = rng.randint(0, 65536, size=(9, 7, nch)).astype(np.uint16)
            w, h, out = decode_png(
                encode_png(px16, depth=16, filters=fil, interlace=il)
            )
            assert out.dtype == np.uint16 and np.array_equal(out, px16), (
                nch, il, 16,
            )


def test_png_subbyte_gray_exact_scaling():
    """Gray at depths 1/2/4 scales raw samples by the EXACT integer
    factor 255/(2^d−1) ∈ {255, 85, 17} — deterministic full-range
    expansion, both sequential and Adam7."""
    import numpy as np

    from graphdb_neo4j_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.RandomState(3)
    for d in (1, 2, 4):
        px = rng.randint(0, 1 << d, size=(10, 9, 1)).astype(np.uint8)
        for il in (0, 1):
            w, h, out = decode_png(
                encode_png(px, depth=d, filters=[0, 1, 2, 3, 4], interlace=il)
            )
            assert np.array_equal(out, px * (255 // ((1 << d) - 1))), (d, il)


def test_png_palette_and_trns():
    """Palette PNGs map indices through PLTE (RGB out); a tRNS chunk
    adds per-entry alpha (RGBA out, entries past the table default
    255).  All palette depths 1/2/4/8, sequential and Adam7."""
    import numpy as np

    from graphdb_neo4j_spark.operators.multimodal import (
        decode_png,
        encode_png_palette,
    )

    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, size=(16, 3)).astype(np.uint8)
    for d in (1, 2, 4, 8):
        n = min(16, 1 << d)
        idx = rng.randint(0, n, size=(12, 10))
        for il in (0, 1):
            w, h, out = decode_png(
                encode_png_palette(
                    idx, pal[:n], depth=d, filters=[0, 1, 2, 3, 4], interlace=il
                )
            )
            assert out.shape == (12, 10, 3)
            assert np.array_equal(out, pal[:n][idx]), (d, il)
            trns = bytes(range(0, n * 10, 10))[: max(1, n // 2)]
            w, h, out = decode_png(
                encode_png_palette(idx, pal[:n], trns=trns, depth=d, interlace=il)
            )
            assert out.shape == (12, 10, 4)
            alpha = np.full(n, 255, np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, np.uint8)
            assert np.array_equal(out[:, :, 3], alpha[idx]), (d, il)


def test_png_adam7_degenerate_dims():
    """Thin/tiny images leave some Adam7 passes empty — they must
    round-trip without phantom scanlines."""
    import numpy as np

    from graphdb_neo4j_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.RandomState(9)
    for shape in ((1, 1, 3), (2, 1, 1), (1, 9, 3), (3, 2, 4), (8, 8, 1)):
        px = rng.randint(0, 256, size=shape, dtype=np.uint8)
        w, h, out = decode_png(encode_png(px, interlace=1, filters=[0, 1, 2, 3, 4]))
        assert np.array_equal(out, px), shape


def test_png_palette_index_out_of_range_raises():
    import numpy as np
    import pytest as _pytest

    from graphdb_neo4j_spark.operators.multimodal import (
        decode_png,
        encode_png_palette,
    )

    # hand-build a stream whose index exceeds the PLTE: encoder refuses,
    # so splice a 2-entry palette onto indices up to 3
    blob = encode_png_palette(
        np.array([[0, 1], [2, 3]]), np.zeros((4, 3), np.uint8), depth=8
    )
    # shrink PLTE chunk from 4 to 2 entries (re-CRC)
    import struct as _struct
    import zlib as _zlib

    at = blob.index(b"PLTE") - 4
    ln = _struct.unpack(">I", blob[at : at + 4])[0]
    data = blob[at + 8 : at + 8 + ln][:6]
    patched = (
        blob[:at]
        + _struct.pack(">I", 6)
        + b"PLTE"
        + data
        + _struct.pack(">I", _zlib.crc32(b"PLTE" + data) & 0xFFFFFFFF)
        + blob[at + 12 + ln :]
    )
    with _pytest.raises(ValueError, match="PLTE range"):
        decode_png(patched)


def test_png_unsupported_variants_raise():
    import struct
    import zlib

    import pytest as _pytest

    from graphdb_neo4j_spark.operators.multimodal import decode_png

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    # depth 16 palette is an ILLEGAL combination (RFC 2083 §4.1.1)
    bad_combo = sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 16, 3, 0, 0, 0))
    with _pytest.raises(ValueError, match="illegal"):
        decode_png(bad_combo)
    # depth 2 RGB likewise
    bad_rgb = sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 2, 2, 0, 0, 0))
    with _pytest.raises(ValueError, match="illegal"):
        decode_png(bad_rgb)
    # palette stream without a PLTE chunk
    no_plte = (
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0))
        + chunk(b"IDAT", b"x")
    )
    with _pytest.raises(ValueError, match="PLTE"):
        decode_png(no_plte)
    header_only = sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
    with _pytest.raises(ValueError, match="IDAT"):
        decode_png(header_only)
    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"garbage")


def test_png_features_through_arrow_kernel(spark):
    """Real PNG pixels (not just header dims) through the mapInPandas
    feature extractor, strict mode."""
    import numpy as np

    from graphdb_neo4j_spark.operators.multimodal import (
        FEATURES_SCHEMA,
        encode_png,
        extract_media_features,
    )

    px = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(3, 4, 3)
    df = spark.createDataFrame(
        [(1, "image", bytearray(encode_png(px, filters=[4])), "image/png", "s3://x/p.png")],
        MEDIA_SCHEMA,
    )
    out = extract_media_features(df, strict=True)
    assert out.schema == FEATURES_SCHEMA
    r = out.collect()[0]
    assert (r.format, r.width, r.height, r.channels) == ("png", 4, 3, 3)
    assert r.n_values == 36 and r.min_val == 0 and r.max_val == 35
    assert abs(r.mean_val - 17.5) < 1e-12


def test_png_corrupt_idat_degrades_not_crashes(spark):
    """A valid PNG signature+IHDR with a corrupt DEFLATE stream must
    degrade to header dims (non-strict) instead of killing the task:
    zlib.error is not a ValueError and needs its own catch."""
    import struct
    import zlib

    from graphdb_neo4j_spark.operators.multimodal import (
        extract_media_features,
    )

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    corrupt = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 9, 7, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", b"\x00not-deflate")
        + chunk(b"IEND", b"")
    )
    df = spark.createDataFrame(
        [(1, "image", bytearray(corrupt), "image/png", "s3://x/c.png")],
        MEDIA_SCHEMA,
    )
    r = extract_media_features(df).collect()[0]
    assert (r.format, r.width, r.height) == ("png", 9, 7)
    assert r.n_values is None  # header-only degradation, no stats


def test_media_features_stream_equals_batch(spark, tmp_path):
    """The Arrow decode kernel is engine-mode-agnostic: running
    extract_media_features over a readStream of the same media parquet
    yields EXACTLY the batch result (the stream≡batch gate every
    streaming operator here carries) — one mapInPandas pass either
    way, payloads dropped at the decode stage."""
    import numpy as np

    from graphdb_neo4j_spark.operators.multimodal import (
        encode_png,
        extract_media_features,
    )

    rows = []
    for mid in range(8):
        px = np.fromfunction(
            lambda y, x, c: (mid * 11 + y * 5 + x * 3 + c * 7) % 256,
            (6 + mid % 3, 5 + mid % 2, 3),
        ).astype(np.uint8)
        rows.append((mid, bytearray(encode_png(px, filters=[mid % 5]))))
    src = str(tmp_path / "media_src")
    spark.createDataFrame(rows, "media_id long, payload binary").write.parquet(src)

    batch = sorted(
        tuple(r)
        for r in extract_media_features(
            spark.read.parquet(src), strict=True
        ).collect()
    )

    stream = spark.readStream.schema("media_id long, payload binary").parquet(src)
    out = str(tmp_path / "media_out")
    q = (
        extract_media_features(stream, strict=True)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "media_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        # awaitTermination returns False on timeout (no exception) — a
        # partial read would produce a confusing diff, so assert it
        assert q.awaitTermination(300), "stream did not finish in 300s"
    finally:
        q.stop()
    streamed = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert streamed == batch and len(batch) == 8


def test_png_fallback_channels_from_color_type(spark):
    """ADVICE r5: the header-only degradation path must report the
    channel count the IHDR color type declares (gray=1, RGBA=4,
    palette=3), not a hardcoded 3."""
    import struct
    import zlib

    from graphdb_neo4j_spark.operators.multimodal import (
        extract_media_features,
        png_channels,
    )

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"

    def png16(color_type):
        # 16-bit depth: undecodable variant -> header-only fallback
        return (
            sig
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 4, 16, color_type, 0, 0, 0))
            + chunk(b"IDAT", b"\x00junk")
            + chunk(b"IEND", b"")
        )

    rows = [
        (0, "image", bytearray(png16(0)), "image/png", "s3://x/gray.png"),
        (2, "image", bytearray(png16(2)), "image/png", "s3://x/rgb.png"),
        (3, "image", bytearray(png16(3)), "image/png", "s3://x/pal.png"),
        (6, "image", bytearray(png16(6)), "image/png", "s3://x/rgba.png"),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r.media_id: r.channels
        for r in extract_media_features(df).collect()
    }
    assert got == {0: 1, 2: 3, 3: 3, 6: 4}
    assert png_channels(b"garbage") is None
    # out-of-spec color type -> None, not a KeyError
    bad = sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 4, 16, 7, 0, 0, 0))
    assert png_channels(bad) is None


# --- JPEG (baseline T.81) ---------------------------------------------


def _block_gray(mid, bw, bh):
    """Block-constant even-valued grayscale image: the analytically
    exact decode class (DC-only blocks, quant divisible by 8)."""
    import numpy as np

    px = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
    for by in range(bh):
        for bx in range(bw):
            px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                2 * ((mid * 7 + by * 5 + bx * 3) % 128)
            )
    return px


def test_jpeg_dc_only_roundtrip_bit_exact():
    import numpy as np

    from graphdb_neo4j_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        jpeg_dims,
    )

    px = _block_gray(3, 3, 2)
    pay = encode_jpeg(px, quant=16)
    w, h, dec = decode_jpeg(pay)
    assert (w, h) == (24, 16)
    assert np.array_equal(dec[:, :, 0], px)
    assert jpeg_dims(pay) == (24, 16, 1)


def test_jpeg_roundtrip_error_bounded_and_crop():
    """Lossy roundtrip stays within quantization error; non-multiple-
    of-8 dims crop exactly (edge-replication padding never leaks)."""
    import numpy as np

    from graphdb_neo4j_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.RandomState(7)
    gray = rng.randint(0, 256, (24, 40), dtype=np.uint8)
    _, _, dec = decode_jpeg(encode_jpeg(gray, quant=4))
    assert np.abs(dec[:, :, 0].astype(int) - gray.astype(int)).max() <= 8

    color = rng.randint(0, 256, (17, 21, 3), dtype=np.uint8)
    w, h, dec3 = decode_jpeg(encode_jpeg(color, quant=2))
    assert (w, h) == (21, 17) and dec3.shape == (17, 21, 3)
    assert np.abs(dec3.astype(int) - color.astype(int)).max() <= 8

    # smooth content at quant=1 decodes exactly (transform+entropy
    # pipeline is lossless when quantization is)
    yy, xx = np.mgrid[0:16, 0:16]
    smooth = np.stack(
        [(yy * 3 + 10) % 200, (xx * 5 + 30) % 200, (yy + xx) % 200], -1
    ).astype(np.uint8)
    _, _, decs = decode_jpeg(encode_jpeg(smooth, quant=1))
    assert np.abs(decs.astype(int) - smooth.astype(int)).max() <= 1


def test_jpeg_idct_matches_spec_direct_form():
    """The decoder's separable IDCT must match the T.81 definition
    computed the slow direct way (O(64^2) per block) on random
    coefficient blocks — implementation-independent spec oracle."""
    import numpy as np

    from graphdb_neo4j_spark.operators.multimodal import _jpeg_dct_matrix

    C = _jpeg_dct_matrix()
    rng = np.random.RandomState(11)
    for _ in range(5):
        S = rng.randint(-512, 512, (8, 8)).astype(np.float64)
        fast = C.T @ S @ C
        direct = np.zeros((8, 8))
        for y in range(8):
            for x in range(8):
                acc = 0.0
                for v in range(8):
                    for u in range(8):
                        cu = 1 / np.sqrt(2) if u == 0 else 1.0
                        cv = 1 / np.sqrt(2) if v == 0 else 1.0
                        acc += (
                            cu * cv * S[v, u]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16)
                        )
                direct[y, x] = acc / 4.0
        assert np.abs(fast - direct).max() < 1e-9


def test_jpeg_420_subsampling_and_restart_markers():
    """Hand-built 4:2:0 two-MCU scan with DRI=1/RST0: four flat Y
    blocks per MCU plus one Cb/Cr block replicated 2x2 — expected RGB
    computed from the JFIF formulas, and the DC predictor must reset
    at the restart marker."""
    import struct as _struct

    import numpy as np

    from graphdb_neo4j_spark.operators.multimodal import (
        _JPEG_AC_BITS,
        _JPEG_AC_VALS,
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        _JpegBitWriter,
        _huffman_encode_table,
        decode_jpeg,
    )

    dc_enc = _huffman_encode_table(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_enc = _huffman_encode_table(_JPEG_AC_BITS, _JPEG_AC_VALS)

    def dc_only_block(writer, diff):
        s = abs(diff).bit_length()
        code, ln = dc_enc[s]
        writer.write(code, ln)
        if s:
            writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        code, ln = ac_enc[0x00]  # EOB
        writer.write(code, ln)

    # MCU layout 4:2:0 — Y x4 then Cb then Cr; quant all-16 so a DC
    # coefficient d decodes to the flat value 2*d + 128
    def mcu(writer, ydiffs, cbdiff, crdiff):
        for d in ydiffs:
            dc_only_block(writer, d)
        dc_only_block(writer, cbdiff)
        dc_only_block(writer, crdiff)

    w1 = _JpegBitWriter()
    # DC DIFFS accumulate through the predictor: DCs 10/20/30/40 ->
    # flat Y values 2*DC + 128 = 148/168/188/208, Cb=Cr=128
    mcu(w1, [10, 10, 10, 10], 0, 0)
    w1.flush()
    w2 = _JpegBitWriter()
    mcu(w2, [5, 5, 5, 5], 0, 0)  # predictors reset: Y = 138/148/158/168
    w2.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + _struct.pack(">H", len(body) + 2) + body

    payload = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes([16] * 64))
        + seg(
            0xC0,
            _struct.pack(">BHHB", 8, 16, 32, 3)  # h=16, w=32 -> 2 MCUs wide
            + bytes([1, 0x22, 0])  # Y 2x2
            + bytes([2, 0x11, 0])  # Cb 1x1
            + bytes([3, 0x11, 0]),  # Cr 1x1
        )
        + seg(
            0xC4,
            bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
            + bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS),
        )
        + seg(0xDD, _struct.pack(">H", 1))  # DRI = 1 MCU
        + seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
        + bytes(w1.out)
        + b"\xff\xd0"  # RST0
        + bytes(w2.out)
        + b"\xff\xd9"
    )
    w, h, px = decode_jpeg(payload)
    assert (w, h) == (32, 16) and px.shape == (16, 32, 3)
    # Cb=Cr=128 -> R=G=B=Y exactly; check each Y block's quadrant
    for (y0, x0), want in [
        ((0, 0), 148), ((0, 8), 168), ((8, 0), 188), ((8, 8), 208),
        ((0, 16), 138), ((0, 24), 148), ((8, 16), 158), ((8, 24), 168),
    ]:
        blk = px[y0 : y0 + 8, x0 : x0 + 8]
        assert np.all(blk == want), (y0, x0, want, np.unique(blk))


def test_jpeg_unsupported_variants_raise():
    import struct as _struct

    import pytest as _pytest

    from graphdb_neo4j_spark.operators.multimodal import decode_jpeg

    def seg(marker, body):
        return bytes([0xFF, marker]) + _struct.pack(">H", len(body) + 2) + body

    progressive = (
        b"\xff\xd8"
        + seg(0xC2, _struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        + b"\xff\xd9"
    )
    with _pytest.raises(ValueError, match="SOF0"):
        decode_jpeg(progressive)
    twelve_bit = (
        b"\xff\xd8"
        + seg(0xC0, _struct.pack(">BHHB", 12, 8, 8, 1) + bytes([1, 0x11, 0]))
        + b"\xff\xd9"
    )
    with _pytest.raises(ValueError, match="8-bit"):
        decode_jpeg(twelve_bit)
    with _pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"garbage")


def test_jpeg_features_through_arrow_kernel(spark):
    """Real JPEG pixels through the mapInPandas feature extractor in
    strict mode, stats analytic (DC-only grayscale); a corrupt scan
    degrades to SOF dims non-strict."""
    import numpy as np

    from graphdb_neo4j_spark.operators.multimodal import (
        encode_jpeg,
        extract_media_features,
    )

    px = _block_gray(1, 2, 2)
    good = encode_jpeg(px, quant=16)
    corrupt = good[: len(good) - 40] + b"\x00" * 38 + b"\xff\xd9"
    df = spark.createDataFrame(
        [
            (1, "image", bytearray(good), "image/jpeg", "s3://x/a.jpg"),
            (2, "image", bytearray(corrupt), "image/jpeg", "s3://x/b.jpg"),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in extract_media_features(df).collect()}
    r1 = rows[1]
    assert (r1.format, r1.width, r1.height, r1.channels) == ("jpeg", 16, 16, 1)
    flat = px.reshape(-1).astype(np.int64)
    assert r1.n_values == flat.size
    assert abs(r1.mean_val - float(flat.mean())) < 1e-9
    assert (r1.min_val, r1.max_val) == (int(flat.min()), int(flat.max()))
    r2 = rows[2]
    assert (r2.format, r2.width, r2.height) == ("jpeg", 16, 16)


# --- MP4 / ISO BMFF container (ISO 14496-12) ----------------------------


def test_mp4_parse_roundtrip_exact():
    from graphdb_neo4j_spark.operators.multimodal import (
        build_mp4,
        parse_mp4_meta,
    )

    pay = build_mp4(600, 3003, [
        {"track_id": 1, "handler": "vide", "codec": "hvc1", "width": 1920,
         "height": 1080, "timescale": 90000, "duration": 123456,
         "n_samples": 41},
        {"track_id": 2, "handler": "soun", "codec": "mp4a", "width": None,
         "height": None, "timescale": 48000, "duration": 96013,
         "n_samples": 94},
    ])
    m = parse_mp4_meta(pay)
    assert m["major_brand"] == "isom"
    assert m["movie_duration_us"] == 3003 * 1_000_000 // 600
    v, a = m["tracks"]
    assert (v["track_id"], v["handler"], v["codec"]) == (1, "vide", "hvc1")
    assert (v["width"], v["height"]) == (1920, 1080)
    assert v["duration_us"] == 123456 * 1_000_000 // 90000
    assert (v["timescale"], v["n_samples"]) == (90000, 41)
    assert (a["handler"], a["codec"], a["width"], a["height"]) == (
        "soun", "mp4a", None, None,
    )
    assert a["duration_us"] == 96013 * 1_000_000 // 48000
    assert a["n_samples"] == 94


def test_mp4_v1_64bit_and_largesize_boxes():
    """mvhd version 1 (64-bit duration) and a size==1 largesize box
    header both parse per §4.2."""
    import struct as _struct

    from graphdb_neo4j_spark.operators.multimodal import (
        _mp4_box,
        parse_mp4_meta,
    )

    mvhd_v1 = _mp4_box(
        b"mvhd", b"\x01\x00\x00\x00", _struct.pack(">QQ", 0, 0),
        _struct.pack(">IQ", 1000, 2 ** 33), _struct.pack(">I", 0x10000),
        _struct.pack(">H", 0x100), b"\x00" * 10,
        _struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000),
        b"\x00" * 24, _struct.pack(">I", 2),
    )
    ftyp = _mp4_box(b"ftyp", b"isom", _struct.pack(">I", 512), b"isom")
    moov_body = mvhd_v1
    largesize_moov = (
        _struct.pack(">I", 1) + b"moov"
        + _struct.pack(">Q", 16 + len(moov_body)) + moov_body
    )
    m = parse_mp4_meta(ftyp + largesize_moov)
    assert m["movie_duration_us"] == 2 ** 33 * 1_000_000 // 1000
    assert m["tracks"] == []


def test_mp4_malformed_raises():
    import pytest as _pytest

    from graphdb_neo4j_spark.operators.multimodal import (
        build_mp4,
        parse_mp4_meta,
    )

    with _pytest.raises(ValueError, match="not an MP4"):
        parse_mp4_meta(b"garbage")
    pay = build_mp4(600, 600, [])
    with _pytest.raises(ValueError, match="malformed|moov|mvhd"):
        parse_mp4_meta(pay[:30])


def test_mp4_tracks_through_arrow_kernel(spark):
    """extract_mp4_tracks end to end: per-track fan-out, non-MP4 rows
    skipped non-strict, strict raises."""
    import pytest as _pytest

    from graphdb_neo4j_spark.operators.multimodal import (
        TRACKS_SCHEMA,
        build_mp4,
        extract_mp4_tracks,
    )

    pay = build_mp4(600, 1203, [
        {"track_id": 1, "handler": "vide", "codec": "avc1", "width": 640,
         "height": 360, "timescale": 30000, "duration": 60007,
         "n_samples": 61},
        {"track_id": 2, "handler": "soun", "codec": "mp4a", "width": None,
         "height": None, "timescale": 48000, "duration": 96013,
         "n_samples": 94},
    ])
    df = spark.createDataFrame(
        [(1, bytearray(pay)), (2, bytearray(b"not an mp4 at all"))],
        "media_id long, payload binary",
    )
    out = extract_mp4_tracks(df)
    assert out.schema == TRACKS_SCHEMA
    rows = sorted(out.collect(), key=lambda r: r.track_id)
    assert len(rows) == 2 and [r.media_id for r in rows] == [1, 1]
    assert rows[0].codec == "avc1" and rows[0].width == 640
    assert rows[0].duration_us == 60007 * 1_000_000 // 30000
    assert rows[1].handler == "soun" and rows[1].width is None
    assert rows[0].movie_duration_us == 1203 * 1_000_000 // 600
    with _pytest.raises(Exception, match="not an MP4"):
        extract_mp4_tracks(df, strict=True).collect()


def test_jpeg_scan_order_gate():
    """ADVICE r6: a SOS whose component order differs from the SOF
    frame list must be rejected (the MCU interleave would decode
    silently wrong)."""
    import numpy as _np
    import pytest as _pytest

    from graphdb_neo4j_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    color = _np.zeros((16, 16, 3), dtype=_np.uint8)
    payload = bytearray(encode_jpeg(color, quant=16))
    # locate the SOS segment (FF DA) and its component list
    i = payload.find(b"\xff\xda")
    assert i > 0
    ns = payload[i + 4]
    assert ns == 3
    comp0 = i + 5
    # swap the first two scan components (cid, tables) pairs
    a = bytes(payload[comp0:comp0 + 2])
    b = bytes(payload[comp0 + 2:comp0 + 4])
    payload[comp0:comp0 + 2] = b
    payload[comp0 + 2:comp0 + 4] = a
    with _pytest.raises(ValueError, match="scan-component order"):
        decode_jpeg(bytes(payload))


def test_jpeg_multiscan_baseline_decodes_exactly():
    """A multi-scan (non-interleaved) baseline file — each component
    in its own full-band SOS — decodes to the SAME pixels as the
    interleaved encoding of the same image (identical quantized
    coefficients, different scan layout)."""
    import numpy as _np

    from graphdb_neo4j_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_scans,
    )

    rng = _np.random.RandomState(21)
    for shape in ((16, 16, 3), (19, 13, 3), (8, 8)):
        px = rng.randint(0, 256, shape).astype(_np.uint8)
        nch = 1 if len(shape) == 2 else shape[2]
        interleaved = decode_jpeg(encode_jpeg(px, quant=16))[2]
        multiscan = decode_jpeg(
            encode_jpeg_scans(px, 16, [([c], 0, 63, 0, 0) for c in range(nch)])
        )[2]
        assert _np.array_equal(interleaved, multiscan), shape


def test_jpeg_progressive_full_script_is_exact():
    """PROGRESSIVE (SOF2) decode: the default script — interleaved DC
    first at Al=1, per-component spectral AC bands with EOB-run
    coding, successive-approximation refinements with correction
    bits, final DC refinement — reconstructs the quantized
    coefficients EXACTLY, so the pixels equal the baseline encoding's
    decode bit for bit."""
    import numpy as _np

    from graphdb_neo4j_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = _np.random.RandomState(42)
    for shape in ((16, 16, 3), (24, 17, 3), (8, 8), (19, 13)):
        px = rng.randint(0, 256, shape).astype(_np.uint8)
        base = decode_jpeg(encode_jpeg(px, quant=16))[2]
        prog = decode_jpeg(encode_jpeg_progressive(px, quant=16))[2]
        assert _np.array_equal(base, prog), shape
    # EOB-run-heavy content: constant and smooth-gradient images
    for mk in (
        _np.zeros((40, 40, 3), _np.uint8),
        _np.tile(_np.arange(40, dtype=_np.uint8), (40, 1))[:, :, None].repeat(3, 2),
    ):
        base = decode_jpeg(encode_jpeg(mk, quant=16))[2]
        prog = decode_jpeg(encode_jpeg_progressive(mk, quant=16))[2]
        assert _np.array_equal(base, prog)


def test_jpeg_progressive_deep_ladder_and_zrl_refine():
    """Deeper successive-approximation ladders (Al=2 → two refinement
    levels per band) and the ZRL-inside-refinement path (a block whose
    only nonzero is |1| at the last zigzag position → a 62-length
    zero-history run) both reconstruct exactly."""
    import numpy as _np

    from graphdb_neo4j_spark.operators.multimodal import (
        _jpeg_dct_matrix,
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_scans,
        encode_jpeg_progressive,
    )

    rng = _np.random.RandomState(1)
    px = rng.randint(0, 256, (24, 24, 3)).astype(_np.uint8)
    allc = [0, 1, 2]
    scans = (
        [(allc, 0, 0, 0, 2)]
        + [([c], 1, 63, 0, 2) for c in allc]
        + [([c], 1, 63, 2, 1) for c in allc]
        + [([c], 1, 63, 1, 0) for c in allc]
        + [(allc, 0, 0, 2, 1), (allc, 0, 0, 1, 0)]
    )
    deep = decode_jpeg(encode_jpeg_scans(px, 16, scans))[2]
    base = decode_jpeg(encode_jpeg(px, 16))[2]
    assert _np.array_equal(deep, base)

    C = _jpeg_dct_matrix()
    coefq = _np.zeros((8, 8))
    coefq[7, 7] = 1.0  # quantizes to exactly 1 at zigzag position 63
    block = C.T @ (coefq * 16.0) @ C + 128.0
    zrl_px = _np.clip(_np.round(block), 0, 255).astype(_np.uint8)
    prog = decode_jpeg(encode_jpeg_progressive(zrl_px, quant=16))[2]
    base = decode_jpeg(encode_jpeg(zrl_px, quant=16))[2]
    assert _np.array_equal(prog, base)


def test_jpeg_progressive_scan_parameter_gates():
    """Malformed progressive scan headers raise specific errors: a DC
    scan with Se>0, a multi-component AC scan, and Ah != Al+1."""
    import numpy as _np
    import pytest as _pytest

    from graphdb_neo4j_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_scans,
    )

    px = _np.zeros((8, 8, 3), dtype=_np.uint8)
    good = encode_jpeg_scans(
        px, 16, [([0, 1, 2], 0, 0, 0, 0)] + [([c], 1, 63, 0, 0) for c in range(3)]
    )

    def patch_sos(blob: bytes, which: int, ss: int, se: int, ahal: int) -> bytes:
        out = bytearray(blob)
        at = -1
        for _ in range(which + 1):
            at = out.find(b"\xff\xda", at + 1)
        ln = int.from_bytes(out[at + 2 : at + 4], "big")
        out[at + ln - 1 : at + 2 + ln] = bytes([ss, se, ahal])
        return bytes(out)

    with _pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(patch_sos(good, 0, 0, 5, 0))
    with _pytest.raises(ValueError, match="single-component"):
        # make the first (3-component) scan an AC band
        decode_jpeg(patch_sos(good, 0, 1, 63, 0))
    with _pytest.raises(ValueError, match="bad progressive scan"):
        decode_jpeg(patch_sos(good, 1, 1, 63, 0x31))  # Ah=3, Al=1


def test_decoder_corruption_fuzz_raises_valueerror_only():
    """Exhaustive single-byte corruption of valid PNG/JPEG payloads:
    decoders must decode or raise ValueError — never a stray
    arithmetic/indexing exception type.  The media-scan quarantine
    catches ValueError; before the decoder-boundary normalization a
    corrupt JPEG reached ZeroDivisionError (zeroed quant table) and
    OverflowError, which would have crashed the task."""
    import numpy as np

    from graphdb_neo4j_spark.operators.multimodal import (
        decode_jpeg,
        decode_png,
        encode_jpeg,
        encode_png,
    )

    px = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    for decode, blob in (
        (decode_png, encode_png(px)),
        (decode_jpeg, encode_jpeg(px)),
    ):
        for pos in range(len(blob)):
            mutated = bytearray(blob)
            mutated[pos] ^= 0x80
            try:
                decode(bytes(mutated))
            except ValueError:
                pass


def test_media_scan_counters_surface_fallbacks(spark):
    """ADVICE r8: normalized-internal decode failures are countable —
    a corrupt-IDAT PNG (zlib.error normalized to 'corrupt PNG: ...')
    bumps BOTH counters; a structurally-truncated one (the decoder's
    own ValueError) bumps only header_fallback; clean payloads bump
    neither and the output schema is unchanged."""
    import numpy as np

    from graphdb_neo4j_spark.operators.multimodal import (
        encode_png,
        extract_media_features,
        media_scan_counters,
    )

    good = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    gb = bytearray(good)
    idx = bytes(gb).find(b"IDAT") + 4
    for j in range(idx, idx + 6):
        gb[j] ^= 0xFF
    media = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(gb)), (2, bytearray(good[:33]))],
        "media_id long, payload binary",
    )
    counters = media_scan_counters(spark)
    rows = {
        r.media_id: r
        for r in extract_media_features(media, counters=counters).collect()
    }
    assert rows[0].n_values == 48 and rows[0].mean_val == 0.0
    # fallbacks keep header dims, no stats
    assert rows[1].width == 4 and rows[1].n_values is None
    assert rows[2].width == 4 and rows[2].n_values is None
    assert counters["header_fallback"].value == 2
    assert counters["normalized_internal"].value == 1


def test_perceptual_hash_kernels_match_plain_python_mirror():
    """The numpy dHash/pHash kernels and the q225 oracle's independent
    plain-Python mirror implement the SAME frozen integer spec —
    bit-for-bit, on random images (the property that makes the
    operator oracle-able)."""
    import random

    import numpy as np

    from graphdb_neo4j_spark.operators.multimodal import dhash64, phash64
    from graphdb_neo4j_spark.workloads import _q225_dhash, _q225_phash

    rnd = random.Random(99)
    for _ in range(4):
        h, w = rnd.choice([(32, 32), (48, 64), (64, 64)])
        px = [
            [(rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
             for _ in range(w)]
            for _ in range(h)
        ]
        arr = np.array(px, dtype=np.uint8)

        def signed(x):
            return x - (1 << 64) if x >= (1 << 63) else x

        assert dhash64(arr) == signed(_q225_dhash(px))
        assert phash64(arr) == signed(_q225_phash(px))


def test_perceptual_hash_brightness_invariance():
    """A uniform brightness shift (no clamping) changes only the DC
    term: pHash (DC excluded) and dHash (differences unchanged) must
    be IDENTICAL — the invariance q225's brighten variants exercise."""
    import numpy as np

    from graphdb_neo4j_spark.operators.multimodal import dhash64, phash64

    rng = np.random.RandomState(7)
    base = rng.randint(40, 200, size=(64, 64, 3)).astype(np.uint8)
    shifted = (base.astype(np.int64) + 17).astype(np.uint8)
    assert phash64(base) == phash64(shifted)
    assert dhash64(base) == dhash64(shifted)


def test_perceptual_hashes_operator_round_trips_png(spark):
    """perceptual_hashes over genuine PNG payloads equals the direct
    kernel values on the source pixels (lossless round trip + Arrow
    plumbing), and grayscale images hash via channel 0."""
    import numpy as np

    from graphdb_neo4j_spark.operators.multimodal import (
        dhash64,
        encode_png,
        perceptual_hashes,
        phash64,
    )

    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, size=(40, 56, 3)).astype(np.uint8)
    gray = rng.randint(0, 256, size=(32, 32)).astype(np.uint8)
    media = spark.createDataFrame(
        [
            (0, bytearray(encode_png(rgb))),
            (1, bytearray(encode_png(gray[:, :, None]))),
        ],
        "media_id long, payload binary",
    )
    got = {r.media_id: r for r in perceptual_hashes(media).collect()}
    assert (got[0].dhash, got[0].phash) == (dhash64(rgb), phash64(rgb))
    assert (got[1].dhash, got[1].phash) == (dhash64(gray), phash64(gray))
    assert (got[0].width, got[0].height, got[0].format) == (56, 40, "png")


def test_audio_fingerprint_mirror_gain_and_operator(spark):
    """The numpy audio fingerprint matches the q227 plain-Python mirror
    bit for bit on random PCM16 signals; uniform gain flips at most 2
    bits (the sign scheme is gain-invariant up to box-mean floor
    rounding); and the Arrow operator round-trips genuine WAV payloads
    — including STEREO, where channel 0 is fingerprinted."""
    import random
    import struct

    import numpy as np

    from graphdb_neo4j_spark.operators.multimodal import (
        audio_fingerprint64,
        audio_fingerprints,
    )
    from graphdb_neo4j_spark.workloads import _q227_afp

    def signed(x):
        return x - (1 << 64) if x >= (1 << 63) else x

    rnd = random.Random(5)
    for _ in range(3):
        xs = [rnd.randrange(-8000, 8001) for _ in range(1000)]
        assert audio_fingerprint64(np.array(xs, dtype=np.int16)) == signed(
            _q227_afp(xs)
        )
        g = [x * 3 for x in xs]
        d = bin(
            (audio_fingerprint64(np.array(xs, dtype=np.int16)) & ((1 << 64) - 1))
            ^ (audio_fingerprint64(np.array(g, dtype=np.int16)) & ((1 << 64) - 1))
        ).count("1")
        assert d <= 2, d

    mono = [rnd.randrange(-8000, 8001) for _ in range(800)]
    other = [rnd.randrange(-8000, 8001) for _ in range(800)]
    inter = [v for pair in zip(mono, other) for v in pair]

    def wav(samples, channels):
        data = b"".join(struct.pack("<h", s) for s in samples)
        return bytearray(
            b"RIFF"
            + struct.pack("<I", 36 + len(data))
            + b"WAVEfmt "
            + struct.pack(
                "<IHHIIHH", 16, 1, channels, 16000,
                16000 * 2 * channels, 2 * channels, 16,
            )
            + b"data"
            + struct.pack("<I", len(data))
            + data
        )

    media = spark.createDataFrame(
        [(0, wav(mono, 1)), (1, wav(inter, 2))],
        "media_id long, payload binary",
    )
    got = {r.media_id: r for r in audio_fingerprints(media).collect()}
    want = audio_fingerprint64(np.array(mono, dtype=np.int16))
    assert got[0].afp == want and got[0].n_samples == 800
    # stereo: channel 0 == mono -> identical fingerprint
    assert got[1].afp == want and got[1].n_samples == 800


def test_perceptual_hashes_undersized_valid_images_null_not_raise(spark):
    """ADVICE r9: a VALID image below a hash's minimum grid (dhash 9x8,
    phash 32x32) decodes fine — so no upstream corruption quarantine
    can catch it — and must hash to NULL instead of killing the stage.
    Each hash applies its own minimum independently; metadata columns
    survive so callers can count/quarantine the undersized class."""
    import numpy as np

    from graphdb_neo4j_spark.operators.multimodal import (
        dhash64,
        encode_png,
        perceptual_hashes,
    )

    rng = np.random.RandomState(9)

    def img(h, w):
        return rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)

    tiny = img(4, 4)        # below both grids
    mid = img(16, 16)       # dhash ok (>=9x8), phash NULL (<32x32)
    edge = img(8, 9)        # exactly the dhash minimum
    media = spark.createDataFrame(
        [
            (0, bytearray(encode_png(tiny))),
            (1, bytearray(encode_png(mid))),
            (2, bytearray(encode_png(edge))),
        ],
        "media_id long, payload binary",
    )
    got = {r.media_id: r for r in perceptual_hashes(media).collect()}
    assert got[0].dhash is None and got[0].phash is None
    assert (got[0].width, got[0].height, got[0].format) == (4, 4, "png")
    assert got[1].dhash == dhash64(mid) and got[1].phash is None
    assert got[2].dhash == dhash64(edge) and got[2].phash is None


def test_audio_fingerprints_undersized_valid_clip_null_not_raise(spark):
    """ADVICE r9, audio face: a VALID WAV whose channel 0 is shorter
    than 544 samples (17 frames x 32 grid points) fingerprints to NULL
    — never a mid-stage raise — while metadata survives, and the
    NULL never enters Hamming-LSH bucketing downstream."""
    import struct

    import numpy as np

    from graphdb_neo4j_spark.operators.dedup import hamming_neardup_pairs
    from graphdb_neo4j_spark.operators.multimodal import (
        audio_fingerprint64,
        audio_fingerprints,
    )

    def wav(samples):
        data = b"".join(struct.pack("<h", s) for s in samples)
        return bytearray(
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data
        )

    short = [(i * 37) % 2001 - 1000 for i in range(100)]
    ok = [(i * 37) % 2001 - 1000 for i in range(544)]
    media = spark.createDataFrame(
        [(0, wav(short)), (1, wav(ok)), (2, wav(ok))],
        "media_id long, payload binary",
    )
    fps = audio_fingerprints(media)
    got = {r.media_id: r for r in fps.collect()}
    assert got[0].afp is None and got[0].n_samples == 100
    assert got[1].afp == audio_fingerprint64(np.array(ok, dtype=np.int16))
    # the NULL row is filtered before band explode: pairing still works
    # and only the two identical valid clips pair up
    pairs, handle = hamming_neardup_pairs(
        fps, id_col="media_id", hash_col="afp", bands=8
    )
    assert [(r.id_a, r.id_b, r.hamming) for r in pairs.collect()] == [(1, 2, 0)]
    handle.release()
