"""Zstandard codec (RFC 8878): spec-direct hand-assembled frames,
primitive invariants, roundtrip matrix, error gates.

The hand-assembled frames are the non-circular conformance checks:
they are built byte-by-byte from the spec's field layouts (NOT through
the encoder), so a decoder bug that the encoder shares cannot hide in
them.  No Spark session needed — pure Python."""

from __future__ import annotations

import random

import pytest

from graphdb_neo4j_spark.sources.zstd_codec import (
    LL_DEFAULT_AL,
    LL_DEFAULT_NORM,
    MAX_WEIGHT_AL,
    ML_DEFAULT_AL,
    ML_DEFAULT_NORM,
    OF_DEFAULT_AL,
    OF_DEFAULT_NORM,
    BackwardBits,
    BitWriter,
    ForwardBits,
    Xxh64,
    ZstdDecompressor,
    ZstdError,
    _offset_to_value,
    _resolve_offset,
    build_skippable_frame,
    fse_build_decode_table,
    fse_decode_interleaved2,
    fse_encode_interleaved2,
    fse_read_ncount,
    fse_write_ncount,
    huf_build_dtable,
    huf_code_lengths,
    huf_codes,
    huf_decode_stream,
    huf_encode_stream,
    huf_read_tree,
    huf_write_tree,
    normalize_counts,
    xxh64,
    zstd_compress,
    zstd_decompress,
)

MAGIC = b"\x28\xb5\x2f\xfd"


# ------------------------------------------------------------- xxhash64


def test_xxh64_known_vector():
    # the canonical XXH64 empty-input vector (xxHash spec)
    assert xxh64(b"") == 0xEF46DB3751D8E999


def test_xxh64_streaming_equals_oneshot():
    rng = random.Random(1)
    data = bytes(rng.randrange(256) for _ in range(10_000))
    for cuts in ([0], [1, 5, 31, 32, 33, 1000], [8192, 10_000]):
        h = Xxh64()
        prev = 0
        for c in cuts + [len(data)]:
            h.update(data[prev:c])
            prev = c
        assert h.digest() == xxh64(data)
    assert xxh64(data, seed=42) != xxh64(data)


# ----------------------------------------- hand-assembled frames (spec-direct)


def test_hand_raw_block_frame():
    # FHD 0x20: single-segment, FCS 1 byte; block header 5<<3|0<<1|1
    frame = MAGIC + bytes([0x20, 5]) + bytes([0x29, 0, 0]) + b"hello"
    assert zstd_decompress(frame) == b"hello"


def test_hand_rle_block_frame():
    frame = MAGIC + bytes([0x20, 6]) + bytes([6 << 3 | 1 << 1 | 1, 0, 0]) + b"A"
    assert zstd_decompress(frame) == b"AAAAAA"


def test_hand_empty_frame():
    frame = MAGIC + bytes([0x20, 0]) + bytes([0x01, 0, 0])
    assert zstd_decompress(frame) == b""


def test_hand_windowed_frame_with_fcs():
    # FHD 0x80: fcs_flag=2 (4 bytes), not single-segment → window
    # descriptor 0x00 → window 1 KiB
    frame = (
        MAGIC
        + bytes([0x80, 0x00])
        + (3).to_bytes(4, "little")
        + bytes([3 << 3 | 0 << 1 | 1, 0, 0])
        + b"xyz"
    )
    assert zstd_decompress(frame) == b"xyz"


def test_hand_compressed_block_rle_sequence_modes():
    """Fully hand-computed compressed block: raw literals 'ab', one
    sequence (ll=2, offset_value=5 → offset 2, ml=3) in RLE mode for
    all three categories.  Backward bitstream holds just the 2-bit
    offset extra (value 1) + sentinel = 0b101 = 0x05."""
    literals = bytes([2 << 3 | 0]) + b"ab"  # raw literals, 1-byte header
    seqs = bytes([1, 0x54, 2, 2, 0, 0x05])  # nseq=1, modes LL/OF/ML=RLE
    block = literals + seqs
    bh = len(block) << 3 | 2 << 1 | 1
    frame = MAGIC + bytes([0x20, 5]) + bh.to_bytes(3, "little") + block
    assert zstd_decompress(frame) == b"ababa"


def test_hand_skippable_then_regular():
    skip = MAGIC[:0] + (0x184D2A5A).to_bytes(4, "little") + (4).to_bytes(
        4, "little"
    ) + b"meta"
    frame = MAGIC + bytes([0x20, 2]) + bytes([2 << 3 | 1, 0, 0]) + b"ok"
    assert zstd_decompress(skip + frame) == b"ok"
    assert zstd_decompress(frame + skip) == b"ok"


def test_hand_checksummed_frame():
    content = b"checked"
    frame = (
        MAGIC
        + bytes([0x24, len(content)])  # single-segment + checksum flag
        + bytes([len(content) << 3 | 1, 0, 0])
        + content
        + (xxh64(content) & 0xFFFFFFFF).to_bytes(4, "little")
    )
    assert zstd_decompress(frame) == content
    bad = frame[:-4] + b"\x00\x00\x00\x01"
    with pytest.raises(ZstdError, match="checksum"):
        zstd_decompress(bad)


# ------------------------------------------------------------ error gates


def test_bad_magic():
    with pytest.raises(ZstdError, match="magic"):
        zstd_decompress(b"\x00\x00\x00\x00" + b"x" * 16)


def test_reserved_frame_header_bit():
    with pytest.raises(ZstdError, match="reserved"):
        zstd_decompress(MAGIC + bytes([0x28, 0, 1, 0, 0]))


def test_reserved_block_type():
    frame = MAGIC + bytes([0x20, 1]) + bytes([1 << 3 | 3 << 1 | 1, 0, 0]) + b"x"
    with pytest.raises(ZstdError, match="reserved block"):
        zstd_decompress(frame)


def test_window_limit_enforced():
    f = zstd_compress(b"data " * 100, single_segment=False)
    with pytest.raises(ZstdError, match="window"):
        zstd_decompress(f, max_window=512)


def test_offset_beyond_window_rejected():
    # hand block: no literals, one RLE-mode sequence with offset 4 into
    # an empty history
    literals = bytes([0])  # raw literals, size 0
    seqs = bytes([1, 0x54, 0, 2, 0, 0x07])  # of extra bits=3 → value 7 → off 4
    block = literals + seqs
    bh = len(block) << 3 | 2 << 1 | 1
    frame = MAGIC + bytes([0x20, 3]) + bh.to_bytes(3, "little") + block
    with pytest.raises(ZstdError, match="offset"):
        zstd_decompress(frame)


def test_sequence_bomb_guard_is_incremental():
    """A ~30-byte compressed block whose 4 sequences each regenerate a
    65539-byte match (ML code 52, RLE mode) must raise the block-size
    cap DURING sequence execution — after ~128 KiB — not after
    materializing the full multi-hundred-KB output.  Pins the
    incremental `max_regen` guard inside _execute_sequences (the RLE
    bomb test alone cannot reach this path)."""
    import tracemalloc

    # raw literals "aaaa": each sequence consumes one literal (LL code 1)
    literals = bytes([4 << 3 | 0]) + b"aaaa"
    # nseq=4, all-RLE modes, codes LL=1 (ll=1), OF=0 (value 1 -> rep0=1),
    # ML=52 (base 65539, 16 extra bits).  Bitstream: 4x16 zero extra
    # bits + sentinel = 65 bits -> 8 zero bytes + 0x01 sentinel byte.
    seqs = bytes([4, 0x54, 1, 0, 52]) + b"\x00" * 8 + b"\x01"
    block = literals + seqs
    bh = len(block) << 3 | 2 << 1 | 1
    # windowed frame, window = 2^17 = 128 KiB (wd=0x38) so the cap is
    # MAX_BLOCK — total declared regen would be 4*(1+65539) = 262160
    frame = MAGIC + bytes([0x00, 0x38]) + bh.to_bytes(3, "little") + block
    tracemalloc.start()
    with pytest.raises(ZstdError, match="block size limit"):
        zstd_decompress(frame)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # incremental guard: peak stays near one cap (128 KiB), never the
    # full regenerated size — generous 4 MiB bound for interpreter noise
    assert peak < 4 << 20


def test_match_offset_beyond_declared_window_rejected():
    """The retained history can span up to 2x the declared window; a
    match offset that fits the retained bytes but exceeds Window_Size
    is non-conformant (RFC 8878 §3.1.1.1.2) and must be rejected."""
    # window = 1 KiB (wd=0x00); two raw 1 KiB blocks build 2 KiB of
    # retained history
    bh1 = (1024 << 3 | 0 << 1 | 0).to_bytes(3, "little")
    bh2 = bh1
    # compressed last block: one sequence ll=0, ml=3, offset 1500
    # (value 1503: OF code 10, 10 extra bits = 479) -> within retained
    # history (2048) but beyond the declared window (1024)
    literals = bytes([0])
    seqs = bytes([1, 0x54, 0, 10, 0]) + bytes([0xDF, 0x05])
    block = literals + seqs
    bh3 = (len(block) << 3 | 2 << 1 | 1).to_bytes(3, "little")
    frame = (
        MAGIC
        + bytes([0x00, 0x00])
        + bh1
        + b"x" * 1024
        + bh2
        + b"y" * 1024
        + bh3
        + block
    )
    with pytest.raises(ZstdError, match="declared window"):
        zstd_decompress(frame)


def test_content_size_mismatch_detected():
    frame = MAGIC + bytes([0x20, 9]) + bytes([0x29, 0, 0]) + b"hello"
    with pytest.raises(ZstdError, match="content size"):
        zstd_decompress(frame)


def test_treeless_without_table_rejected():
    lit = bytes([(0 << 14 | 1 << 4 | 0 << 2 | 3) & 0xFF, 0, 0])
    block = lit + b"\x00"
    bh = len(block) << 3 | 2 << 1 | 1
    frame = MAGIC + bytes([0x20, 1]) + bh.to_bytes(3, "little") + block
    with pytest.raises(ZstdError, match="[Tt]reeless|previous"):
        zstd_decompress(frame)


def test_truncated_frame_raises_in_decompress():
    full = zstd_compress(b"0123456789" * 200)
    with pytest.raises(ZstdError, match="truncated"):
        zstd_decompress(full[: len(full) - 3])


# ------------------------------------------------------------- primitives


@pytest.mark.parametrize(
    "norm,al",
    [
        (LL_DEFAULT_NORM, LL_DEFAULT_AL),
        (ML_DEFAULT_NORM, ML_DEFAULT_AL),
        (OF_DEFAULT_NORM, OF_DEFAULT_AL),
    ],
)
def test_predefined_tables_build_and_partition(norm, al):
    """Decode-table invariants on the spec's predefined distributions:
    per-symbol cell counts match the normalized counts, and each
    symbol's transition ranges exactly partition [0, table_size)."""
    table = fse_build_decode_table(norm, al)
    size = 1 << al
    assert len(table) == size
    by_sym: dict[int, list[tuple[int, int, int]]] = {}
    for s, nb, base in table:
        by_sym.setdefault(s, []).append((s, nb, base))
    for sym, c in enumerate(norm):
        want = 1 if c == -1 else c
        assert len(by_sym.get(sym, [])) == want, f"symbol {sym}"
        covered = sorted(
            (base, base + (1 << nb)) for _s, nb, base in by_sym.get(sym, [])
        )
        assert covered[0][0] == 0 and covered[-1][1] == size
        for (a, b), (c2, _d) in zip(covered, covered[1:]):
            assert b == c2, f"gap/overlap for symbol {sym}"


def test_fse_ncount_roundtrip_with_minus_one_and_gaps():
    rng = random.Random(3)
    for _ in range(25):
        al = rng.choice([5, 6, 7, 8])
        size = 1 << al
        # random distribution over a gappy alphabet with -1 entries
        hist: dict[int, int] = {}
        for s in rng.sample(range(40), rng.randrange(2, 14)):
            hist[s] = rng.randrange(1, 100)
        norm = normalize_counts(hist, al, max(hist))
        assert sum(1 if c == -1 else c for c in norm if c != 0) == size
        blob = fse_write_ncount(norm, al)
        got, got_al = fse_read_ncount(ForwardBits(blob), 255, al)
        assert got_al == al and got == norm


def test_fse_interleaved2_roundtrip():
    rng = random.Random(5)
    for _ in range(30):
        nsym = rng.randrange(2, 8)
        seq = [rng.randrange(nsym) for _ in range(rng.randrange(2, 120))]
        hist: dict[int, int] = {}
        for s in seq:
            hist[s] = hist.get(s, 0) + 1
        norm = normalize_counts(hist, MAX_WEIGHT_AL, max(seq))
        table = fse_build_decode_table(norm, MAX_WEIGHT_AL)
        blob = fse_encode_interleaved2(seq, norm, MAX_WEIGHT_AL)
        assert fse_decode_interleaved2(blob, table, MAX_WEIGHT_AL, 256) == seq


def test_huffman_weights_tree_roundtrip_both_modes():
    rng = random.Random(9)
    for mode in ("direct", "fse"):
        for _ in range(15):
            freqs = {
                s: rng.randrange(1, 50)
                for s in rng.sample(range(60), rng.randrange(2, 20))
            }
            weights = huf_code_lengths(freqs, shape="balanced")
            blob = huf_write_tree(weights, mode=mode)
            got, consumed = huf_read_tree(blob)
            assert consumed == len(blob) and got == weights


def test_huffman_codes_are_prefix_free_and_decode():
    rng = random.Random(11)
    for shape in ("balanced", "ladder"):
        freqs = {s: rng.randrange(1, 30) for s in range(7)}
        weights = huf_code_lengths(freqs, shape=shape)
        codes = huf_codes(weights)
        # prefix-freedom
        items = sorted(codes.values(), key=lambda cv: cv[1])
        for i, (v1, n1) in enumerate(items):
            for v2, n2 in items[i + 1 :]:
                assert (v2 >> (n2 - n1)) != v1, "prefix violation"
        table, max_bits = huf_build_dtable(weights)
        payload = bytes(rng.randrange(7) for _ in range(300))
        stream = huf_encode_stream(payload, codes)
        assert huf_decode_stream(stream, table, max_bits, len(payload)) == payload


def test_backward_bits_zero_pad_past_start():
    w = BitWriter()
    w.write(0b101, 3)
    blob = w.finish_backward()
    r = BackwardBits(blob)
    assert r.read(3) == 0b101
    assert r.read(4) == 0  # past the start → zeros
    assert r.remaining < 0


def test_repeat_offset_mirror_property():
    rng = random.Random(13)
    for _ in range(500):
        rep_dec = [rng.randrange(1, 50) for _ in range(3)]
        rep_enc = list(rep_dec)
        ll = rng.choice([0, 1, 5])
        # any offset, sometimes colliding with the history
        off = rng.choice([rep_dec[0], rep_dec[1], rep_dec[2], rng.randrange(1, 60)])
        if ll == 0 and off == rep_dec[0] and rep_dec[0] == 1:
            continue  # rep0-1 == 0 is illegal; encoder avoids it
        v = _offset_to_value(off, ll, rep_enc)
        got = _resolve_offset(v, ll, rep_dec)
        assert got == off and rep_dec == rep_enc


# ------------------------------------------------------------- roundtrips


CORPORA = {
    "empty": b"",
    "tiny": b"ab",
    "rle": b"z" * 500,
    "text": b"web-scale corpora arrive as compressed shards; " * 30,
    "periodic": (b"0123456789abcdef" * 64 + b"SEP") * 20,
}


@pytest.mark.parametrize("name", sorted(CORPORA))
@pytest.mark.parametrize("streams", [1, 4])
@pytest.mark.parametrize("tree_mode", ["direct", "fse"])
def test_roundtrip_matrix(name, streams, tree_mode):
    raw = CORPORA[name]
    for seq_modes in (
        ("predefined",) * 3,
        ("fse", "fse", "fse"),
        ("rle", "rle", "rle"),
    ):
        f = zstd_compress(
            raw, streams=streams, tree_mode=tree_mode, seq_modes=seq_modes
        )
        assert zstd_decompress(f) == raw


def test_roundtrip_multiblock_treeless_repeat():
    raw = b"abcdabcdxyzw " * 900
    f = zstd_compress(
        raw,
        block_size=2048,
        treeless_after_first=True,
        repeat_tables_after_first=True,
    )
    assert zstd_decompress(f) == raw
    assert len(f) < len(raw) // 4  # sequences + entropy coding actually bite


def test_roundtrip_random_bytes_full_alphabet():
    rng = random.Random(17)
    raw = bytes(rng.randrange(256) for _ in range(3000))
    for tree_mode in ("direct", "fse"):
        f = zstd_compress(raw, tree_mode=tree_mode)
        assert zstd_decompress(f) == raw


def test_roundtrip_giant_literal_run_hits_minus_one_ll_codes():
    rng = random.Random(19)
    head = bytes(rng.randrange(256) for _ in range(70_000))
    raw = head + head[:5000]  # 70k literals then one giant match
    f = zstd_compress(raw, block_size=1 << 17)
    assert zstd_decompress(f) == raw


def test_roundtrip_concatenated_frames_and_windowed():
    f = (
        zstd_compress(b"frame-one ")
        + build_skippable_frame(b"meta", 5)
        + zstd_compress(b"frame-two", single_segment=False)
    )
    assert zstd_decompress(f) == b"frame-one frame-two"


def test_roundtrip_hypothesis_style_fuzz():
    rng = random.Random(23)
    alphabets = [b"ab", b"abcdefgh \n", bytes(range(256))]
    for trial in range(40):
        alpha = alphabets[trial % 3]
        n = rng.randrange(0, 4000)
        raw = bytes(rng.choice(alpha) for _ in range(n))
        f = zstd_compress(
            raw,
            checksum=bool(trial % 2),
            single_segment=bool(trial % 3),
            streams=1 if trial % 5 == 0 else 4,
        )
        assert zstd_decompress(f) == raw


# ----------------------------------------------------- decompressor object


def test_decompressor_incremental_protocol():
    raw = b"incremental feeding of a zstd frame " * 50
    frame = zstd_compress(raw) + b"TRAILER"
    d = ZstdDecompressor()
    out = bytearray()
    for i in range(0, len(frame), 7):  # drip-feed 7 bytes at a time
        out += d.decompress(frame[i : i + 7], 1 << 20)
    while not d.eof:
        out += d.decompress(b"", 1 << 20)
    assert bytes(out) == raw
    assert d.unused_data.endswith(b"TRAILER")


def test_decompressor_max_length_bounds_returns():
    raw = b"x" * 10_000
    d = ZstdDecompressor()
    chunk = d.decompress(zstd_compress(raw), 100)
    assert len(chunk) == 100
    rest = bytearray()
    while not d.eof:
        rest += d.decompress(b"", 256)
    assert chunk + bytes(rest) == raw


def test_skippable_nibble_range():
    with pytest.raises(ZstdError):
        build_skippable_frame(b"", 16)


def test_incompressible_block_falls_back_to_raw_with_state_rollback():
    """A full-size incompressible block would exceed the 128 KiB
    compressed-block limit; the encoder must emit a raw block instead —
    and roll back the tables/rep state the failed compressed attempt
    mutated, or the NEXT compressed block desyncs from the decoder."""
    rng = random.Random(31)
    noise = bytes(rng.randrange(256) for _ in range(128 << 10))
    text = b"abcd" * 4096
    raw = text + noise + text  # compressible / raw-fallback / compressible
    f = zstd_compress(raw, block_size=128 << 10)
    assert zstd_decompress(f) == raw
    assert len(f) < len(raw) + 64  # the noise block did not expand


def test_tiny_fixture_blocks_stay_entropy_coded():
    """Path coverage is the fixture encoder's job: tiny payloads whose
    compressed form expands must STILL produce compressed blocks (the
    size fallback only fires for blocks >= 1 KiB in full-auto mode)."""
    tiny = b"zshard-0-line-1-aaaaa\n"
    f = zstd_compress(tiny)
    bh = int.from_bytes(f[6:9], "little")  # after magic+FHD+1-byte FCS
    assert (bh >> 1) & 3 == 2  # block type: compressed
    assert zstd_decompress(f) == tiny


# ------------------------------------------------------------ dictionaries


DICT_VOCAB = (
    b"the quick brown fox jumps over the lazy dog; shards arrive "
    b"compressed and concatenated. "
)


def test_dictionary_roundtrip_and_compression_win():
    from graphdb_neo4j_spark.sources.zstd_codec import (
        build_zstd_dictionary,
        parse_zstd_dictionary,
    )

    blob = build_zstd_dictionary(DICT_VOCAB * 4, 777)
    d = parse_zstd_dictionary(blob)
    assert d.dict_id == 777 and d.content == DICT_VOCAB * 4
    raw = b"the lazy dog jumps over the quick fox; compressed shards arrive. " * 8
    f_dict = zstd_compress(raw, dictionary=d)
    f_plain = zstd_compress(raw)
    assert zstd_decompress(f_dict, dictionary=d) == raw
    # matches into the dictionary window + its entropy tables must
    # actually pay off on dictionary-like content
    assert len(f_dict) < len(f_plain)


def test_dictionary_required_and_id_checked():
    from graphdb_neo4j_spark.sources.zstd_codec import build_zstd_dictionary

    d = build_zstd_dictionary(DICT_VOCAB, 777)
    frame = zstd_compress(b"the quick dog", dictionary=d)
    with pytest.raises(ZstdError, match="dictionary id=777"):
        zstd_decompress(frame)
    wrong = build_zstd_dictionary(DICT_VOCAB, 778)
    with pytest.raises(ZstdError, match="id=777, got id=778"):
        zstd_decompress(frame, dictionary=wrong)


def test_dictionary_id_widths_and_alphabet_fallback():
    from graphdb_neo4j_spark.sources.zstd_codec import build_zstd_dictionary

    for did in (5, 300, 70_000):  # 1-, 2-, 4-byte dictionary_id fields
        d = build_zstd_dictionary(DICT_VOCAB, did)
        f = zstd_compress(b"the quick dog", dictionary=d)
        assert zstd_decompress(f, dictionary=d) == b"the quick dog"
    # content outside the dictionary alphabet: the encoder installs a
    # fresh Huffman table instead of treeless reuse, and it decodes
    d = build_zstd_dictionary(DICT_VOCAB * 4, 9)
    raw = (DICT_VOCAB + b"novel tail content 12345 ") * 60
    f = zstd_compress(raw, dictionary=d, block_size=2048)
    assert zstd_decompress(f, dictionary=d) == raw


def test_dictionary_window_prefill_reachable():
    """A frame whose first sequence reaches INTO the dictionary
    content: offsets beyond the frame's own history must resolve
    against the prefill."""
    from graphdb_neo4j_spark.sources.zstd_codec import build_zstd_dictionary

    d = build_zstd_dictionary(DICT_VOCAB, 11)
    raw = DICT_VOCAB  # identical to dictionary content → pure matches
    f = zstd_compress(raw, dictionary=d)
    assert zstd_decompress(f, dictionary=d) == raw
    # and a plain decode of the same frame must fail, not corrupt
    with pytest.raises(ZstdError):
        zstd_decompress(f)


def test_bad_dictionary_blobs_rejected():
    from graphdb_neo4j_spark.sources.zstd_codec import (
        build_zstd_dictionary,
        parse_zstd_dictionary,
    )

    with pytest.raises(ZstdError, match="magic"):
        parse_zstd_dictionary(b"\x00\x00\x00\x00rest")
    blob = build_zstd_dictionary(DICT_VOCAB, 3)
    with pytest.raises(ZstdError):
        parse_zstd_dictionary(blob[: len(blob) // 2])


def test_corruption_fuzz_every_byte_flip_fails_cleanly():
    """Exhaustive single-byte corruption of valid frames: the decoder
    must either decode (flips in ignored fields) or raise ZstdError —
    never a stray exception class (the crawl front door's quarantine
    contract), never a hang, never unbounded allocation.  Regression:
    deep bitstream overdraw on corrupt sequence tables raised a raw
    'negative shift count' ValueError from BackwardBits.read."""
    rng = random.Random(42)
    data = bytes(rng.randrange(97, 105) for _ in range(400)) * 3
    frames = [
        zstd_compress(data),
        zstd_compress(data, seq_modes=("fse", "fse", "fse")),
    ]
    for frame in frames:
        for pos in range(len(frame)):
            for delta in (1, 0x80):
                mutated = bytearray(frame)
                mutated[pos] ^= delta
                try:
                    out = zstd_decompress(bytes(mutated), max_window=1 << 22)
                    assert isinstance(out, bytes)
                except ZstdError:
                    pass
