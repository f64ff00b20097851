"""Streaming fingerprint near-dup: cross-batch image dedup with a
first-seen-keeper ledger — stream ≡ a plain-Python sequential fold of
the batch semantics (prior-keeper filter + in-batch union-find +
(ts, id)-argmin keeper), exactly-once replay, run-scoped recovery."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from graphdb_neo4j_spark.streaming.media import (
    fingerprint_kept,
    streaming_fingerprint_neardup,
)
from graphdb_neo4j_spark.workloads import (
    _q225_images,
    _q225_phash,
    _q228_kept,
    _q228_waves,
)

MEDIA_SCHEMA = "media_id long, payload binary, event_time timestamp"
MAX_H = 10
U64 = (1 << 64) - 1


def _ham(a: int, b: int) -> int:
    return bin((a & U64) ^ (b & U64)).count("1")


def _python_fold(waves, max_h=MAX_H):
    """The module-docstring semantics, folded wave by wave in plain
    Python: drop items near a ledgered keeper, union-find the in-batch
    survivors, keep the (ts, id)-min member per component."""
    kept = []  # (id, unsigned phash)
    for wave in waves:
        items = sorted((ts, i, h) for i, ts, h in wave)
        new = [
            (ts, i, h)
            for ts, i, h in items
            if all(_ham(h, kh) > max_h for _, kh in kept)
        ]
        parent = {i: i for _, i, _ in new}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a in range(len(new)):
            for b in range(a + 1, len(new)):
                if _ham(new[a][2], new[b][2]) <= max_h:
                    ra, rb = find(new[a][1]), find(new[b][1])
                    if ra != rb:
                        parent[ra] = rb
        best = {}
        for ts, i, h in new:
            r = find(i)
            if r not in best or (ts, i) < best[r][:2]:
                best[r] = (ts, i, h)
        kept.extend((i, h) for _, i, h in sorted(best.values()))
    return kept


def _wave_rows(wave):
    from graphdb_neo4j_spark.operators.multimodal import encode_png

    import datetime

    return [
        (
            i,
            bytearray(encode_png(np.array(px, dtype=np.uint8))),
            datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=ts),
        )
        for i, ts, px in wave
    ]


def _run(builder, ckpt: str):
    q = builder.option("checkpointLocation", ckpt).trigger(
        availableNow=True
    ).start()
    assert q.awaitTermination(300), "streaming run timed out"


def test_fingerprint_neardup_stream_equals_python_fold(spark, tmp_path):
    # one fixture source: the q228 waves (workloads) — this test's own
    # _python_fold is the independent semantics mirror, and it must
    # agree with the q228 oracle fold (divergence guard, r10 review)
    from graphdb_neo4j_spark.operators.multimodal import perceptual_hashes

    w1, w2 = _q228_waves()
    src = tmp_path / "media"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def builder():
        return streaming_fingerprint_neardup(
            spark.readStream.schema(MEDIA_SCHEMA).parquet(str(src) + "/*"),
            state,
            payload_col="payload",
            hasher=perceptual_hashes,
            bands=16,
            max_hamming=MAX_H,
        )

    spark.createDataFrame(_wave_rows(w1), MEDIA_SCHEMA).write.parquet(
        f"{src}/w1.parquet"
    )
    _run(builder(), ckpt)
    got1 = {r.media_id for r in fingerprint_kept(spark, state).collect()}
    mirror1 = {i for i, _ in _python_fold(
        [[(i, ts, _q225_phash(px)) for i, ts, px in w1]]
    )}
    assert got1 == mirror1 == {0, 3, 6}  # one keeper per wave-1 cluster

    spark.createDataFrame(_wave_rows(w2), MEDIA_SCHEMA).write.parquet(
        f"{src}/w2.parquet"
    )
    _run(builder(), ckpt)
    kept_df = fingerprint_kept(spark, state)
    got = {r.media_id for r in kept_df.collect()}
    mirror = {
        i
        for i, _ in _python_fold(
            [
                [(i, ts, _q225_phash(px)) for i, ts, px in w]
                for w in (w1, w2)
            ]
        )
    }
    assert got == mirror
    assert mirror == {i for i, _ in _q228_kept()}  # fold ≡ q228 oracle fold
    assert 100 not in got        # cross-batch drop against the ledger
    assert 101 in got            # genuinely new content admitted
    # ledger rows carry the REAL spark-side fingerprints: keeper 0's
    # phash equals the mirror hash (signed <-> unsigned)
    ph0 = {r.media_id: r.phash for r in kept_df.collect()}[0]
    assert (ph0 & U64) == _q225_phash(_q225_images()[0])

    # exactly-once: an empty re-run is a no-op
    _run(builder(), ckpt)
    assert {r.media_id for r in fingerprint_kept(spark, state).collect()} == got

    # checkpoint LOSS: a fresh lineage reprocesses everything in one
    # batch; every fixture member is DIRECTLY within threshold of its
    # keeper (intra-cluster distances <= 8), so recovery is
    # content-idempotent — the kept set does not change
    _run(builder(), str(tmp_path / "ckpt2"))
    assert {r.media_id for r in fingerprint_kept(spark, state).collect()} == got


def test_fingerprint_neardup_precomputed_hashes_and_chain_semantics(
    spark, tmp_path
):
    """Pre-fingerprinted input shape (no hasher), and the documented
    keeper-ledger chain caveat: C near a DROPPED B but beyond the
    threshold from B's keeper A is ADMITTED in a later batch —
    near-duplication is not transitive and the ledger holds keepers
    only."""
    a = 0x0F0F0F0F0F0F0F0F
    b = a ^ ((1 << 9) - 1)        # 9 bits from a (<= 10: near)
    c = b ^ (((1 << 9) - 1) << 30)  # 9 bits from b, 18 from a (far)
    assert _ham(a, b) == 9 and _ham(b, c) == 9 and _ham(a, c) == 18

    src = tmp_path / "fps"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    schema = "media_id long, phash long, event_time timestamp"

    def builder():
        return streaming_fingerprint_neardup(
            spark.readStream.schema(schema).parquet(str(src) + "/*"),
            state,
            bands=16,
            max_hamming=MAX_H,
        )

    import datetime

    def rows(vals):
        return [
            (i, h, datetime.datetime(2024, 1, 1, 0, 0, i)) for i, h in vals
        ]

    spark.createDataFrame(rows([(1, a), (2, b)]), schema).write.parquet(
        f"{src}/w1.parquet"
    )
    _run(builder(), ckpt)
    assert {r.media_id for r in fingerprint_kept(spark, state).collect()} == {1}

    spark.createDataFrame(rows([(3, c)]), schema).write.parquet(
        f"{src}/w2.parquet"
    )
    _run(builder(), ckpt)
    assert {r.media_id for r in fingerprint_kept(spark, state).collect()} == {
        1,
        3,
    }

    # NULL fingerprints (undersized media) are dropped, not admitted
    spark.createDataFrame(
        [(4, None, datetime.datetime(2024, 1, 1, 0, 1))], schema
    ).write.parquet(f"{src}/w3.parquet")
    _run(builder(), ckpt)
    assert {r.media_id for r in fingerprint_kept(spark, state).collect()} == {
        1,
        3,
    }


def test_fingerprint_neardup_rejects_half_configured_hasher(spark):
    import pytest

    stream = spark.readStream.schema(MEDIA_SCHEMA).parquet("/nonexistent/*")
    with pytest.raises(ValueError, match="payload_col and hasher"):
        streaming_fingerprint_neardup(
            stream, "/tmp/x", payload_col="payload"
        )
