"""JSONL corpus source: PERMISSIVE parse + corrupt-line quarantine."""

from __future__ import annotations

from pyspark.sql.types import LongType, StringType, StructField, StructType

from graphdb_neo4j_spark.sources.corpus import (
    corpus_ingest_report,
    read_jsonl_corpus,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)


def _write(tmp_path, lines):
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_good_and_quarantine_split(spark, tmp_path):
    path = _write(
        tmp_path,
        [
            '{"doc_id": 1, "text": "alpha"}',
            'this is not json at all',
            '{"doc_id": 2, "text": "beta"}',
            '{"doc_id": 3, "text": "gamma"',  # truncated
            '{"doc_id": "not-a-number", "text": "delta"}',  # type violation
        ],
    )
    good, quar = read_jsonl_corpus(spark, path, SCHEMA)
    assert sorted((r.doc_id, r.text) for r in good.collect()) == [
        (1, "alpha"),
        (2, "beta"),
    ]
    bad = sorted(r.raw_line for r in quar.collect())
    assert len(bad) == 3
    assert any("not json" in b for b in bad)
    assert any("not-a-number" in b for b in bad)  # quarantined whole
    rep = corpus_ingest_report(good, quar).collect()[0]
    assert (rep.n_good, rep.n_quarantined) == (2, 3)
    assert abs(rep.quarantine_ratio - 0.6) < 1e-9


def test_schema_must_not_declare_corrupt_col(spark):
    import pytest

    bad = StructType([StructField("_corrupt_record", StringType())])
    with pytest.raises(ValueError):
        read_jsonl_corpus(spark, "/nonexistent", bad)


def test_all_good_lines(spark, tmp_path):
    path = _write(
        tmp_path, ['{"doc_id": %d, "text": "t%d"}' % (i, i) for i in range(20)]
    )
    good, quar = read_jsonl_corpus(spark, path, SCHEMA)
    assert good.count() == 20 and quar.count() == 0


def test_streaming_corpus_ingest_matches_batch_and_replays(spark, tmp_path):
    """Stream ≡ batch on the same files; a restart with the same
    checkpoint re-processes nothing; a rerun with a FRESH checkpoint
    (batch ids restart at 0) overwrites its partitions instead of
    double-appending."""
    from graphdb_neo4j_spark.streaming.corpus import streaming_corpus_ingest

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "alpha"}\nBAD LINE\n'
        '{"doc_id": 2, "text": "beta"}\n'
    )
    (src / "b.jsonl").write_text(
        '{"doc_id": 3, "text": "gamma"}\n{"doc_id": "x", "text": "d"}\n'
    )
    state = str(tmp_path / "state")

    def run(ckpt: str):
        q = (
            streaming_corpus_ingest(
                spark.readStream.text(str(src)), state, SCHEMA
            )
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run("ckpt")
    good = spark.read.parquet(f"{state}/good")
    quar = spark.read.parquet(f"{state}/quarantine")
    assert sorted((r.doc_id, r.text) for r in good.collect()) == [
        (1, "alpha"),
        (2, "beta"),
        (3, "gamma"),
    ]
    assert quar.count() == 2

    # batch equality on the same files
    bgood, bquar = read_jsonl_corpus(spark, str(src / "*.jsonl"), SCHEMA)
    assert sorted((r.doc_id, r.text) for r in bgood.collect()) == sorted(
        (r.doc_id, r.text) for r in good.collect()
    )
    assert sorted(r.raw_line for r in bquar.collect()) == sorted(
        r.raw_line for r in quar.collect()
    )

    # restart with the same checkpoint: no new batches, no duplicates
    run("ckpt")
    assert spark.read.parquet(f"{state}/good").count() == 3
    assert spark.read.parquet(f"{state}/quarantine").count() == 2

    # fresh checkpoint replays everything as batch 0 — the dynamic
    # partition overwrite rewrites partition 0 instead of appending
    run("ckpt2")
    assert spark.read.parquet(f"{state}/good").count() == 3
    assert spark.read.parquet(f"{state}/quarantine").count() == 2


def test_streaming_corpus_ingest_all_good_batch(spark, tmp_path):
    """A batch with zero quarantined lines commits cleanly (regression:
    the meta count used a read-back that cannot infer a schema from an
    all-empty dynamic overwrite)."""
    from graphdb_neo4j_spark.streaming.corpus import streaming_corpus_ingest

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "alpha"}\n{"doc_id": 2, "text": "beta"}\n'
    )
    state = str(tmp_path / "state")
    q = (
        streaming_corpus_ingest(
            spark.readStream.text(str(src)), state, SCHEMA
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(f"{state}/good").count() == 2
    meta = {r.batch_id: r for r in spark.read.parquet(f"{state}/meta").collect()}
    assert sum(r.n_good for r in meta.values()) == 2
    assert sum(r.n_quarantined for r in meta.values()) == 0


# ---------------------------------------------------------------------------
# CSV source with quarantine
# ---------------------------------------------------------------------------

def test_csv_quarantine_split(spark, tmp_path):
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from graphdb_neo4j_spark.sources.csv import (
        csv_quarantine_report,
        read_csv_quarantined,
    )

    p = tmp_path / "dump.csv"
    p.write_text(
        "id,name,score\n"
        "1,alice,10\n"
        "2,bob,twenty\n"          # type garbage → quarantined
        "3,carol,30\n"
        "4,dave\n"                # short row → quarantined
        "5,erin,50,extra\n"       # long row → quarantined
    )
    schema = StructType([
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", LongType()),
    ])
    clean, bad = read_csv_quarantined(spark, str(p), schema)
    got = sorted(tuple(r) for r in clean.collect())
    assert got == [(1, "alice", 10), (3, "carol", 30)]
    bad_lines = sorted(r.raw_line for r in bad.collect())
    assert bad_lines == ["2,bob,twenty", "4,dave", "5,erin,50,extra"]
    rep = csv_quarantine_report(bad).head()
    assert (rep.n_bad, rep.n_distinct) == (3, 3)

    # declaring the capture column in the data schema is a caller bug
    import pytest as _pytest
    with _pytest.raises(ValueError, match="_corrupt_record"):
        read_csv_quarantined(
            spark, str(p),
            StructType([StructField("_corrupt_record", StringType())]),
        )


def test_streaming_csv_ingest_matches_batch(spark, tmp_path):
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from graphdb_neo4j_spark.sources.csv import read_csv_quarantined
    from graphdb_neo4j_spark.streaming.corpus import streaming_csv_ingest

    schema = StructType([
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", LongType()),
    ])
    src = tmp_path / "csv_stream"
    src.mkdir()
    (src / "a.csv").write_text(
        "id,name,score\n1,alice,10\n2,bob,twenty\n3,carol,30\n"
    )
    (src / "b.csv").write_text(
        "id,name,score\n4,dave\n5,erin,50\n"
    )
    state = str(tmp_path / "csv_state")
    stream = spark.readStream.text(str(src) + "/*.csv")
    q = (
        streaming_csv_ingest(stream, state, schema)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    good = {
        tuple(r)
        for r in spark.read.parquet(f"{state}/good")
        .select("id", "name", "score").collect()
    }
    bad = {
        r.raw_line
        for r in spark.read.parquet(f"{state}/quarantine").collect()
    }
    bclean, bquar = read_csv_quarantined(
        spark, str(src) + "/*.csv", schema
    )
    assert good == {tuple(r) for r in bclean.collect()}
    assert bad == {r.raw_line for r in bquar.collect()}
    assert good == {(1, "alice", 10), (3, "carol", 30), (5, "erin", 50)}
    assert bad == {"2,bob,twenty", "4,dave"}
