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
