"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship multi-join revenue query at sf0.001;
``queries``/``oracle_sql`` expose the full workload portfolio from
``graphdb_neo4j_spark.workloads`` (relational core, window/session
analytics, dedup / similarity / text operators, and rows-only
provenance-graph analytics over the reference corpus).
"""

from __future__ import annotations

import json
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from graphdb_neo4j_spark.workloads import ORACLES, QUERY_FNS


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERY_FNS["q05_region_nation_revenue"](spark, "/root/testdata/sf0.001")


def _driver_confirmed() -> set[str]:
    """Query names that already hold a green row in any CORRECTNESS_r*.json.

    Green = hash-match against the DuckDB oracle, or a successful
    rows-only check for the operators that have no SQL oracle.  A
    rows-only confirmation is VOIDED once the query gains an oracle
    (r6: the g40/g42/g44/g79/g80 constant oracles) — the hash gate is
    strictly stronger, so the query re-enters the unchecked tier until
    a driver hash row lands.
    """
    confirmed: set[str] = set()
    for path in sorted(Path(__file__).resolve().parent.glob("CORRECTNESS_r*.json")):
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True:
                confirmed.add(name)
            elif (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
                and name not in ORACLES
            ):
                confirmed.add(name)
    return confirmed


def _ordered_names() -> list[str]:
    """Registration order, rotated so never-driver-checked queries lead.

    The driver samples a fixed-size prefix of ``queries()`` each round, so
    the portfolio (len(QUERY_FNS) entries) can only be fully confirmed across rounds
    by rotating unchecked queries to the front:

    1. oracle-gated queries with no green CORRECTNESS row yet,
    2. rows-only queries with no green row yet,
    3. everything already confirmed (still pinned locally by
       ``tests/test_oracle_parity.py``).

    Within each tier, original registration order is kept — except that
    still-unchecked FLAGSHIP queries (the composed curation pipeline and
    the real-codec audits, the headline extensions) lead their tier so
    they get a driver row before the numeric backlog — so the rotation
    is deterministic and self-maintaining as new CORRECTNESS files land.
    """
    flagships = [
        "q228_streaming_fingerprint_neardup",
        "q229_image_decontamination",
        "q225_image_phash_neardup",
        "q226_image_neardup_clusters",
        "q227_audio_fingerprint_neardup",
        "q222_crawl_pipeline",
        "q223_sitemap_frontier",
        "q224_politeness_schedule",
        "q154_curation_pipeline",
        "q203_curation_with_pii",
        "q198_media_decode_audit",
        "q210_wav_decode_audit",
        "q211_bmp_decode_audit",
        "q212_png_decode_audit",
        "q213_jpeg_decode_audit",
        "q214_mp4_container_audit",
    ]
    confirmed = _driver_confirmed()
    names = list(QUERY_FNS)

    def boost(tier: list[str]) -> list[str]:
        lead = [n for n in flagships if n in tier]
        return lead + [n for n in tier if n not in lead]

    unchecked_oracle = boost(
        [n for n in names if n not in confirmed and n in ORACLES]
    )
    unchecked_rows = boost(
        [n for n in names if n not in confirmed and n not in ORACLES]
    )
    done = [n for n in names if n in confirmed]
    return unchecked_oracle + unchecked_rows + done


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: QUERY_FNS[name] for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {name: ORACLES[name] for name in _ordered_names() if name in ORACLES}
