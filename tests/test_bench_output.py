"""The driver retains only the last ~2000 chars of bench stdout and
parses the final JSON line; BENCH_r05 overflowed that window and
arrived unparseable (parsed=null).  Pin the canonical-line contract:
compact_line output always fits TAIL_BUDGET with realistic per-query
payloads, keeps the headline fields, and sheds detail in the
documented order when it must."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def _detail():
    walls = {n: 12.345 for n in bench.BENCH_QUERIES}
    execs = {n: 123456 for n in bench.BENCH_QUERIES}
    g = {n: 123.456 for n in bench.GRAPH_QUERIES}
    ge = {n: 1234567 for n in bench.GRAPH_QUERIES}
    a = {n: 123.456 for n in bench.AUDIT_QUERIES}
    ae = {n: 1234567 for n in bench.AUDIT_QUERIES}
    cold = dict(walls)
    cold["stage_corpus"] = 12.345
    cold["ingest_corpus"] = 12.345
    return {
        "metric": "workload_total",
        "value": 123.456,
        "unit": "sec",
        "loadavg": {"start": [12.34, 12.34, 12.34], "end": [12.34, 12.34, 12.34]},
        "cache_build": {"copurchase_s": 123.456, "copurchase_exec_ms": 1234567},
        "queries": cold,
        "queries_warm": walls,
        "warm_total": 123.456,
        "graph": g,
        "graph_total": 123.456,
        "audit": a,
        "audit_total": 123.456,
        "exec_ms": execs,
        "warm_exec_ms": execs,
        "graph_exec_ms": ge,
        "audit_exec_ms": ae,
        "method": "cold=first run; warm=median of 3; exec_ms=JVM "
        "executorRunTime delta (contention shows wall-up/exec-flat; "
        "regressions move exec_ms)",
        "sf": 0.1,
    }


def test_compact_line_fits_tail_budget():
    line = json.dumps(bench.compact_line(_detail()))
    assert len(line) <= bench.TAIL_BUDGET, len(line)


def test_compact_line_keeps_headline_fields():
    out = bench.compact_line(_detail())
    for k in (
        "metric",
        "value",
        "warm_total",
        "graph_total",
        "audit_total",
        "ingest",
        "sf",
    ):
        assert k in out, k
    # per-query warm walls should survive at today's portfolio size
    assert "queries_warm" in out


def test_compact_line_sheds_in_order_when_oversized():
    detail = _detail()
    # simulate portfolio growth: very long names blow the budget
    detail["queries_warm"] = {f"q{i:03d}_{'x' * 60}": 1.0 for i in range(40)}
    out = bench.compact_line(detail)
    assert len(json.dumps(out)) <= bench.TAIL_BUDGET
    dropped = out.get("dropped_for_size", [])
    assert dropped == bench._DROP_ORDER[: len(dropped)]
    # headline totals never dropped
    assert "warm_total" in out and "value" in out


def test_compact_line_never_overflows_even_on_grown_ingest():
    """ADVICE r6: once every _DROP_ORDER key is shed, the never-dropped
    ingest dict could still push the line past TAIL_BUDGET if its key
    set grows — the final guard must shed it too and keep the line
    parseable."""
    detail = _detail()
    detail["queries_warm"] = {f"q{i:03d}_{'x' * 60}": 1.0 for i in range(40)}
    detail["queries"].update(
        {f"stage_{'y' * 80}_{i}": 1.0 for i in range(40)}
    )
    # make the ingest projection itself oversized
    out = bench.compact_line(
        {
            **detail,
            "queries": {
                **detail["queries"],
                **{f"ingest_{'z' * 90}_{i}": 1.0 for i in range(30)},
            },
        }
    )
    assert len(json.dumps(out)) <= bench.TAIL_BUDGET
    for k in ("metric", "value", "warm_total", "sf"):
        assert k in out, k
