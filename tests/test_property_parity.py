"""Property-based parity: hypothesis-generated adversarial traces must
produce the same graph shape in the Spark engine and the independent
pure-Python semantic oracle (tests/oracle_sim.py).

Strategies deliberately hit the quirk surface: falsy int/str zeros,
missing IDs, "-" hostnames, single-segment registry targets, trailing
backslashes, GUID/pid mixes, WMI bind ordering, duplicate startTimes.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators.ingest import build_graph
from tests.oracle_sim import simulate

GUIDS = ["G1", "G2", "G3"]
IMAGES = ["C:\\w\\a.exe", "/usr/bin/x", "b.exe", ""]
REG_TARGETS = ["HKLM\\S\\Run\\V", "Bare", "HKLM\\K\\\\", "HKLM\\A\\B"]
FILES = ["C:\\f1", "C:\\f2"]
HOSTS = ["Evil.COM", "-", "h"]


def tag_entry(key, value):
    if isinstance(value, bool):
        t = "bool"
    elif isinstance(value, int):
        t = "int64"
    else:
        t = "string"
    return {"key": key, "type": t, "value": value}


optional_tags = st.fixed_dictionaries(
    {},
    optional={
        "ID": st.sampled_from([1, 2, 3, 5, 8, 11, 12, 13, 17, 18, 19, 20, 21, 22, 0]),
        "EventID": st.sampled_from(["0", "11", "abc", 3]),
        "ProcessGuid": st.sampled_from(GUIDS + [""]),
        "ProcessId": st.sampled_from([0, 1, 2, "0"]),
        "ParentProcessGuid": st.sampled_from(GUIDS),
        "sysmon.ppid": st.sampled_from([0, 1, 7]),
        "Image": st.sampled_from(IMAGES),
        "CommandLine": st.sampled_from(["cmd /c x", ""]),
        "TargetFilename": st.sampled_from(FILES),
        "DestinationIp": st.sampled_from(["1.2.3.4", ""]),
        "DestinationHostname": st.sampled_from(HOSTS),
        "EventType": st.sampled_from(["CreateKey", "DeleteKey", "DeleteValue", "Rename", ""]),
        "TargetObject": st.sampled_from(REG_TARGETS),
        "PipeName": st.sampled_from(["\\\\pipe\\p1", ""]),
        "SourceProcessGuid": st.sampled_from(GUIDS),
        "TargetProcessGuid": st.sampled_from(GUIDS),
        "TargetProcessId": st.sampled_from([0, 5]),
        "FilterName": st.sampled_from(["wf1", "wf2"]),
        "ConsumerName": st.sampled_from(["wc1"]),
        "Query": st.sampled_from(["SELECT 1", ""]),
        "Command": st.sampled_from(["run.exe"]),
    },
)

span_st = st.builds(
    lambda start, tags: {
        "spanID": "s",
        "startTime": start,
        "tags": [tag_entry(k, v) for k, v in tags.items()],
    },
    start=st.integers(min_value=0, max_value=5),
    tags=optional_tags,
)

trace_st = st.builds(
    lambda tid, spans: {"traceID": tid, "spans": spans},
    tid=st.sampled_from(["tA", "tB", ""]),
    spans=st.lists(span_st, min_size=0, max_size=6),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(traces=st.lists(trace_st, min_size=1, max_size=3))
def test_generated_traces_match_python_oracle(spark, tmp_path_factory, traces):
    tmp = tmp_path_factory.mktemp("prop")
    fnames = []
    for i, doc in enumerate(traces):
        name = f"t{i:03d}.json"
        (tmp / name).write_text(json.dumps(doc), encoding="utf-8-sig")
        fnames.append(name)

    g = build_graph(spark, f"{tmp}/*.json")

    exp_nodes, exp_edges = simulate(traces, fnames)
    got_nodes: dict[str, set] = {}
    for r in g.nodes().collect():
        got_nodes.setdefault(r.label, set()).add(r.key)
    got_edges: dict[str, set] = {}
    for r in g.edges.select("rel", "src", "dst").collect():
        got_edges.setdefault(r.rel, set()).add((r.src, r.dst))

    exp_nodes = {k: v for k, v in exp_nodes.items() if v}
    exp_edges = {k: v for k, v in exp_edges.items() if v}
    assert got_nodes == exp_nodes
    assert got_edges == exp_edges


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(traces=st.lists(trace_st, min_size=1, max_size=3))
def test_generated_traces_match_property_simulator(
    spark, tmp_path_factory, traces
):
    """r7: the PROPERTY-tracking simulator (oracle_sim.simulate_full —
    the independent derivation behind the g66/g77 constant oracles)
    must reproduce the engine's property semantics on ADVERSARIAL
    generated traces too, not just the fixed corpus: last-writer-wins
    edge props (details keep-old), ON-CREATE guid/pguid drop,
    last-non-null process/WMI props, RegistryValue last-write-incl-
    NULL."""
    from tests.oracle_sim import EDGE_PROP_NAMES, simulate_full

    tmp = tmp_path_factory.mktemp("propfull")
    fnames = []
    for i, doc in enumerate(traces):
        name = f"t{i:03d}.json"
        (tmp / name).write_text(json.dumps(doc), encoding="utf-8-sig")
        fnames.append(name)

    g = build_graph(spark, f"{tmp}/*.json")
    _nodes, _edges, props = simulate_full(traces, fnames)

    got_proc = {
        r["key"]: (r["image"], r["command_line"], r["process_guid"],
                   r["parent_process_guid"])
        for r in g.process.collect()
    }
    exp_proc = {
        k: (v["image"], v["command_line"], v["process_guid"],
            v["parent_process_guid"])
        for k, v in props["process"].items()
    }
    assert got_proc == exp_proc

    got_rv = {r["path"]: r["value_name"] for r in g.registry_value.collect()}
    assert got_rv == dict(props["registry_value"])

    got_wf = {r["name"]: r["query"] for r in g.wmi_filter.collect()}
    assert got_wf == dict(props["wmi_filter"])
    got_wc = {r["name"]: r["command"] for r in g.wmi_consumer.collect()}
    assert got_wc == dict(props["wmi_consumer"])

    got_edge = {
        (r["rel"], r["src"], r["dst"]): tuple(r[p] for p in EDGE_PROP_NAMES)
        for r in g.edges.collect()
    }
    exp_edge = {
        k: tuple(v[p] for p in EDGE_PROP_NAMES)
        for k, v in props["edge"].items()
    }
    assert got_edge == exp_edge
