"""Per-quirk synthetic fixtures (FIXTURES.md §1 'Quirk fixtures').

Each test builds a mini trace JSON exercising one subtle behavior of the
reference ingester and asserts the Spark engine reproduces it.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators import build_graph


def tag(key, value):
    if isinstance(value, bool):
        t = "bool"
    elif isinstance(value, int):
        t = "int64"
    else:
        t = "string"
    return {"key": key, "type": t, "value": value}


def span(start, *tags, span_id="s1"):
    return {"spanID": span_id, "startTime": start, "duration": 1, "tags": list(tags)}


def write_trace(tmp_path, name, trace_id, spans):
    doc = {"spans": spans, "processes": {}, "warnings": None}
    if trace_id is not None:
        doc["traceID"] = trace_id
    p = tmp_path / name
    p.write_text(json.dumps(doc), encoding="utf-8-sig")
    return str(p)


def test_falsy_ppid_drops_parent(spark, tmp_path):
    p = write_trace(tmp_path, "a.json", "t1", [
        span(1, tag("ID", 5), tag("ProcessGuid", "G1"), tag("sysmon.ppid", 0)),
    ])
    g = build_graph(spark, p)
    assert g.edge_counts().get("SPAWNS", 0) == 0
    assert g.node_counts()["Process"] == 1


def test_string_zero_ppid_is_truthy(spark, tmp_path):
    # string-typed "0" is truthy in Python → parent IS created
    p = write_trace(tmp_path, "a.json", "t1", [
        span(1, tag("ID", 5), tag("ProcessGuid", "G1"), tag("sysmon.ppid", "0")),
    ])
    g = build_graph(spark, p)
    assert g.edge_counts().get("SPAWNS", 0) == 1
    parents = {r.src for r in g.edges.filter(F.col("rel") == "SPAWNS").collect()}
    assert parents == {"t1:0"}


def test_dash_hostname_creates_ip_node(spark, tmp_path):
    p = write_trace(tmp_path, "a.json", "t1", [
        span(1, tag("ID", 3), tag("ProcessGuid", "G1"),
             tag("DestinationIp", "10.0.0.1"), tag("DestinationHostname", "-"),
             tag("DestinationPort", 443), tag("Protocol", "tcp")),
    ])
    g = build_graph(spark, p)
    ips = {r.key for r in g.simple.filter(F.col("label") == "Ip").collect()}
    assert ips == {"10.0.0.1", "-"}
    assert g.edge_counts()["CONNECTED_TO"] == 2


def test_hostname_lowercased(spark, tmp_path):
    p = write_trace(tmp_path, "a.json", "t1", [
        span(1, tag("ID", 3), tag("ProcessGuid", "G1"),
             tag("DestinationHostname", "EVIL.Example.COM")),
    ])
    g = build_graph(spark, p)
    ips = {r.key for r in g.simple.filter(F.col("label") == "Ip").collect()}
    assert ips == {"evil.example.com"}


def test_dual_key_parents(spark, tmp_path):
    # event 1 carries ParentProcessGuid; a later event only sysmon.ppid →
    # the same real parent appears under two keys, child gets two SPAWNS
    p = write_trace(tmp_path, "a.json", "t1", [
        span(1, tag("ID", 1), tag("ProcessGuid", "GC"),
             tag("ParentProcessGuid", "GP"), tag("ParentProcessId", 100)),
        span(2, tag("ID", 5), tag("ProcessGuid", "GC"), tag("sysmon.ppid", 100),
             span_id="s2"),
    ])
    g = build_graph(spark, p)
    parents = {r.src for r in g.edges.filter(
        (F.col("rel") == "SPAWNS") & (F.col("dst") == "GC")).collect()}
    assert parents == {"GP", "t1:100"}


def test_delete_value_becomes_deleted_reg_key(spark, tmp_path):
    p = write_trace(tmp_path, "a.json", "t1", [
        span(1, tag("ID", 12), tag("ProcessGuid", "G1"),
             tag("EventType", "DeleteValue"), tag("TargetObject", "HKLM\\a\\b")),
    ])
    g = build_graph(spark, p)
    assert g.edge_counts().get("DELETED_REG_KEY", 0) == 1
    assert g.edge_counts().get("CREATED_REG_KEY", 0) == 0


def test_tagless_span_skipped(spark, tmp_path):
    p = write_trace(tmp_path, "a.json", "t1", [
        span(1, tag("otel.scope.name", "x"), tag("span.kind", "internal")),
    ])
    g = build_graph(spark, p)
    assert g.node_counts() == {"Trace": 1}


def test_missing_trace_id_file_fallback(spark, tmp_path):
    p = write_trace(tmp_path, "fallback.json", None, [
        span(1, tag("ID", 5), tag("ProcessGuid", "G1")),
    ])
    g = build_graph(spark, p)
    traces = {r.key for r in g.simple.filter(F.col("label") == "Trace").collect()}
    assert traces == {"FILE::fallback.json"}


def test_last_non_null_command_line_in_start_time_order(spark, tmp_path):
    p = write_trace(tmp_path, "a.json", "t1", [
        span(30, tag("ID", 5), tag("ProcessGuid", "G1"), span_id="s3"),  # cmd NULL
        span(20, tag("ID", 5), tag("ProcessGuid", "G1"),
             tag("CommandLine", "second"), span_id="s2"),
        span(10, tag("ID", 1), tag("ProcessGuid", "G1"),
             tag("CommandLine", "first"), span_id="s1"),
    ])
    g = build_graph(spark, p)
    row = g.process.filter(F.col("key") == "G1").collect()[0]
    assert row.command_line == "second"  # last non-null in startTime order


def test_on_create_omits_process_guid(spark, tmp_path):
    # ON CREATE SET omits ProcessGuid (events.py:80-83): a single-write
    # process has no stored ProcessGuid even though the write carried one
    p = write_trace(tmp_path, "a.json", "t1", [
        span(1, tag("ID", 5), tag("ProcessGuid", "G1")),
    ])
    g = build_graph(spark, p)
    row = g.process.collect()[0]
    assert row.key == "G1" and row.process_guid is None
    # a second write stores it (ON MATCH coalesce)
    p2 = write_trace(tmp_path, "b.json", "t2", [
        span(1, tag("ID", 5), tag("ProcessGuid", "G1")),
        span(2, tag("ID", 5), tag("ProcessGuid", "G1"), span_id="s2"),
    ])
    g2 = build_graph(spark, p2)
    assert g2.process.collect()[0].process_guid == "G1"


def test_single_segment_reg_target_self_under_key(spark, tmp_path):
    """parse_reg_target('BareValue') == ('BareValue', None): the key
    part is the TARGET ITSELF (truthy!), so the reference MERGEs a
    RegistryKey node and a self UNDER_KEY edge alongside the
    RegistryValue (events.py:30-36, 408-418)."""
    p = write_trace(tmp_path, "a.json", "t1", [
        span(1, tag("ID", 13), tag("ProcessGuid", "G1"),
             tag("TargetObject", "BareValue")),
    ])
    g = build_graph(spark, p)
    assert g.edge_counts().get("UNDER_KEY", 0) == 1
    assert g.edge_counts()["SET_REG_VALUE"] == 1
    rv = g.registry_value.collect()[0]
    assert rv.path == "BareValue" and rv.value_name is None
    assert g.node_counts().get("RegistryKey", 0) == 1
    under = g.edges.filter(g.edges.rel == "UNDER_KEY").collect()[0]
    assert under.src == "BareValue" and under.dst == "BareValue"


def test_leading_backslash_reg_target_skips_key(spark, tmp_path):
    """parse_reg_target('\\\\Name') == ('', 'Name'): EMPTY key part is
    falsy → no key node, no UNDER_KEY; the value node still lands."""
    p = write_trace(tmp_path, "a.json", "t1", [
        span(1, tag("ID", 13), tag("ProcessGuid", "G1"),
             tag("TargetObject", "\\Name")),
    ])
    g = build_graph(spark, p)
    assert g.edge_counts().get("UNDER_KEY", 0) == 0
    assert g.node_counts().get("RegistryKey", 0) == 0
    rv = g.registry_value.collect()[0]
    assert rv.path == "\\Name" and rv.value_name == "Name"


def test_reg_target_split_and_trailing_backslashes(spark, tmp_path):
    p = write_trace(tmp_path, "a.json", "t1", [
        span(1, tag("ID", 13), tag("ProcessGuid", "G1"),
             tag("TargetObject", "HKLM\\Soft\\Run\\Name\\\\")),
    ])
    g = build_graph(spark, p)
    rv = g.registry_value.collect()[0]
    # vpath keeps the ORIGINAL target verbatim; value name from rstripped
    assert rv.path == "HKLM\\Soft\\Run\\Name\\\\"
    assert rv.value_name == "Name"
    keys = {r.key for r in g.simple.filter(F.col("label") == "RegistryKey").collect()}
    assert keys == {"HKLM\\Soft\\Run"}


def test_posix_basename_semantics(spark, tmp_path):
    p = write_trace(tmp_path, "a.json", "t1", [
        span(1, tag("ID", 5), tag("ProcessGuid", "G1"),
             tag("Image", "C:\\Windows\\evil.exe")),
        span(2, tag("ID", 5), tag("ProcessGuid", "G2"),
             tag("Image", "/usr/bin/python3"), span_id="s2"),
    ])
    g = build_graph(spark, p)
    rows = {r.key: r.image for r in g.process.collect()}
    assert rows["G1"] == "C:\\Windows\\evil.exe"  # backslash path kept whole
    assert rows["G2"] == "python3"  # forward-slash path → last segment


def test_event8_source_override(spark, tmp_path):
    p = write_trace(tmp_path, "a.json", "t1", [
        span(1, tag("ID", 8), tag("SourceProcessGuid", "GS"),
             tag("TargetProcessGuid", "GT")),
    ])
    g = build_graph(spark, p)
    inj = g.edges.filter(F.col("rel") == "INJECTED_THREAD").collect()
    assert len(inj) == 1 and inj[0].src == "GS" and inj[0].dst == "GT"
    keys = {r.key for r in g.process.collect()}
    assert keys == {"GS", "GT"}


def test_wmi_bind_requires_prior_nodes(spark, tmp_path):
    # bind BEFORE filter/consumer exist → silently dropped (MATCH, not MERGE)
    p = write_trace(tmp_path, "a.json", "t1", [
        span(1, tag("ID", 21), tag("ProcessGuid", "G1"),
             tag("FilterName", "f"), tag("ConsumerName", "c")),
        span(2, tag("ID", 19), tag("ProcessGuid", "G1"), tag("FilterName", "f"),
             tag("Query", "SELECT *"), span_id="s2"),
        span(3, tag("ID", 20), tag("ProcessGuid", "G1"), tag("ConsumerName", "c"),
             tag("Command", "cmd.exe"), span_id="s3"),
        span(4, tag("ID", 21), tag("ProcessGuid", "G1"),
             tag("FilterName", "f"), tag("ConsumerName", "c"), span_id="s4"),
    ])
    g = build_graph(spark, p)
    binds = g.edges.filter(F.col("rel") == "BIND_TO").collect()
    assert len(binds) == 1  # only the bind AFTER both nodes exist
    assert g.wmi_filter.collect()[0].query == "SELECT *"
    assert g.wmi_consumer.collect()[0].command == "cmd.exe"


def test_event_id_prop_and_edge_dedup(spark, tmp_path):
    p = write_trace(tmp_path, "a.json", "t1", [
        span(1, tag("ID", 11), tag("ProcessGuid", "G1"),
             tag("TargetFilename", "C:\\f.txt")),
        span(2, tag("ID", 11), tag("ProcessGuid", "G1"),
             tag("TargetFilename", "C:\\f.txt"), span_id="s2"),
    ])
    g = build_graph(spark, p)
    rows = g.edges.filter(F.col("rel") == "CREATED_FILE").collect()
    assert len(rows) == 1 and rows[0].event_id == 11
