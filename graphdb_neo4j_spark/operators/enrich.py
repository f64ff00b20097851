"""Extension operators — value the reference leaves on the floor.

The reference ingester drops the payload of several high-volume event
types (SURVEY.md §2.C "present but unhandled"): event 5
ProcessTerminate (35% of the corpus!), event 22 DNSQuery, and Windows
Security logons 4624/4625/4648.  It also splits one real process across
two node keys whenever some events carry its GUID and others only a pid
(SURVEY.md §1.3).  These operators recover that value as *extensions* —
the default build stays bug-compatible with the reference; everything
here is opt-in.

All pure DataFrame ops over the same derived span columns the core
ingest uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphdb_neo4j_spark.functions.etl import tag
from graphdb_neo4j_spark.operators.ingest import PropertyGraph, _derive


def dns_edges(spans: DataFrame) -> DataFrame:
    """Event 22 → ``QUERIED_DNS`` edges: (src=process key, dst=query
    name) plus one ``RESOLVED_TO`` row per resolved address.

    ``QueryResults`` is ``;``-separated with ``::ffff:`` IPv4-mapped
    prefixes and ``type:`` records; addresses are normalized the way the
    reference's dead ``json_or_list`` helper intended (split, drop
    ``-`` and empties).
    """
    d = _derive(spans)
    t = F.col("tags")
    e22 = d.filter((F.col("ev") == "22") & F.col("pkey").isNotNull()
                   & t["QueryName"].isNotNull())
    queried = e22.select(
        F.lit("QUERIED_DNS").alias("rel"),
        F.col("pkey").alias("src"),
        F.lower(t["QueryName"]).alias("dst"),
        t["QueryStatus"].alias("query_status"),
    ).dropDuplicates(["rel", "src", "dst"])

    results = e22.select(
        F.lower(t["QueryName"]).alias("qname"),
        F.explode(F.split(F.coalesce(t["QueryResults"], F.lit("")), ";")).alias("r"),
    )
    addr = F.regexp_replace(F.trim(F.col("r")), r"^::ffff:", "")
    resolved = (
        results.select("qname", addr.alias("addr"))
        .filter((F.col("addr") != "") & (F.col("addr") != "-")
                & ~F.col("addr").startswith("type:"))
        .select(
            F.lit("RESOLVED_TO").alias("rel"),
            F.col("qname").alias("src"),
            F.col("addr").alias("dst"),
            F.lit(None).cast("string").alias("query_status"),
        )
        .dropDuplicates(["rel", "src", "dst"])
    )
    return queried.unionByName(resolved)


def logon_edges(spans: DataFrame) -> DataFrame:
    """Security 4624/4625/4648 → ``LOGGED_ON`` / ``LOGON_FAILED`` /
    ``USED_EXPLICIT_CREDS`` edges from user to source address/host."""
    d = _derive(spans)
    t = F.col("tags")
    ev = F.col("ev")
    logons = d.filter(ev.isin("4624", "4625", "4648"))
    rel = (
        F.when(ev == "4624", "LOGGED_ON")
        .when(ev == "4625", "LOGON_FAILED")
        .otherwise("USED_EXPLICIT_CREDS")
    )
    user = F.coalesce(
        tag(t, "TargetUserName", "SubjectUserName"), F.lit("<unknown>")
    )
    source = F.coalesce(
        F.when(t["IpAddress"] == "-", None).otherwise(t["IpAddress"]),
        F.lower(t["WorkstationName"]),
        F.lit("<local>"),
    )
    return (
        logons.select(
            rel.alias("rel"),
            user.alias("src"),
            source.alias("dst"),
            t["LogonType"].alias("logon_type"),
            t["AuthenticationPackageName"].alias("auth_package"),
            F.col("ev").try_cast("long").alias("event_id"),
        )
        .dropDuplicates(["rel", "src", "dst", "logon_type"])
    )


def process_lifetimes(spans: DataFrame) -> DataFrame:
    """Join event 1 (create) with event 5 (terminate) per process key:
    (key, start_us, end_us, lifetime_us).  Processes missing either
    endpoint keep a NULL on that side (full outer)."""
    d = _derive(spans)
    starts = (
        d.filter((F.col("ev") == "1") & F.col("pkey").isNotNull())
        .groupBy(F.col("pkey").alias("key"))
        .agg(F.min("ord.start_time").alias("start_us"))
    )
    ends = (
        d.filter((F.col("ev") == "5") & F.col("pkey").isNotNull())
        .groupBy(F.col("pkey").alias("key"))
        .agg(F.max("ord.start_time").alias("end_us"))
    )
    return starts.join(ends, "key", "full_outer").withColumn(
        "lifetime_us", F.col("end_us") - F.col("start_us")
    )


def identity_stitch_mapping(spans: DataFrame) -> DataFrame:
    """(alias_key → canonical_key) for the dual-key identity quirk.

    A process appears as both ``{trace}:{pid}`` and its GUID when
    different events carry different identifiers.  Any span that has
    BOTH a GUID and a pid witnesses the equivalence; the mapping keeps
    the minimum GUID per (trace, pid) (deterministic under PID reuse —
    real PID-reuse disambiguation would need time intervals from
    :func:`process_lifetimes`).
    """
    d = _derive(spans)
    t = F.col("tags")
    pid = tag(t, "ProcessId", "process_id", "pid", "Pid", "processId")
    witnesses = d.filter(F.col("guid").isNotNull() & pid.isNotNull()).select(
        F.concat(F.col("trace_id"), F.lit(":"), pid).alias("alias_key"),
        F.col("guid").alias("canonical_key"),
    )
    # parent-side witnesses: ParentProcessGuid + ParentProcessId in one span
    ppid = tag(t, "ParentProcessId", "parent_pid", "ParentPid", "ppid",
               "parentPid", "sysmon.ppid")
    parent_wit = d.filter(F.col("pguid").isNotNull() & ppid.isNotNull()).select(
        F.concat(F.col("trace_id"), F.lit(":"), ppid).alias("alias_key"),
        F.col("pguid").alias("canonical_key"),
    )
    return (
        witnesses.unionByName(parent_wit)
        .groupBy("alias_key")
        .agg(F.min("canonical_key").alias("canonical_key"))
    )


def identity_intervals(spans: DataFrame) -> DataFrame:
    """Identity stitching v2 — TIME-SCOPED alias→canonical mapping:
    (alias_key, canonical_key, valid_from_us, valid_to_us), half-open
    intervals per alias.

    PID reuse breaks the v1 min-GUID mapping: after a process dies the
    OS hands its pid to an unrelated process, so one ``{trace}:{pid}``
    alias legitimately denotes DIFFERENT GUIDs at different times.
    Here each (alias, guid) witness pair opens an interval at the
    guid's creation time (event 1 via :func:`process_lifetimes`, else
    first witness) and closes where the alias's NEXT guid interval
    opens (a lead() window per alias — one shuffle).  The first
    interval is back-extended so pre-witness references still resolve.
    Resolve references with :func:`resolve_aliases`.
    """
    d = _derive(spans)
    t = F.col("tags")
    pid = tag(t, "ProcessId", "process_id", "pid", "Pid", "processId")
    ppid = tag(t, "ParentProcessId", "parent_pid", "ParentPid", "ppid",
               "parentPid", "sysmon.ppid")
    wit_main = d.filter(F.col("guid").isNotNull() & pid.isNotNull()).select(
        F.concat(F.col("trace_id"), F.lit(":"), pid).alias("alias_key"),
        F.col("guid").alias("canonical_key"),
        F.col("ord.start_time").alias("t"),
    )
    wit_parent = d.filter(F.col("pguid").isNotNull() & ppid.isNotNull()).select(
        F.concat(F.col("trace_id"), F.lit(":"), ppid).alias("alias_key"),
        F.col("pguid").alias("canonical_key"),
        F.col("ord.start_time").alias("t"),
    )
    wit = (
        wit_main.unionByName(wit_parent)
        .groupBy("alias_key", "canonical_key")
        .agg(F.min("t").alias("wit_min"))
    )
    life = process_lifetimes(spans).select(
        F.col("key").alias("canonical_key"), "start_us"
    )
    from pyspark.sql import Window

    joined = wit.join(life, "canonical_key", "left").select(
        "alias_key",
        "canonical_key",
        F.least(
            F.coalesce(F.col("start_us"), F.col("wit_min")), F.col("wit_min")
        ).alias("valid_from_us"),
    )
    w = Window.partitionBy("alias_key").orderBy("valid_from_us", "canonical_key")
    first = F.row_number().over(w) == 1
    nxt = F.lead("valid_from_us").over(w)
    return joined.select(
        "alias_key",
        "canonical_key",
        F.when(first, F.lit(-(2 ** 62))).otherwise(F.col("valid_from_us"))
        .alias("valid_from_us"),
        F.coalesce(nxt, F.lit(2 ** 62)).alias("valid_to_us"),
    )


def resolve_aliases(
    refs: DataFrame,
    intervals: DataFrame,
    key_col: str = "key",
    time_col: str = "t",
) -> DataFrame:
    """Resolve time-stamped alias references through an
    :func:`identity_intervals` mapping: adds ``resolved_key`` — the
    canonical GUID whose interval covers ``time_col``, or the original
    key when no mapping exists.  Implemented as the union+window as-of
    join (the two-big-tables plan — no range join, one shuffle)."""
    from graphdb_neo4j_spark.operators.temporal import asof_join

    right = intervals.select(
        F.col("alias_key").alias(key_col),
        F.col("valid_from_us").alias(time_col),
        "canonical_key",
    )
    out = asof_join(refs, right, on=time_col, by=key_col,
                    right_cols=["canonical_key"])
    return out.withColumn(
        "resolved_key",
        F.coalesce(F.col("canonical_key_right"), F.col(key_col)),
    ).drop("canonical_key_right")


def build_stitched_graph(traces: DataFrame, spans: DataFrame) -> "PropertyGraph":
    """Opt-in: the full graph build with TIME-AWARE identity stitching
    applied at the span level (stitching v2 end-to-end).

    Every process reference (``pkey`` / ``parent_key`` / ``dst_key``)
    is resolved through :func:`identity_intervals` BEFORE the graph
    fold, using each span's own timestamp — so a ``{trace}:{pid}``
    alias joins its GUID node, and a reused pid lands on the RIGHT
    GUID for its time window (the post-hoc :func:`stitch_graph`
    rewrite cannot disambiguate reuse because folded edges carry no
    time).  Default builds stay bug-compatible with the reference;
    this is the enriched variant.  Cost: one interval build + three
    as-of window joins over the span stream — all key-partitioned.
    """
    from graphdb_neo4j_spark.operators.ingest import (
        _build_graph_from_derived,
        _derive,
    )

    d = _derive(spans)
    iv = identity_intervals(spans)

    def resolved(col_name: str) -> DataFrame:
        refs = d.select(
            F.col(col_name).alias("key"),
            F.col("ord.start_time").alias("t"),
        ).filter(F.col("key").isNotNull()).distinct()
        return resolve_aliases(refs, iv).select(
            F.col("key").alias(f"__{col_name}"),
            F.col("t").alias(f"__t_{col_name}"),
            F.col("resolved_key").alias(f"__r_{col_name}"),
        )

    out = d
    for col_name in ("pkey", "parent_key", "dst_key"):
        m = resolved(col_name)
        out = (
            out.join(
                m,
                (out[col_name] == m[f"__{col_name}"])
                & (out["ord.start_time"] == m[f"__t_{col_name}"]),
                "left",
            )
            .withColumn(
                col_name,
                F.coalesce(F.col(f"__r_{col_name}"), F.col(col_name)),
            )
            .drop(f"__{col_name}", f"__t_{col_name}", f"__r_{col_name}")
        )
    return _build_graph_from_derived(traces, out)


def stitch_graph(g: PropertyGraph, mapping: DataFrame) -> PropertyGraph:
    """Rewrite edges/process keys through the alias→canonical mapping.

    Returns a new PropertyGraph where every ``{trace}:{pid}`` alias that
    has a known GUID is folded into the GUID node.  Node properties are
    merged preferring the canonical (GUID-keyed) node's values.
    """
    m = F.broadcast(mapping)

    def remap(df: DataFrame, col: str) -> DataFrame:
        return (
            df.join(m, df[col] == m["alias_key"], "left")
            .withColumn(col, F.coalesce(F.col("canonical_key"), F.col(col)))
            .drop("alias_key", "canonical_key")
        )

    edges = remap(remap(g.edges, "src"), "dst").dropDuplicates(["rel", "src", "dst"])
    proc = remap(g.process, "key")
    merged = proc.groupBy("key").agg(
        F.max("image").alias("image"),
        F.max("command_line").alias("command_line"),
        F.max("process_guid").alias("process_guid"),
        F.max("parent_process_guid").alias("parent_process_guid"),
    )
    return PropertyGraph(
        process=merged,
        registry_value=g.registry_value,
        wmi_filter=g.wmi_filter,
        wmi_consumer=g.wmi_consumer,
        simple=g.simple,
        edges=edges,
    )
