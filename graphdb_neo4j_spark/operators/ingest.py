"""Graph build (ingest) — the reference's event router as one Spark job.

Re-implements, Spark-first, the per-span Cypher-MERGE pipeline of
``/root/reference/events.py:265-519``: ~60k sequential Bolt round-trips
collapse into one declarative plan with a handful of shuffles (window
over process key, window over edge identity, distinct over simple
nodes).

Semantics replicated exactly (see SURVEY.md §1.3, §2.3):

* **pkey resolution** — ProcessGuid if truthy else ``{trace}:{pid}``;
  Source\\* override for events 8/10/25 (events.py:286-296).
* **truthiness coalesce** — falsy tag values (int64 0, bool false, "")
  were normalized to NULL at tag-map build (functions/etl.py), so plain
  ``F.coalesce`` is equivalent.
* **MERGE upsert conflict resolution** — writes are ordered by
  ``(file, start_time, span_idx, seq)`` (sorted glob → stable
  startTime sort → handler statement order).  Node props follow the
  reference's ON CREATE / ON MATCH asymmetry: the *first* write of a
  Process never stores ProcessGuid/ParentProcessGuid (ON CREATE omits
  them, events.py:80-88); later writes are last-non-null.  ``image`` /
  ``CommandLine`` are set on create (possibly NULL) then last-non-null.
  Edge props are bare ``SET`` → last-writer-wins including NULL, except
  ``TAMPERED.details`` (keep-old-if-new-null → last-non-null,
  events.py:173).
* **WMI BIND_TO order dependency** — the only edge whose endpoint nodes
  are MATCHed, not MERGEd (events.py:155-160): the bind silently no-ops
  unless both nodes already exist at that point of the stream.
  Replicated with an order-aware join against the first write of each
  WmiFilter/WmiConsumer name.
* **POSIX basename** — ``Image`` split on ``/`` only; backslashed
  Windows paths keep the full string (events.py:282).

Scale notes: the span DataFrame is persisted once and re-read by ~22
narrow projections (filter+project, no shuffle each); all conflict
resolution happens in 3 shuffles total (process-key window, edge
window, simple-node distinct).  At 100 TB the persist becomes a parquet
staging write; everything else is unchanged.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graphdb_neo4j_spark.functions.etl import (
    canon_event_id,
    posix_basename,
    reg_key_path,
    reg_value_name,
    tag,
)
from graphdb_neo4j_spark.sources.jaeger import read_spans, read_traces

# sparse edge-prop columns (FIXTURES.md §2); all string except event_id
EDGE_PROPS = [
    ("event_id", "long"),
    ("proto", "string"),
    ("dport", "string"),
    ("value_name", "string"),
    ("granted_access", "string"),
    ("details", "string"),
    ("mode", "string"),
    ("what", "string"),
    ("stream", "string"),
    ("hash", "string"),
]

SIMPLE_LABELS = ["Trace", "File", "Ip", "RegistryKey", "Pipe", "Device"]


@dataclass
class PropertyGraph:
    """The engine's canonical graph tables (FIXTURES.md §2)."""

    process: DataFrame  # key, image, command_line, process_guid, parent_process_guid
    registry_value: DataFrame  # path, value_name
    wmi_filter: DataFrame  # name, query
    wmi_consumer: DataFrame  # name, command
    simple: DataFrame  # label, key
    edges: DataFrame  # rel, src, dst, <EDGE_PROPS>

    def nodes(self) -> DataFrame:
        """Unified ``(label, key)`` view over every node table."""
        parts = [
            self.simple.select("label", "key"),
            self.process.select(F.lit("Process").alias("label"), "key"),
            self.registry_value.select(
                F.lit("RegistryValue").alias("label"), F.col("path").alias("key")
            ),
            self.wmi_filter.select(
                F.lit("WmiFilter").alias("label"), F.col("name").alias("key")
            ),
            self.wmi_consumer.select(
                F.lit("WmiConsumer").alias("label"), F.col("name").alias("key")
            ),
        ]
        return reduce(DataFrame.unionByName, parts)

    def node_counts(self) -> dict[str, int]:
        rows = self.nodes().groupBy("label").count().collect()
        return {r["label"]: r["count"] for r in rows}

    def edge_counts(self) -> dict[str, int]:
        rows = self.edges.groupBy("rel").count().collect()
        return {r["rel"]: r["count"] for r in rows}

    def save(self, path: str, fmt: str = "parquet") -> None:
        """Write graph tables; edges partitioned by rel, nodes by label,
        so rel/label predicates become partition pruning."""
        self.edges.write.format(fmt).mode("overwrite").partitionBy("rel").save(
            f"{path}/edges"
        )
        self.nodes().write.format(fmt).mode("overwrite").partitionBy("label").save(
            f"{path}/nodes"
        )
        self.process.write.format(fmt).mode("overwrite").save(f"{path}/process")
        self.registry_value.write.format(fmt).mode("overwrite").save(
            f"{path}/registry_value"
        )

    def save_bucketed(
        self, name_prefix: str = "graph", buckets: int = 32
    ) -> None:
        """Write edges twice, bucketed+sorted by ``src`` and by ``dst``.

        Bucketed tables let motif/traversal self-joins run WITHOUT a
        shuffle: a chain hop joins ``edges_by_dst.dst == edges_by_src
        .src`` and both sides arrive pre-bucketed on their join key, so
        Catalyst plans a SortMergeJoin with no Exchange.  At 100 TB the
        double write is the cheap part; the per-query shuffle it
        removes is the expensive one.  (Managed tables — location under
        spark.sql.warehouse.dir.)
        """
        spark = self.edges.sparkSession
        for name, key in (
            (f"{name_prefix}_edges_by_src", "src"),
            (f"{name_prefix}_edges_by_dst", "dst"),
        ):
            # the default in-memory metastore forgets tables across
            # sessions but their warehouse directories persist — clear
            # both so overwrite is truly idempotent
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
            loc = os.path.join(warehouse.removeprefix("file:"), name.lower())
            if os.path.exists(loc):
                shutil.rmtree(loc)
            (
                self.edges.write.bucketBy(buckets, key).sortBy(key)
                .mode("overwrite").format("parquet").saveAsTable(name)
            )

    def unpersist(self) -> None:
        pass


def _null(tpe: str = "string") -> Column:
    return F.lit(None).cast(tpe)


def _edge_row(rel: str, src: Column, dst: Column, **props: Column) -> list[Column]:
    cols = [F.lit(rel).alias("rel"), src.alias("src"), dst.alias("dst"), F.col("ord")]
    for name, tpe in EDGE_PROPS:
        cols.append(props.get(name, _null(tpe)).alias(name))
    return cols


def _derive(spans: DataFrame) -> DataFrame:
    """Add the per-span routing/identity columns of events.py:265-296."""
    t = F.col("tags")
    ev = canon_event_id(t)
    is_src_override = ev.isin("8", "10", "25")

    guid0 = tag(t, "ProcessGuid", "process_guid", "ProcessGUID")
    guid = F.when(
        is_src_override,
        F.coalesce(
            guid0, tag(t, "SourceProcessGuid", "SourceProcessGUID", "source_process_guid")
        ),
    ).otherwise(guid0)

    pid0 = tag(t, "ProcessId", "process_id", "pid", "Pid", "processId")
    pid = F.when(
        is_src_override, F.coalesce(pid0, tag(t, "SourceProcessId", "source_process_id"))
    ).otherwise(pid0)

    img0 = tag(t, "Image", "process_path", "ImagePath", "image", "PathToImage")
    img_raw = F.when(is_src_override, F.coalesce(img0, t["SourceImage"])).otherwise(img0)

    pguid = tag(t, "ParentProcessGuid", "parent_process_guid", "ParentProcessGUID")
    ppid = tag(
        t, "ParentProcessId", "parent_pid", "ParentPid", "ppid", "parentPid", "sysmon.ppid"
    )

    trace = F.col("trace_id")
    pkey = F.when(guid.isNotNull(), guid).when(
        pid.isNotNull(), F.concat(trace, F.lit(":"), pid)
    )
    parent_key = F.when(pguid.isNotNull(), pguid).when(
        ppid.isNotNull(), F.concat(trace, F.lit(":"), ppid)
    )

    dst_guid = tag(t, "TargetProcessGuid", "TargetProcessGUID", "target_process_guid")
    dst_pid = tag(t, "TargetProcessId", "TargetPid")
    dst_key = F.when(dst_guid.isNotNull(), dst_guid).when(
        dst_pid.isNotNull(), F.concat(trace, F.lit(":"), dst_pid)
    )

    return spans.select(
        "trace_id",
        "tags",
        F.struct("file", "start_time", "span_idx").alias("ord"),
        ev.alias("ev"),
        ev.try_cast("long").alias("ev_long"),
        guid.alias("guid"),
        pguid.alias("pguid"),
        posix_basename(img_raw).alias("image"),
        tag(t, "CommandLine", "command_line").alias("cmd"),
        pkey.alias("pkey"),
        parent_key.alias("parent_key"),
        dst_guid.alias("dst_guid"),
        dst_key.alias("dst_key"),
    )


def build_graph_from_spans(traces: DataFrame, spans: DataFrame) -> PropertyGraph:
    return _build_graph_from_derived(traces, _derive(spans))


def _build_graph_from_derived(traces: DataFrame, derived: DataFrame) -> PropertyGraph:
    """Graph build over an already-derived span DF (the output of
    :func:`_derive`, possibly round-tripped through a parquet stage)."""
    d = derived.persist()
    # ~22 event branches each scan this cache; right-size partitions to
    # ~50k spans apiece so small corpora don't pay 22 × n_partitions of
    # task overhead (a no-op at real scale, where spans >> 50k/partition)
    n_spans = d.count()
    current = d.rdd.getNumPartitions()
    target = max(1, min(current, n_spans // 50_000 + 1))
    if target < current:
        d = d.coalesce(target)
    t = F.col("tags")

    # ------------------------------------------------------------------
    # Process writes: main span + parent stub + event-8/10/25 target stub
    # (each CYPHER["process"] call also MERGEs Trace-[:HAS_PROCESS]->p).
    # seq encodes statement order within one span for upsert resolution.
    # ------------------------------------------------------------------
    def pw(df: DataFrame, seq: int, key: Column, guid: Column, pguid: Column,
           image: Column, cmd: Column) -> DataFrame:
        return df.select(
            F.struct(
                F.col("ord.file"), F.col("ord.start_time"), F.col("ord.span_idx"),
                F.lit(seq).alias("seq"),
            ).alias("word"),
            key.alias("key"),
            F.col("trace_id"),
            guid.alias("w_guid"),
            pguid.alias("w_pguid"),
            image.alias("w_image"),
            cmd.alias("w_cmd"),
        )

    has_pkey = d.filter(F.col("pkey").isNotNull())
    main_w = pw(has_pkey, 0, F.col("pkey"), F.col("guid"), F.col("pguid"),
                F.col("image"), F.col("cmd"))
    # parent stub passes ProcessGuid=pguid (NULL on the ppid path),
    # everything else NULL (events.py:312-317)
    parent_w = pw(
        has_pkey.filter(F.col("parent_key").isNotNull()), 1,
        F.col("parent_key"), F.col("pguid"), _null(), _null(), _null(),
    )
    target_w = pw(
        d.filter(F.col("ev").isin("8", "10", "25")
                 & F.col("pkey").isNotNull() & F.col("dst_key").isNotNull()),
        2, F.col("dst_key"), F.col("dst_guid"), _null(), _null(), _null(),
    )
    writes = main_w.unionByName(parent_w).unionByName(target_w)

    wk = Window.partitionBy("key").orderBy("word")
    wk_all = wk.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    rn = F.row_number().over(wk)
    # ON CREATE SET omits ProcessGuid/ParentProcessGuid → the creating
    # write's values are dropped (events.py:80-88)
    guid_eff = F.when(rn == 1, _null()).otherwise(F.col("w_guid"))
    pguid_eff = F.when(rn == 1, _null()).otherwise(F.col("w_pguid"))
    process = (
        writes.withColumn("process_guid", F.last(guid_eff, ignorenulls=True).over(wk_all))
        .withColumn("parent_process_guid", F.last(pguid_eff, ignorenulls=True).over(wk_all))
        .withColumn("image_f", F.last("w_image", ignorenulls=True).over(wk_all))
        .withColumn("command_line", F.last("w_cmd", ignorenulls=True).over(wk_all))
        .select("key", F.col("image_f").alias("image"), "command_line",
                "process_guid", "parent_process_guid")
        .dropDuplicates(["key"])
    )

    has_process = writes.select(
        F.lit("HAS_PROCESS").alias("rel"),
        F.col("trace_id").alias("src"),
        F.col("key").alias("dst"),
        F.struct(
            F.col("word.file").alias("file"),
            F.col("word.start_time").alias("start_time"),
            F.col("word.span_idx").alias("span_idx"),
        ).alias("ord"),
        *[_null(tpe).alias(name) for name, tpe in EDGE_PROPS],
    )
    spawns = has_pkey.filter(F.col("parent_key").isNotNull()).select(
        *_edge_row("SPAWNS", F.col("parent_key"), F.col("pkey"))
    )

    # ------------------------------------------------------------------
    # Event-specific branches (events.py:321-504)
    # ------------------------------------------------------------------
    evp = F.col("ev_long")
    simple_nodes: list[DataFrame] = [
        traces.select(F.lit("Trace").alias("label"), F.col("trace_id").alias("key"))
    ]
    edge_parts: list[DataFrame] = [spawns]

    def node(df: DataFrame, label: str, key: Column) -> None:
        simple_nodes.append(df.select(F.lit(label).alias("label"), key.alias("key")))

    def edge(df: DataFrame, rel: str, src: Column, dst: Column, **props: Column) -> None:
        edge_parts.append(df.select(*_edge_row(rel, src, dst, **props)))

    target = tag(t, "TargetFilename", "Path")

    # 2: FileCreateTime changed
    e2 = d.filter((F.col("ev") == "2") & F.col("pkey").isNotNull() & target.isNotNull())
    node(e2, "File", target)
    edge(e2, "MODIFIED_FILE_TIME", F.col("pkey"), target,
         event_id=evp, what=F.lit("CreationTime"))

    # 3: NetworkConnect — ip row and (lowercased) hostname row
    e3 = d.filter((F.col("ev") == "3") & F.col("pkey").isNotNull())
    dip = tag(t, "DestinationIp", "dst_ip")
    dport = tag(t, "DestinationPort", "dst_port")
    proto = t["Protocol"]
    dhost_l = F.lower(t["DestinationHostname"])
    e3ip = e3.filter(dip.isNotNull())
    node(e3ip, "Ip", dip)
    edge(e3ip, "CONNECTED_TO", F.col("pkey"), dip, event_id=evp, proto=proto, dport=dport)
    e3host = e3.filter(t["DestinationHostname"].isNotNull())
    node(e3host, "Ip", dhost_l)
    edge(e3host, "CONNECTED_TO", F.col("pkey"), dhost_l,
         event_id=evp, proto=proto, dport=dport)

    # 6 / 7: driver / module load
    img_loaded = tag(t, "ImageLoaded", "Image")
    for ev_id, rel in (("6", "LOADED_DRIVER"), ("7", "LOADED_MODULE")):
        e = d.filter((F.col("ev") == ev_id) & F.col("pkey").isNotNull()
                     & img_loaded.isNotNull())
        node(e, "File", img_loaded)
        edge(e, rel, F.col("pkey"), img_loaded, event_id=evp)

    # 8: CreateRemoteThread (target Process stub already in `writes`)
    e8 = d.filter((F.col("ev") == "8") & F.col("pkey").isNotNull()
                  & F.col("dst_key").isNotNull())
    edge(e8, "INJECTED_THREAD", F.col("pkey"), F.col("dst_key"), event_id=evp)

    # 9: RawAccessRead
    e9 = d.filter((F.col("ev") == "9") & F.col("pkey").isNotNull()
                  & t["Device"].isNotNull())
    node(e9, "Device", t["Device"])
    edge(e9, "RAW_READ", F.col("pkey"), t["Device"], event_id=evp)

    # 10: ProcessAccess
    e10 = d.filter((F.col("ev") == "10") & F.col("pkey").isNotNull()
                   & F.col("dst_key").isNotNull())
    edge(e10, "ACCESSED_PROCESS", F.col("pkey"), F.col("dst_key"),
         event_id=evp, granted_access=t["GrantedAccess"])

    # 11: FileCreate
    e11 = d.filter((F.col("ev") == "11") & F.col("pkey").isNotNull() & target.isNotNull())
    node(e11, "File", target)
    edge(e11, "CREATED_FILE", F.col("pkey"), target, event_id=evp)

    # 12: RegistryKey create/delete — EventType prefix routing; note
    # "DeleteValue" also lands on DELETED_REG_KEY (reference quirk,
    # events.py:395-405)
    e12 = d.filter((F.col("ev") == "12") & F.col("pkey").isNotNull()
                   & t["TargetObject"].isNotNull())
    etype_l = F.lower(F.coalesce(t["EventType"], F.lit("")))
    node(e12, "RegistryKey", t["TargetObject"])
    edge(e12.filter(etype_l.startswith("create")), "CREATED_REG_KEY",
         F.col("pkey"), t["TargetObject"], event_id=evp)
    edge(e12.filter(etype_l.startswith("delete")), "DELETED_REG_KEY",
         F.col("pkey"), t["TargetObject"], event_id=evp)

    # 13: RegistryValueSet — TargetObject splits into key path + value name
    e13 = d.filter((F.col("ev") == "13") & F.col("pkey").isNotNull()
                   & t["TargetObject"].isNotNull())
    kp = reg_key_path(t["TargetObject"])
    vn = reg_value_name(t["TargetObject"])
    node(e13.filter(kp.isNotNull()), "RegistryKey", kp)
    reg_value_writes = e13.select(
        t["TargetObject"].alias("path"), vn.alias("w_value_name"), F.col("ord"))
    edge(e13.filter(kp.isNotNull()), "UNDER_KEY", t["TargetObject"], kp)
    edge(e13, "SET_REG_VALUE", F.col("pkey"), t["TargetObject"],
         event_id=evp, value_name=vn)

    # 14: Registry rename.  NOTE deliberate parity-by-omission: the
    # reference ships a RENAMED_REG_VALUE Cypher template
    # (/root/reference/events.py:231-238) but its event-14 handler only
    # ever calls renamed_reg_key (events.py:420-427) — the value-rename
    # template is dead code, so no RENAMED_REG_VALUE edge exists here
    # either.
    e14 = d.filter((F.col("ev") == "14") & F.col("pkey").isNotNull()
                   & t["TargetObject"].isNotNull()
                   & tag(t, "NewName", "NewDetails").isNotNull())
    new_name = tag(t, "NewName", "NewDetails")
    node(e14, "RegistryKey", t["TargetObject"])
    node(e14, "RegistryKey", new_name)
    edge(e14, "RENAMED_REG_KEY", F.col("pkey"), new_name, event_id=evp)
    edge(e14, "RENAMED_TO", t["TargetObject"], new_name)

    # 15: FileCreateStreamHash
    e15 = d.filter((F.col("ev") == "15") & F.col("pkey").isNotNull() & target.isNotNull())
    node(e15, "File", target)
    edge(e15, "CREATED_STREAM", F.col("pkey"), target, event_id=evp,
         stream=tag(t, "StreamName", "Stream"), hash=tag(t, "Hash", "Hashes"))

    # 17 / 18: pipes
    pname = tag(t, "PipeName", "Pipe")
    for ev_id, rel in (("17", "CREATED_PIPE"), ("18", "CONNECTED_PIPE")):
        e = d.filter((F.col("ev") == ev_id) & F.col("pkey").isNotNull()
                     & pname.isNotNull())
        node(e, "Pipe", pname)
        edge(e, rel, F.col("pkey"), pname, event_id=evp)

    # 19 / 20: WMI filter / consumer nodes (props last-non-null via
    # SET x = coalesce($new, x))
    e19 = d.filter((F.col("ev") == "19") & F.col("pkey").isNotNull()
                   & tag(t, "FilterName", "Name", "EventFilterName").isNotNull())
    wmi_filter_writes = e19.select(
        tag(t, "FilterName", "Name", "EventFilterName").alias("name"),
        tag(t, "Query", "QueryName").alias("w_query"), F.col("ord"))
    e20 = d.filter((F.col("ev") == "20") & F.col("pkey").isNotNull()
                   & tag(t, "ConsumerName", "Name", "Consumer").isNotNull())
    wmi_consumer_writes = e20.select(
        tag(t, "ConsumerName", "Name", "Consumer").alias("name"),
        tag(t, "CommandLine", "Command").alias("w_command"), F.col("ord"))

    # 21: BIND_TO — MATCH (not MERGE) on both endpoints: the edge only
    # lands if both nodes exist *earlier* in the stream (events.py:155-160)
    e21 = d.filter((F.col("ev") == "21") & F.col("pkey").isNotNull()
                   & tag(t, "FilterName", "Filter").isNotNull()
                   & tag(t, "ConsumerName", "Consumer").isNotNull())
    bind_candidates = e21.select(
        tag(t, "FilterName", "Filter").alias("f_name"),
        tag(t, "ConsumerName", "Consumer").alias("c_name"),
        F.col("ord"), evp.alias("event_id"))
    f_first = wmi_filter_writes.groupBy("name").agg(F.min("ord").alias("f_first"))
    c_first = wmi_consumer_writes.groupBy("name").agg(F.min("ord").alias("c_first"))
    binds = (
        bind_candidates
        .join(F.broadcast(f_first), bind_candidates["f_name"] == f_first["name"])
        .join(F.broadcast(c_first), bind_candidates["c_name"] == c_first["name"])
        .filter((F.col("f_first") < F.col("ord")) & (F.col("c_first") < F.col("ord")))
    )
    edge_parts.append(binds.select(*_edge_row(
        "BIND_TO", F.col("f_name"), F.col("c_name"), event_id=F.col("event_id"))))

    # 23 / 26: FileDelete
    e23 = d.filter(F.col("ev").isin("23", "26") & F.col("pkey").isNotNull()
                   & target.isNotNull())
    node(e23, "File", target)
    edge(e23, "DELETED_FILE", F.col("pkey"), target, event_id=evp)

    # 25: ProcessTampering (details keeps old when new is NULL)
    e25 = d.filter((F.col("ev") == "25") & F.col("pkey").isNotNull()
                   & F.col("dst_key").isNotNull())
    edge(e25, "TAMPERED", F.col("pkey"), F.col("dst_key"),
         event_id=evp, details=tag(t, "Details", "Info"))

    # 27 / 29: executable blocked / detected
    for ev_id, mode in (("27", "blocked"), ("29", "detected")):
        e = d.filter((F.col("ev") == ev_id) & F.col("pkey").isNotNull()
                     & target.isNotNull())
        node(e, "File", target)
        edge(e, "CREATED_EXECUTABLE", F.col("pkey"), target,
             event_id=evp, mode=F.lit(mode))

    # ------------------------------------------------------------------
    # Conflict resolution + dedup
    # ------------------------------------------------------------------
    edges_all = reduce(DataFrame.unionByName, edge_parts + [has_process])
    we = Window.partitionBy("rel", "src", "dst").orderBy("ord")
    we_all = we.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    prop_cols = [
        F.last("details", ignorenulls=True).over(we_all).alias("details")
        if name == "details"
        else F.last(name).over(we_all).alias(name)
        for name, _ in EDGE_PROPS
    ]
    edges = (
        edges_all.select("rel", "src", "dst", *prop_cols)
        .dropDuplicates(["rel", "src", "dst"])
    )

    simple = (
        reduce(DataFrame.unionByName, simple_nodes)
        .filter(F.col("key").isNotNull())
        .distinct()
    )

    wrv = Window.partitionBy("path").orderBy("ord")
    wrv_all = wrv.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    registry_value = (
        reg_value_writes
        .withColumn("value_name", F.last("w_value_name").over(wrv_all))
        .select("path", "value_name")
        .dropDuplicates(["path"])
    )

    def _wmi(writes_df: DataFrame, src_col: str, out_col: str) -> DataFrame:
        w = Window.partitionBy("name").orderBy("ord")
        w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        return (
            writes_df.withColumn(out_col, F.last(src_col, ignorenulls=True).over(w_all))
            .select("name", out_col)
            .dropDuplicates(["name"])
        )

    return PropertyGraph(
        process=process,
        registry_value=registry_value,
        wmi_filter=_wmi(wmi_filter_writes, "w_query", "query"),
        wmi_consumer=_wmi(wmi_consumer_writes, "w_command", "command"),
        simple=simple,
        edges=edges,
    )


def corpus_fingerprint(path_glob: str) -> str:
    """Cheap corpus-version key: md5 over sorted (basename, size) — a
    file added, removed, renamed, or resized invalidates the stage."""
    import glob as globmod
    import hashlib

    h = hashlib.md5()
    files = sorted(globmod.glob(path_glob))
    for f in files:
        h.update(f"{os.path.basename(f)}|{os.stat(f).st_size}\n".encode())
    h.update(str(len(files)).encode())
    return h.hexdigest()[:16]


def stage_corpus(spark: SparkSession, path: str, stage_dir: str) -> str:
    """Parse the trace-JSON corpus ONCE into a parquet stage keyed by
    corpus fingerprint; return the stage path.

    The multiLine JSON parse of thousands of tiny files dominates
    ingest cost (one task per file, full JSON tokenization).  The stage
    holds the *derived* span table — routing/identity columns already
    computed — compacted to a few parquet files, so every rebuild
    afterwards is a columnar read.  This is exactly the at-scale
    pattern: raw JSON lands once, the staged columnar table is the
    thing every job reads.  Idempotent: an existing stage for the same
    fingerprint is reused, a changed corpus writes a new one.
    """
    from graphdb_neo4j_spark.sources.jaeger import spans_from_traces

    fp = corpus_fingerprint(path)
    sd = os.path.join(stage_dir, fp)
    marker = os.path.join(sd, "_STAGED")
    if not os.path.exists(marker):
        traces = read_traces(spark, path).persist()
        d = _derive(spans_from_traces(traces))
        # ~60k spans: a handful of compacted files beats 1,202 tiny ones
        par = spark.sparkContext.defaultParallelism
        d.coalesce(max(1, par // 4)).write.mode("overwrite").parquet(
            os.path.join(sd, "spans")
        )
        traces.select("trace_id").write.mode("overwrite").parquet(
            os.path.join(sd, "traces")
        )
        traces.unpersist()
        with open(marker, "w") as fh:
            fh.write(fp)
    return sd


def build_graph(
    spark: SparkSession, path: str, stage_dir: str | None = None
) -> PropertyGraph:
    """End-to-end: trace-JSON glob → property-graph tables.

    Without ``stage_dir`` the JSON corpus is parsed ONCE per call: the
    trace-level DataFrame is persisted and both the Trace nodes and the
    exploded span stream derive from it (multiLine JSON parse dominates
    ingest cost).  With ``stage_dir`` the parse happens once per corpus
    VERSION (see :func:`stage_corpus`) and rebuilds read the columnar
    stage."""
    from graphdb_neo4j_spark.sources.jaeger import spans_from_traces

    if stage_dir is not None:
        sd = stage_corpus(spark, path, stage_dir)
        traces = spark.read.parquet(os.path.join(sd, "traces"))
        derived = spark.read.parquet(os.path.join(sd, "spans"))
        return _build_graph_from_derived(traces, derived)

    traces = read_traces(spark, path).persist()
    return build_graph_from_spans(traces, spans_from_traces(traces))
