"""Pure-Python semantic oracle for the ingest pipeline.

An independent, from-the-spec re-implementation of the reference
loader's *graph-shape* semantics (SURVEY.md §1-2): given parsed trace
dicts it returns the node-key sets per label and edge identity sets per
relationship.  Used by property-based tests to check the Spark engine
on generated inputs; intentionally written set-based (not Cypher-like)
so the two implementations share no structure.
"""

from __future__ import annotations

from collections import defaultdict


def _truthy(d: dict, *keys):
    for k in keys:
        if k in d and d[k]:
            return d[k]
    return None


def _posix_basename(s: str) -> str:
    return s.rsplit("/", 1)[-1]


def _reg_split(target: str):
    stripped = str(target).rstrip("\\")
    if "\\" in stripped:
        key, _, name = stripped.rpartition("\\")
        return key, name
    return target, None


def _sval(v):
    """JSON tag value → the engine's normalized STRING form.

    Mirrors sources/jaeger.tags_map: every tag is read through a
    StringType schema (int 443 → "443", bool → "true"/"false") and
    falsy-per-JSON-type values (0, False, "") normalize to NULL.  The
    string "0" is truthy in Python and stays."""
    if v is None or v is False or v == "":
        return None
    if v is True:
        return "true"
    if isinstance(v, (int, float)) and v == 0:
        return None
    return str(v)


def derive_spans(traces: list[dict], filenames: list[str]):
    """Per-span derived rows mirroring operators/ingest._derive — the
    routing/identity columns (ev, pkey, parent_key, dst_key, guid,
    pguid, image-basename, cmd) plus the global ordering key
    (file, start_time, span_idx).  ``tm`` is the normalized string tag
    map (falsy→NULL, last-dup-wins).  Yields rows in global ``ord``
    order (files in sorted-name order, spans by (start_time, span_idx))."""
    out = []
    for doc, fname in zip(traces, filenames):
        trace_id = doc.get("traceID") or f"FILE::{fname}"
        raw_spans = doc.get("spans", [])
        order = sorted(
            range(len(raw_spans)), key=lambda i: raw_spans[i].get("startTime") or 0
        )
        for i in order:
            span = raw_spans[i]
            tm = {}
            for t in span.get("tags", []):
                tm[t.get("key")] = _sval(t.get("value"))

            def tg(*keys):
                for k in keys:
                    if tm.get(k) is not None:
                        return tm[k]
                return None

            # canon_event_id: string EventID int-coerces ("0" → falsy)
            ev = tm.get("EventID")
            if ev is not None:
                try:
                    ev = str(int(ev)) if int(ev) != 0 else None
                except ValueError:
                    pass
            if ev is None:
                ev = tm.get("ID")
            ev_s = str(ev) if ev is not None else None

            guid = tg("ProcessGuid", "process_guid", "ProcessGUID")
            pid = tg("ProcessId", "process_id", "pid", "Pid", "processId")
            img = tg("Image", "process_path", "ImagePath", "image", "PathToImage")
            if ev_s in {"8", "10", "25"}:
                guid = guid or tg(
                    "SourceProcessGuid", "SourceProcessGUID", "source_process_guid"
                )
                pid = pid or tg("SourceProcessId", "source_process_id")
                img = img or tm.get("SourceImage")
            pguid = tg("ParentProcessGuid", "parent_process_guid", "ParentProcessGUID")
            ppid = tg(
                "ParentProcessId", "parent_pid", "ParentPid", "ppid",
                "parentPid", "sysmon.ppid",
            )
            pkey = guid if guid else (f"{trace_id}:{pid}" if pid else None)
            parent_key = pguid if pguid else (f"{trace_id}:{ppid}" if ppid else None)
            dst_guid = tg("TargetProcessGuid", "TargetProcessGUID", "target_process_guid")
            dst_pid = tg("TargetProcessId", "TargetPid")
            dst_key = (
                dst_guid if dst_guid
                else (f"{trace_id}:{dst_pid}" if dst_pid else None)
            )
            out.append({
                "trace_id": trace_id,
                "file": fname,
                "span_idx": i,
                "start_time": span.get("startTime") or 0,
                "tm": tm,
                "ev": ev_s,
                "guid": guid,
                "pguid": pguid,
                # posix basename of str(img or ""): split on "/" only
                "image": (img or "").rsplit("/", 1)[-1],
                "cmd": tg("CommandLine", "command_line"),
                "pkey": pkey,
                "parent_key": parent_key,
                "dst_guid": dst_guid,
                "dst_key": dst_key,
            })
    return out


# the ten sparse edge-prop columns (operators/ingest.EDGE_PROPS order)
EDGE_PROP_NAMES = (
    "event_id", "proto", "dport", "value_name", "granted_access",
    "details", "mode", "what", "stream", "hash",
)


def simulate_full(traces: list[dict], filenames: list[str]):
    """Nodes, edges AND properties — the full property-graph semantics
    of operators/ingest._build_graph_from_derived, independently
    re-implemented as one ordered sequential pass:

    * edge props: per (rel, src, dst) the LAST edge row (by ord) wins
      every prop, EXCEPT ``details`` which is last-NON-NULL
      (TAMPERED keep-old, events.py SET asymmetry);
    * Process props: per key ordered writes (main seq 0, parent stub
      seq 1, ev-8/10/25 target stub seq 2); the CREATING write's
      guid/pguid are dropped (ON CREATE SET omits them), every prop
      then resolves last-non-null;
    * RegistryValue.value_name: last write wins including NULL;
    * WmiFilter.query / WmiConsumer.command: last-non-null;
    * BIND_TO only lands when both endpoints exist strictly earlier.

    Returns (nodes, edges, props) where nodes/edges match
    :func:`simulate` and props = dict with per-table property dicts.
    """
    rows = derive_spans(traces, filenames)
    nodes: dict[str, set] = defaultdict(set)
    # Trace nodes come from the trace-file row, not its spans — a
    # zero-span file still MERGEs its Trace (read_traces → traces DF)
    for doc, fname in zip(traces, filenames):
        nodes["Trace"].add(doc.get("traceID") or f"FILE::{fname}")
    edge_props: dict[tuple, dict] = {}
    proc: dict[str, dict] = {}
    regval: dict[str, str | None] = {}
    wmi_filter: dict[str, str | None] = {}
    wmi_consumer: dict[str, str | None] = {}
    f_seen: set[str] = set()
    c_seen: set[str] = set()

    def edge(rel, src, dst, **props):
        ident = (rel, src, dst)
        old = edge_props.get(ident)
        new = {p: props.get(p) for p in EDGE_PROP_NAMES}
        if old is not None and new["details"] is None:
            new["details"] = old["details"]
        edge_props[ident] = new

    def proc_write(key, guid, pguid, image, cmd):
        st = proc.get(key)
        if st is None:
            # creating write: ON CREATE SET drops ProcessGuid/ParentProcessGuid
            proc[key] = {
                "image": image, "command_line": cmd,
                "process_guid": None, "parent_process_guid": None,
            }
            return
        if guid is not None:
            st["process_guid"] = guid
        if pguid is not None:
            st["parent_process_guid"] = pguid
        if image is not None:
            st["image"] = image
        if cmd is not None:
            st["command_line"] = cmd

    for r in rows:
        trace_id, tm, ev_s = r["trace_id"], r["tm"], r["ev"]
        nodes["Trace"].add(trace_id)
        pkey, parent_key, dst_key = r["pkey"], r["parent_key"], r["dst_key"]
        try:
            evp = int(ev_s)
        except (TypeError, ValueError):
            evp = None

        def tg(*keys):
            for k in keys:
                if tm.get(k) is not None:
                    return tm[k]
            return None

        if pkey:
            nodes["Process"].add(pkey)
            edge("HAS_PROCESS", trace_id, pkey)
            # main write (seq 0): image is basename-of-(img or "") — "",
            # not NULL, when the tag is absent (posix_basename coalesce)
            proc_write(pkey, r["guid"], r["pguid"], r["image"], r["cmd"])
            if parent_key:
                nodes["Process"].add(parent_key)
                edge("HAS_PROCESS", trace_id, parent_key)
                edge("SPAWNS", parent_key, pkey)
                # parent stub (seq 1): ProcessGuid=pguid, rest NULL
                proc_write(parent_key, r["pguid"], None, None, None)
        if ev_s in {"8", "10", "25"} and pkey and dst_key:
            nodes["Process"].add(dst_key)
            edge("HAS_PROCESS", trace_id, dst_key)
            # target stub (seq 2)
            proc_write(dst_key, r["dst_guid"], None, None, None)
            rel = {"8": "INJECTED_THREAD", "10": "ACCESSED_PROCESS",
                   "25": "TAMPERED"}[ev_s]
            if ev_s == "25":
                edge(rel, pkey, dst_key, event_id=evp,
                     details=tg("Details", "Info"))
            elif ev_s == "10":
                edge(rel, pkey, dst_key, event_id=evp,
                     granted_access=tm.get("GrantedAccess"))
            else:
                edge(rel, pkey, dst_key, event_id=evp)

        target = tg("TargetFilename", "Path")
        if ev_s == "2" and pkey and target:
            nodes["File"].add(target)
            edge("MODIFIED_FILE_TIME", pkey, target, event_id=evp,
                 what="CreationTime")
        if ev_s == "3" and pkey:
            dip = tg("DestinationIp", "dst_ip")
            dport = tg("DestinationPort", "dst_port")
            proto = tm.get("Protocol")
            dhost = tm.get("DestinationHostname")
            if dip:
                nodes["Ip"].add(dip)
                edge("CONNECTED_TO", pkey, dip,
                     event_id=evp, proto=proto, dport=dport)
            if dhost:
                nodes["Ip"].add(dhost.lower())
                edge("CONNECTED_TO", pkey, dhost.lower(),
                     event_id=evp, proto=proto, dport=dport)
        if ev_s in {"6", "7"} and pkey:
            img2 = tg("ImageLoaded", "Image")
            if img2:
                nodes["File"].add(img2)
                rel = "LOADED_DRIVER" if ev_s == "6" else "LOADED_MODULE"
                edge(rel, pkey, img2, event_id=evp)
        if ev_s == "9" and pkey and tm.get("Device"):
            nodes["Device"].add(tm["Device"])
            edge("RAW_READ", pkey, tm["Device"], event_id=evp)
        if ev_s == "11" and pkey and target:
            nodes["File"].add(target)
            edge("CREATED_FILE", pkey, target, event_id=evp)
        if ev_s == "12" and pkey and tm.get("TargetObject"):
            kpath = tm["TargetObject"]
            nodes["RegistryKey"].add(kpath)
            low = (tm.get("EventType") or "").lower()
            if low.startswith("create"):
                edge("CREATED_REG_KEY", pkey, kpath, event_id=evp)
            elif low.startswith("delete"):
                edge("DELETED_REG_KEY", pkey, kpath, event_id=evp)
        if ev_s == "13" and pkey and tm.get("TargetObject"):
            tgt = tm["TargetObject"]
            kp, vn = _reg_split(tgt)
            if kp:
                nodes["RegistryKey"].add(kp)
                edge("UNDER_KEY", tgt, kp)
            nodes["RegistryValue"].add(tgt)
            regval[tgt] = vn  # last write wins INCLUDING None
            edge("SET_REG_VALUE", pkey, tgt, event_id=evp, value_name=vn)
        if ev_s == "14" and pkey and tm.get("TargetObject"):
            new_name = tg("NewName", "NewDetails")
            if new_name:
                nodes["RegistryKey"].add(tm["TargetObject"])
                nodes["RegistryKey"].add(new_name)
                edge("RENAMED_REG_KEY", pkey, new_name, event_id=evp)
                edge("RENAMED_TO", tm["TargetObject"], new_name)
        if ev_s == "15" and pkey and target:
            nodes["File"].add(target)
            edge("CREATED_STREAM", pkey, target, event_id=evp,
                 stream=tg("StreamName", "Stream"), hash=tg("Hash", "Hashes"))
        if ev_s in {"17", "18"} and pkey:
            pname = tg("PipeName", "Pipe")
            if pname:
                nodes["Pipe"].add(pname)
                rel = "CREATED_PIPE" if ev_s == "17" else "CONNECTED_PIPE"
                edge(rel, pkey, pname, event_id=evp)
        if ev_s == "19" and pkey:
            fname_ = tg("FilterName", "Name", "EventFilterName")
            if fname_:
                nodes["WmiFilter"].add(fname_)
                q = tg("Query", "QueryName")
                if fname_ not in wmi_filter:
                    wmi_filter[fname_] = q
                elif q is not None:
                    wmi_filter[fname_] = q
                f_seen.add(fname_)
        if ev_s == "20" and pkey:
            cname = tg("ConsumerName", "Name", "Consumer")
            if cname:
                nodes["WmiConsumer"].add(cname)
                cc = tg("CommandLine", "Command")
                if cname not in wmi_consumer:
                    wmi_consumer[cname] = cc
                elif cc is not None:
                    wmi_consumer[cname] = cc
                c_seen.add(cname)
        if ev_s == "21" and pkey:
            fn = tg("FilterName", "Filter")
            cn = tg("ConsumerName", "Consumer")
            if fn and cn and fn in f_seen and cn in c_seen:
                edge("BIND_TO", fn, cn, event_id=evp)
        if ev_s in {"23", "26"} and pkey and target:
            nodes["File"].add(target)
            edge("DELETED_FILE", pkey, target, event_id=evp)
        if ev_s in {"27", "29"} and pkey and target:
            nodes["File"].add(target)
            edge("CREATED_EXECUTABLE", pkey, target, event_id=evp,
                 mode="blocked" if ev_s == "27" else "detected")

    edges: dict[str, set] = defaultdict(set)
    for (rel, src, dst) in edge_props:
        edges[rel].add((src, dst))
    props = {
        "edge": edge_props,
        "process": proc,
        "registry_value": regval,
        "wmi_filter": wmi_filter,
        "wmi_consumer": wmi_consumer,
    }
    return dict(nodes), dict(edges), props


def simulate(traces: list[dict], filenames: list[str]):
    """traces: parsed JSON dicts in sorted-filename order."""
    nodes: dict[str, set] = defaultdict(set)
    edges: dict[str, set] = defaultdict(set)
    wmi_filters_seen: set[str] = set()
    wmi_consumers_seen: set[str] = set()

    for doc, fname in zip(traces, filenames):
        trace_id = doc.get("traceID") or f"FILE::{fname}"
        nodes["Trace"].add(trace_id)
        spans = sorted(doc.get("spans", []), key=lambda s: s.get("startTime", 0))
        for span in spans:
            tags = {}
            for t in span.get("tags", []):
                tags[t.get("key")] = t.get("value")

            if isinstance(tags.get("EventID"), str):
                try:
                    tags["EventID"] = int(tags["EventID"])
                except Exception:
                    pass
            ev = _truthy(tags, "EventID", "ID")
            ev_s = str(ev)

            guid = _truthy(tags, "ProcessGuid", "process_guid", "ProcessGUID")
            pid = _truthy(tags, "ProcessId", "process_id", "pid", "Pid", "processId")
            img = _truthy(tags, "Image", "process_path", "ImagePath", "image", "PathToImage")
            if ev_s in {"8", "10", "25"}:
                guid = guid or _truthy(
                    tags, "SourceProcessGuid", "SourceProcessGUID", "source_process_guid"
                )
                pid = pid or _truthy(tags, "SourceProcessId", "source_process_id")
                img = img or _truthy(tags, "SourceImage")
            pguid = _truthy(
                tags, "ParentProcessGuid", "parent_process_guid", "ParentProcessGUID"
            )
            ppid = _truthy(
                tags, "ParentProcessId", "parent_pid", "ParentPid", "ppid",
                "parentPid", "sysmon.ppid",
            )
            pkey = guid if guid else (f"{trace_id}:{pid}" if pid else None)

            if pkey:
                nodes["Process"].add(pkey)
                edges["HAS_PROCESS"].add((trace_id, pkey))
                parent = pguid if pguid else (f"{trace_id}:{ppid}" if ppid else None)
                if parent:
                    nodes["Process"].add(parent)
                    edges["HAS_PROCESS"].add((trace_id, parent))
                    edges["SPAWNS"].add((parent, pkey))

            target = _truthy(tags, "TargetFilename", "Path")

            if ev_s == "2" and pkey and target:
                nodes["File"].add(target)
                edges["MODIFIED_FILE_TIME"].add((pkey, target))
            if ev_s == "3" and pkey:
                dip = _truthy(tags, "DestinationIp", "dst_ip")
                dhost = _truthy(tags, "DestinationHostname")
                if dip:
                    nodes["Ip"].add(dip)
                    edges["CONNECTED_TO"].add((pkey, dip))
                if dhost:
                    nodes["Ip"].add(str(dhost).lower())
                    edges["CONNECTED_TO"].add((pkey, str(dhost).lower()))
            if ev_s in {"6", "7"} and pkey:
                img2 = _truthy(tags, "ImageLoaded", "Image")
                if img2:
                    nodes["File"].add(img2)
                    rel = "LOADED_DRIVER" if ev_s == "6" else "LOADED_MODULE"
                    edges[rel].add((pkey, img2))
            if ev_s in {"8", "10", "25"}:
                dst_guid = _truthy(
                    tags, "TargetProcessGuid", "TargetProcessGUID", "target_process_guid"
                )
                dst_pid = _truthy(tags, "TargetProcessId", "TargetPid")
                if pkey and (dst_guid or dst_pid):
                    dst = dst_guid if dst_guid else f"{trace_id}:{dst_pid}"
                    nodes["Process"].add(dst)
                    edges["HAS_PROCESS"].add((trace_id, dst))
                    rel = {"8": "INJECTED_THREAD", "10": "ACCESSED_PROCESS",
                           "25": "TAMPERED"}[ev_s]
                    edges[rel].add((pkey, dst))
            if ev_s == "9" and pkey and _truthy(tags, "Device"):
                dv = tags["Device"]
                nodes["Device"].add(dv)
                edges["RAW_READ"].add((pkey, dv))
            if ev_s == "11" and pkey and target:
                nodes["File"].add(target)
                edges["CREATED_FILE"].add((pkey, target))
            if ev_s == "12" and pkey:
                etype = _truthy(tags, "EventType")
                kpath = _truthy(tags, "TargetObject")
                if kpath:
                    nodes["RegistryKey"].add(kpath)
                    low = str(etype).lower() if etype else ""
                    if low.startswith("create"):
                        edges["CREATED_REG_KEY"].add((pkey, kpath))
                    elif low.startswith("delete"):
                        edges["DELETED_REG_KEY"].add((pkey, kpath))
            if ev_s == "13" and pkey and _truthy(tags, "TargetObject"):
                tgt = tags["TargetObject"]
                kp, _vn = _reg_split(tgt)
                if kp:
                    nodes["RegistryKey"].add(kp)
                    edges["UNDER_KEY"].add((tgt, kp))
                nodes["RegistryValue"].add(tgt)
                edges["SET_REG_VALUE"].add((pkey, tgt))
            if ev_s == "14" and pkey:
                old = _truthy(tags, "TargetObject")
                new = _truthy(tags, "NewName", "NewDetails")
                if old and new:
                    nodes["RegistryKey"].add(old)
                    nodes["RegistryKey"].add(new)
                    edges["RENAMED_REG_KEY"].add((pkey, new))
                    edges["RENAMED_TO"].add((old, new))
            if ev_s == "15" and pkey and target:
                nodes["File"].add(target)
                edges["CREATED_STREAM"].add((pkey, target))
            if ev_s in {"17", "18"} and pkey:
                pname = _truthy(tags, "PipeName", "Pipe")
                if pname:
                    nodes["Pipe"].add(pname)
                    rel = "CREATED_PIPE" if ev_s == "17" else "CONNECTED_PIPE"
                    edges[rel].add((pkey, pname))
            if ev_s == "19" and pkey:
                fname_ = _truthy(tags, "FilterName", "Name", "EventFilterName")
                if fname_:
                    nodes["WmiFilter"].add(fname_)
                    wmi_filters_seen.add(fname_)
            if ev_s == "20" and pkey:
                cname = _truthy(tags, "ConsumerName", "Name", "Consumer")
                if cname:
                    nodes["WmiConsumer"].add(cname)
                    wmi_consumers_seen.add(cname)
            if ev_s == "21" and pkey:
                fn = _truthy(tags, "FilterName", "Filter")
                cn = _truthy(tags, "ConsumerName", "Consumer")
                if fn and cn and fn in wmi_filters_seen and cn in wmi_consumers_seen:
                    edges["BIND_TO"].add((fn, cn))
            if ev_s in {"23", "26"} and pkey and target:
                nodes["File"].add(target)
                edges["DELETED_FILE"].add((pkey, target))
            if ev_s in {"27", "29"} and pkey and target:
                nodes["File"].add(target)
                edges["CREATED_EXECUTABLE"].add((pkey, target))

    return dict(nodes), dict(edges)
