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
