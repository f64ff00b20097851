"""Scalar ETL expressions — Spark built-ins only, zero Python UDFs.

Each function mirrors one scalar helper of the reference ingester
(``/root/reference/events.py``), re-expressed as a Catalyst column
expression so the whole ETL stays inside whole-stage codegen.

The reference reads raw JSON values (str | int64 | bool) and filters
them through a *truthiness*-based ``coalesce`` (events.py:24-28): falsy
values (``0``, ``""``, ``False``, ``None``) are skipped.  Spark's
``F.coalesce`` is null-based, so we normalize falsy-per-JSON-type values
to NULL **once**, when the tag list is flattened into a map
(:func:`tags_map`).  Every tag read in the reference goes through its
truthy coalesce, so the normalization is semantics-preserving.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tag-list flattening
# ---------------------------------------------------------------------------


def tags_map(tags_col: Column) -> Column:
    """``[{key,type,value}]`` → ``map<string,string>`` with falsy→NULL.

    Mirrors ``taglist_to_dict`` (events.py:17-22) composed with the
    truthiness rule of ``coalesce`` (events.py:24-28):

    * JSON ``int64`` value ``0``      → NULL   (Python ``0`` is falsy)
    * JSON ``bool``  value ``false``  → NULL   (Python ``False`` is falsy)
    * JSON ``string`` value ``""``    → NULL   (Python ``""`` is falsy)
    * the string ``"0"`` (type=string) stays — it is truthy in Python.

    Duplicate keys: the reference keeps the *last* duplicate (dict
    assignment, events.py:17-22).  The session sets
    ``spark.sql.mapKeyDedupPolicy=LAST_WIN`` (session.py) so
    ``map_from_entries`` has exactly those semantics — no quadratic
    dedup expression needed (the corpus has zero duplicate-key spans;
    this matters for synthetic/adversarial inputs only).
    """
    normalized = F.transform(
        tags_col,
        lambda t: F.struct(
            t["key"].alias("key"),
            F.when(
                ((t["type"] == "int64") & (t["value"] == "0"))
                | ((t["type"] == "bool") & (t["value"] == "false"))
                | (t["value"] == ""),
                F.lit(None).cast("string"),
            )
            .otherwise(t["value"])
            .alias("value"),
        ),
    )
    return F.map_from_entries(normalized)


def tag(tags: Column, *keys: str) -> Column:
    """First non-null (post-truthiness-normalization) value among keys.

    Mirrors ``coalesce(d, *keys)`` (events.py:24-28) given the map was
    built with :func:`tags_map`.
    """
    return F.coalesce(*[tags[k] for k in keys])


def truthy(col: Column) -> Column:
    """Generic Python-truthiness guard for already-string columns."""
    return F.when((col.isNull()) | (col == ""), F.lit(None)).otherwise(col)


# ---------------------------------------------------------------------------
# scalar helpers
# ---------------------------------------------------------------------------


def canon_event_id(tags: Column) -> Column:
    """Canonical EventID string for routing.

    The reference int-coerces a string ``EventID`` tag when parseable
    (events.py:269-273 — dead on the corpus, where only the int64 ``ID``
    tag occurs) and routes on ``str(ev_id)`` (events.py:323 et al.).
    """
    ev = tags["EventID"]
    as_long = ev.try_cast("long")
    # a string EventID that coerces to int 0 becomes FALSY in Python and
    # falls through to the ID tag (truthiness coalesce on the coerced
    # value); unparseable strings stay as-is (truthy)
    ev_canon = F.when(
        as_long.isNotNull(),
        F.when(as_long == 0, F.lit(None)).otherwise(as_long.cast("string")),
    ).otherwise(ev)
    return F.coalesce(ev_canon, tags["ID"])


def posix_basename(col: Column) -> Column:
    """``os.path.basename`` on a POSIX host: split on ``/`` only.

    The reference applies it to Windows image paths (events.py:282,293);
    backslashed paths keep the FULL string.  NULL input → ``""`` (the
    reference does ``str(img_raw or "")`` first).
    """
    return F.element_at(F.split(F.coalesce(col, F.lit("")), "/"), -1)


def _rstrip_backslashes(col: Column) -> Column:
    return F.regexp_replace(col, r"\\+$", "")


def reg_key_path(target: Column) -> Column:
    """Key part of ``parse_reg_target`` (events.py:30-36).

    ``HKLM\\a\\b\\Name`` → ``HKLM\\a\\b``.  A SINGLE-segment target
    returns the ORIGINAL target itself (the reference returns
    ``(target, None)`` — truthy — so event 13 still MERGEs the key node
    and a self UNDER_KEY edge; caught by the hypothesis oracle).  A
    leading-backslash target like ``\\Name`` yields an EMPTY key part,
    which is falsy in the reference and skips the key node → NULL here.
    Trailing backslashes are stripped before splitting only.
    """
    s = _rstrip_backslashes(target)
    name = F.substring_index(s, "\\", -1)
    # key = s minus ("\\" + name); only when s still contains a backslash
    key = F.substring(s, F.lit(1), F.length(s) - F.length(name) - F.lit(1))
    return F.when(
        s.contains("\\"), F.when(key == "", F.lit(None).cast("string")).otherwise(key)
    ).otherwise(target)


def reg_value_name(target: Column) -> Column:
    """Value-name part of ``parse_reg_target``: last ``\\`` segment, or
    NULL for a single-segment target."""
    s = _rstrip_backslashes(target)
    return F.when(s.contains("\\"), F.substring_index(s, "\\", -1)).otherwise(
        F.lit(None).cast("string")
    )


def last_segment(col: Column) -> Column:
    """Mirror of ``last_segment`` (events.py:51-57, dead in reference):
    last path segment splitting on ``\\`` if present else ``/``, after
    rstripping both separators; empty result falls back to the rstripped
    string."""
    s = F.regexp_replace(col, r"[/\\]+$", "")
    by_bslash = F.element_at(F.split(s, r"\\"), -1)
    by_slash = F.element_at(F.split(s, "/"), -1)
    seg = F.when(s.contains("\\"), by_bslash).otherwise(by_slash)
    return F.when(col.isNull() | (col == ""), F.lit(None)).otherwise(
        F.when(seg == "", s).otherwise(seg)
    )


def json_or_list(col: Column) -> Column:
    """Mirror of ``json_or_list`` (events.py:38-49, dead in reference):
    JSON-array string → array<string>; otherwise split on ``[\\s,;|]+``
    dropping empties and ``-``."""
    trimmed = F.trim(col)
    as_json = F.from_json(trimmed, "array<string>")
    fallback = F.filter(
        F.split(trimmed, r"[\s,;|]+"),
        lambda t: (t != "") & (t != "-"),
    )
    arr = F.coalesce(as_json, fallback)
    return F.when(col.isNull(), F.array().cast("array<string>")).otherwise(
        F.filter(arr, lambda t: t.isNotNull() & (t != ""))
    )


def to_utc(col: Column) -> Column:
    """Lenient datetime-string → UTC timestamp (mirror of the dead
    ``to_utc`` helper, events.py:9-15).  Uses ``try_to_timestamp`` over a
    battery of formats; unparseable → NULL."""
    c = F.trim(col)
    return F.coalesce(
        F.try_to_timestamp(c),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd HH:mm:ss.SSS")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
        F.try_to_timestamp(c, F.lit("MM/dd/yyyy HH:mm:ss")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd")),
    )
