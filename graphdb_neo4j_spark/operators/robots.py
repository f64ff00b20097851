"""robots.txt parsing + allow/deny matching (RFC 9309) — crawl
politeness, pure Catalyst.

The last gate before a frontier URL becomes a fetch: the host's
robots.txt.  At crawl scale this is a JOIN problem — millions of
(host, robots.txt) documents against billions of frontier URLs — not
a per-URL library call, so both halves here are DataFrame operators:

* :func:`parse_robots` — robots.txt text → one rule row per
  Allow/Disallow line, with RFC 9309 group structure (CONSECUTIVE
  ``User-agent`` lines form a group sharing the rules that follow),
  comments stripped, each rule's path pattern compiled to a regex
  (``*`` wildcards, trailing ``$`` anchor) in the RE2 ∩ Java common
  dialect via per-row string ops — the pattern is DATA, so the regex
  is built by a replace chain, not Python.
* :func:`robots_allowed` — frontier URLs × rules: group selection is
  exact-agent-if-any-else-``*`` (the RFC's specificity ladder
  simplified to its two practical tiers; documented), rule precedence
  is LONGEST-match-wins with Allow beating Disallow on ties (RFC 9309
  §2.2.2), no matching rule or no robots.txt → allowed.
* :func:`sitemap_urls` — the ``Sitemap:`` lines (group-independent).

Correctness posture: the wildcard-free class is oracle-checked against
``urllib.robotparser`` — an INDEPENDENT stdlib implementation — in
q221's constant oracle; wildcard/anchor/precedence semantics (where
robotparser's first-match model legitimately differs from the RFC's
longest-match) are pinned by hand-derived unit tests.

100 TB notes: parse once per robots snapshot (host-keyed, tiny), then
``robots_allowed`` is one broadcast-able join from URLs to their
host's selected rule group plus a per-URL window max — no Python
boundary; the regex match uses a COLUMN pattern (non-foldable RLIKE),
which stays JVM-side even though it compiles per row group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# regex metacharacters escaped in path patterns; '\\' FIRST, '*' handled
# separately (it becomes '.*'), trailing '$' handled before escaping.
_META = ["\\", ".", "^", "$", "+", "?", "(", ")", "[", "]", "{", "}", "|"]


def _pattern_regex(pattern: Column) -> Column:
    """robots path pattern (data) → anchored regex string (data)."""
    ends_anchor = pattern.endswith("$")
    base = F.when(
        ends_anchor, F.substring(pattern, 1, F.length(pattern) - 1)
    ).otherwise(pattern)
    esc = base
    for ch in _META:
        esc = F.replace(esc, F.lit(ch), F.lit("\\" + ch))
    esc = F.replace(esc, F.lit("*"), F.lit(".*"))
    return F.concat(
        F.lit("^"), esc, F.when(ends_anchor, F.lit("$")).otherwise(F.lit(""))
    )


def _robots_groups(
    df: DataFrame, host_col: str, text_col: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared group machinery: (parsed, grouped, agents).

    ``parsed`` = every line keyed/valued; ``grouped`` = recognized
    lines (user-agent / allow / disallow) with ``group_id``;
    ``agents`` = (host, group_id, agents array).  Group detection runs
    over RECOGNIZED lines only: RFC 9309 §2.2's ABNF keeps a run of
    ``startgroupline``s in ONE group across blank lines, and
    unparseable/unknown lines MUST be ignored — so a comment, blank,
    or Crawl-delay line between consecutive User-agent lines must not
    split the group (a rule line between them still does)."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line"),
    ).select(
        "host",
        "line_no",
        F.trim(F.regexp_replace("line", "#.*$", "")).alias("line"),
    )
    parsed = lines.select(
        "host",
        "line_no",
        F.lower(F.regexp_extract("line", "^([a-zA-Z-]+)[ \t]*:", 1)).alias("key"),
        F.trim(
            F.regexp_extract("line", "^[a-zA-Z-]+[ \t]*:[ \t]*(.*)$", 1)
        ).alias("value"),
    )
    w = Window.partitionBy("host").orderBy("line_no")
    is_ua = F.col("key") == "user-agent"
    recognized = parsed.filter(is_ua | F.col("key").isin("allow", "disallow"))
    grouped = recognized.withColumn(
        "group_start",
        (is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False))).cast("int"),
    ).withColumn("group_id", F.sum("group_start").over(w))
    agents = (
        grouped.filter(is_ua)
        .groupBy("host", "group_id")
        .agg(F.collect_set(F.lower("value")).alias("agents"))
    )
    return parsed, grouped, agents


def parse_robots(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, group_id, agents array<string>, directive, pattern,
    pattern_len, pattern_regex) — one row per Allow/Disallow rule.

    Group structure per RFC 9309 §2.2.1: consecutive ``User-agent``
    lines open a group; the Allow/Disallow lines that follow belong to
    ALL of them.  Empty-valued rules are ignored (an empty Disallow is
    the classic allow-everything idiom).  Unknown directives are
    skipped; ``Sitemap:`` lines live in :func:`sitemap_urls`,
    ``Crawl-delay:`` in :func:`crawl_delays`."""
    _, grouped, agents = _robots_groups(df, host_col, text_col)
    rules = grouped.filter(
        F.col("key").isin("allow", "disallow") & (F.col("value") != "")
    ).select(
        "host",
        "group_id",
        F.col("key").alias("directive"),
        F.col("value").alias("pattern"),
        F.length("value").alias("pattern_len"),
        _pattern_regex(F.col("value")).alias("pattern_regex"),
    )
    return rules.join(agents, ["host", "group_id"])


def entry_groups(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, agents array<string>) — one row per ENTRY-FORMING group:
    a group with at least one Allow/Disallow line, INCLUDING
    empty-valued ones (the allow-everything ``Disallow:`` idiom forms
    an entry in urllib.robotparser — its parser appends
    ``RuleLine('', False)`` and reaches the entry-closing state — even
    though :func:`parse_robots` rightly emits no RULE row for it).
    This is the exact tier source for :func:`selected_delays`'s
    ``rules=`` widening: robotparser's agent shadowing considers these
    groups, so deriving the tier from rule ROWS alone (parse_robots
    output) would still miss the empty-rule class (self-review r9).
    Groups whose only content is a Crawl-delay line are not here — the
    delays frame itself contributes them to the tier union."""
    _, grouped, agents = _robots_groups(df, host_col, text_col)
    marks = (
        grouped.filter(F.col("key").isin("allow", "disallow"))
        .select("host", "group_id")
        .distinct()
    )
    return marks.join(agents, ["host", "group_id"]).select("host", "agents")


def crawl_delays(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, group_id, agents array<string>, delay_s double) — the de
    facto ``Crawl-delay:`` extension (not in RFC 9309 but honored by
    most sites and by urllib.robotparser), group-scoped.

    Since unknown lines are IGNORED for group detection (the RFC
    MUST), a Crawl-delay line cannot split a User-agent run; it is
    assigned to the group whose recognized lines PRECEDE it (last
    group_id at a smaller line_no — robotparser's per-entry delay
    semantics).  Multiple delays in one group keep the LAST
    (last-writer-wins, matching robotparser's assignment).
    Non-numeric values are dropped."""
    parsed, grouped, agents = _robots_groups(df, host_col, text_col)
    marks = grouped.select("host", "line_no", "group_id")
    delays = parsed.filter(
        (F.col("key") == "crawl-delay")
        & F.col("value").rlike("^[0-9]+([.][0-9]+)?$")
    ).select(
        "host",
        "line_no",
        F.col("value").cast("double").alias("delay_s"),
    )
    u = marks.withColumn("delay_s", F.lit(None).cast("double")).unionByName(
        delays.withColumn("group_id", F.lit(None).cast("bigint")).select(
            "host", "line_no", "group_id", "delay_s"
        )
    )
    w = (
        Window.partitionBy("host")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = (
        u.withColumn("group_id", F.last("group_id", ignorenulls=True).over(w))
        .filter(F.col("delay_s").isNotNull() & F.col("group_id").isNotNull())
    )
    last_per_group = (
        assigned.groupBy("host", "group_id")
        .agg(F.max_by("delay_s", "line_no").alias("delay_s"))
    )
    return last_per_group.join(agents, ["host", "group_id"])


def sitemap_urls(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, sitemap) — ``Sitemap:`` lines (group-independent per RFC)."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    )
    sm = F.trim(
        F.regexp_extract(
            F.trim(F.regexp_replace("line", "#.*$", "")),
            "^[sS][iI][tT][eE][mM][aA][pP][ \t]*:[ \t]*(.*)$",
            1,
        )
    )
    return lines.select("host", sm.alias("sitemap")).filter(
        F.col("sitemap") != ""
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """``urls`` + ``allowed`` boolean + ``matched_rule``.

    Group selection: groups naming ``agent`` exactly (case-insensitive)
    if the host has any, else the ``*`` groups.  Precedence among the
    selected groups' rules: longest pattern wins; equal lengths →
    Allow wins (RFC 9309 §2.2.2).  Hosts with no robots rules and URLs
    matching no rule are allowed."""
    agent_lc = agent.lower()
    mine = rules.filter(
        F.array_contains("agents", agent_lc) | F.array_contains("agents", "*")
    ).withColumn(
        "exact", F.array_contains("agents", agent_lc).cast("int")
    )
    # exact-agent groups shadow '*' groups per host
    host_tier = mine.groupBy("host").agg(F.max("exact").alias("tier"))
    selected = mine.join(host_tier, "host").filter(
        F.col("exact") == F.col("tier")
    )
    url_cols = urls.columns
    # surrogate row id: duplicate URL rows must each keep their verdict
    tagged = urls.withColumn("_uid", F.monotonically_increasing_id())
    joined = tagged.join(
        selected.select(
            F.col("host").alias("_rhost"),
            "directive",
            "pattern",
            "pattern_len",
            "pattern_regex",
        ),
        tagged[host_col] == F.col("_rhost"),
        "left",
    ).withColumn(
        "_match",
        F.col("pattern_regex").isNotNull()
        & F.expr(f"{path_col} rlike pattern_regex"),
    )
    w = Window.partitionBy("_uid").orderBy(
        F.col("_match").desc(),
        F.col("pattern_len").desc(),
        F.when(F.col("directive") == "allow", 0).otherwise(1),
    )
    best = (
        joined.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") == 1)
        .select(
            *url_cols,
            F.when(
                F.col("_match"), F.col("directive") == "allow"
            ).otherwise(F.lit(True)).alias("allowed"),
            F.when(F.col("_match"), F.col("pattern")).alias("matched_rule"),
        )
    )
    return best


_SITEMAP_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),  # last, so double-escaped entities decode once
]


def parse_sitemap(
    df: DataFrame, host_col: str = "host", xml_col: str = "sitemap_xml"
) -> DataFrame:
    """(host, kind, loc, lastmod) — entries of a sitemaps.org document.

    ``kind`` is ``url`` for ``<urlset>`` members and ``sitemap`` for
    ``<sitemapindex>`` members (index files point at more sitemaps —
    the caller recurses by fetching those).  ``loc`` has the XML
    entities of the sitemaps.org escaping table decoded (``&amp;``
    last); ``lastmod`` is NULL when absent.  Regex-shaped extraction,
    not an XML parser — namespaces/attributes on the entry tags are
    tolerated, CDATA sections are not (documented; crawlable sitemaps
    in the wild escape, they don't CDATA).  Pure Catalyst — at crawl
    scale this runs as a map-only pass over fetched sitemap bodies."""
    def entries(kind: str, tag: str) -> DataFrame:
        body = F.explode(
            F.regexp_extract_all(
                F.col(xml_col), F.lit(f"(?s)<{tag}[^>]*>(.*?)</{tag}>"), 1
            )
        )
        out = df.select(F.col(host_col).alias("host"), body.alias("entry"))
        loc = F.regexp_extract(
            "entry", "(?s)<loc[^>]*>[ \t\r\n]*(.*?)[ \t\r\n]*</loc>", 1
        )
        for ent, ch in _SITEMAP_ENTITIES:
            loc = F.replace(loc, F.lit(ent), F.lit(ch))
        lastmod = F.regexp_extract(
            "entry", "(?s)<lastmod[^>]*>[ \t\r\n]*(.*?)[ \t\r\n]*</lastmod>", 1
        )
        return out.select(
            "host",
            F.lit(kind).alias("kind"),
            loc.alias("loc"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
        ).filter(F.col("loc") != "")

    return entries("url", "url").unionByName(entries("sitemap", "sitemap"))


def selected_delays(
    delays: DataFrame, agent: str = "*", rules: DataFrame | None = None
) -> DataFrame:
    """(host, delay_s) — one delay per host for ``agent``, from
    :func:`crawl_delays` output: exact-agent groups shadow ``*``
    groups, most-conservative (max) delay on ties.

    ``rules`` (an :func:`entry_groups` frame — or any frame with
    (host, agents) rows; :func:`parse_robots` output also works but
    misses groups whose only rule is the empty allow-everything
    ``Disallow:``) widens the shadowing decision to ALL entry-forming
    groups, not just the delay-carrying ones: a host whose exact-agent
    group has rules but NO Crawl-delay then selects the exact tier and
    yields NO delay row (the caller's default applies) even when a
    ``*`` group declares one — urllib.robotparser agrees
    (``crawl_delay()`` returns None when the matched entry carries no
    delay; a group with neither rules nor a delay never forms an
    entry there, hence the rules-OR-delays union rather than every
    User-agent run).  WITHOUT ``rules`` the tier is derived from
    delay-carrying groups only, and on that divergence class the
    ``*`` delay wins — a documented, pinned divergence
    (tests/test_robots.py), kept because callers holding only the
    delays frame cannot do better.
    """
    agent_lc = agent.lower()
    sel = F.array_contains("agents", agent_lc) | F.array_contains(
        "agents", "*"
    )
    exact = F.array_contains("agents", agent_lc).cast("int")
    mine = delays.filter(sel).withColumn("exact", exact)
    tier_src = mine.select("host", "exact")
    if rules is not None:
        tier_src = tier_src.unionByName(
            rules.filter(sel).select("host", exact.alias("exact"))
        )
    host_tier = tier_src.groupBy("host").agg(F.max("exact").alias("tier"))
    return (
        mine.join(host_tier, "host")
        .filter(F.col("exact") == F.col("tier"))
        .groupBy("host")
        .agg(F.max("delay_s").alias("delay_s"))
    )


def politeness_schedule(
    urls: DataFrame,
    delays: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    order_cols: tuple[str, ...] = ("url",),
    default_delay_s: float = 0.0,
    rules: DataFrame | None = None,
    checkpoint: bool = True,
):
    """``(schedule_df, handle)`` — ``urls`` plus ``(delay_s, slot_no,
    fetch_offset_s)``: per-host fetch scheduling under the host's
    Crawl-delay — the k-th URL of a host (0-based, ordered by
    ``order_cols`` for determinism) is cleared to fetch at
    ``k * delay_s`` seconds after the host's crawl starts.

    ``delays`` is :func:`crawl_delays` output.  Group selection
    mirrors :func:`robots_allowed`: groups naming ``agent`` exactly
    shadow the ``*`` groups; pass ``rules`` (an :func:`entry_groups`
    frame — that one keeps the empty-Disallow allow-everything
    entries, so agent shadowing agrees with urllib.robotparser
    EXACTLY; :func:`parse_robots` also works but is documented-lossy
    on that entry class, see :func:`selected_delays`).  If several
    selected groups declare delays, the most conservative (max) wins;
    hosts with no delay fall back to ``default_delay_s``.

    100 TB notes: delays are host-keyed metadata (broadcast side).
    Slot numbers come from
    :func:`~graphdb_neo4j_spark.operators.order.group_contiguous_index`
    — a ``row_number() OVER (PARTITION BY host)`` window would put a
    dominant host's ENTIRE frontier (10⁷+ URLs on a mega-site) in one
    task, the grouped form of the classic single-task-window
    bottleneck; the group index range-partitions on
    ``(host, order_cols)`` so a big host SPANS tasks, with per-slice
    offsets carried by a window over the tiny counts frame.  That
    makes the schedule a materializing two-pass operator: the
    range-partitioned intermediate is checkpointed, and the returned
    ``handle`` must be ``release()``-d after the final consuming
    action (the :mod:`~graphdb_neo4j_spark.operators.order` contract).
    ``checkpoint=False`` is for PLAN INSPECTION ONLY.

    ``urls`` must not already carry the three output columns — raises
    ``ValueError`` instead of silently producing duplicate names.
    """
    from graphdb_neo4j_spark.operators.order import group_contiguous_index

    clash = {"delay_s", "slot_no", "fetch_offset_s"} & set(urls.columns)
    if clash:
        raise ValueError(
            f"urls already carries schedule output column(s) {sorted(clash)};"
            " rename or drop them first"
        )
    selected = selected_delays(delays, agent, rules)
    indexed, handle = group_contiguous_index(
        urls,
        [host_col],
        list(order_cols),
        out_col="__slot",
        checkpoint=checkpoint,
    )
    joined = indexed.join(
        selected.select(F.col("host").alias("_dhost"), "delay_s"),
        indexed[host_col] == F.col("_dhost"),
        "left",
    )
    d = F.coalesce(F.col("delay_s"), F.lit(float(default_delay_s)))
    slot = F.col("__slot").cast("int")
    out = joined.select(
        *[indexed[c] for c in urls.columns],
        d.alias("delay_s"),
        slot.alias("slot_no"),
        (slot.cast("double") * d).alias("fetch_offset_s"),
    )
    return out, handle
