"""robots.txt operators: RFC 9309 group structure, precedence,
wildcards/anchors, agent selection — plus an independent-oracle check
against urllib.robotparser on the wildcard-free class."""

from __future__ import annotations

from urllib.robotparser import RobotFileParser

from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators.robots import (
    parse_robots,
    robots_allowed,
    sitemap_urls,
)

ROBOTS_A = """\
# global policy
User-agent: *
Disallow: /private/
Allow: /private/press/
Sitemap: http://a.example/sitemap.xml

User-agent: trainbot
User-agent: otherbot
Disallow: /no-train/
"""

ROBOTS_B = """\
User-agent: *
Disallow: /
"""

ROBOTS_C = """\
User-agent: *
Disallow:
"""


def _rules(spark, pairs):
    df = spark.createDataFrame(pairs, "host string, robots_txt string")
    return parse_robots(df)


def test_group_structure_and_shared_agent_lines(spark):
    rules = _rules(spark, [("a.example", ROBOTS_A)]).collect()
    by_pattern = {r.pattern: r for r in rules}
    assert set(by_pattern) == {"/private/", "/private/press/", "/no-train/"}
    assert sorted(by_pattern["/no-train/"].agents) == ["otherbot", "trainbot"]
    assert by_pattern["/private/"].agents == ["*"]
    assert by_pattern["/private/press/"].directive == "allow"


def test_interleaved_noise_does_not_split_user_agent_runs(spark):
    """RFC 9309 §2.2 ABNF: blank / comment / unknown lines between
    consecutive User-agent lines keep them in ONE group — agent ``a``
    must share ``b``'s Disallow (the permissive-divergence regression:
    a lag over all lines saw the comment and split the run, letting
    ``a`` into /x/).  A RULE line between them still splits."""
    noisy = (
        "User-agent: a\n"
        "# note\n"
        "\n"
        "Crawl-delay: 10\n"
        "User-agent: b\n"
        "Disallow: /x/\n"
        "\n"
        "User-agent: c\n"
        "Disallow: /y/\n"
        "User-agent: d\n"
        "Disallow: /z/\n"
    )
    rules = _rules(spark, [("n.example", noisy)]).collect()
    by_pattern = {r.pattern: sorted(r.agents) for r in rules}
    assert by_pattern["/x/"] == ["a", "b"]
    # the Disallow between c's and d's UA lines ends c's group: d is new
    assert by_pattern["/y/"] == ["c"]
    assert by_pattern["/z/"] == ["d"]

    urls = spark.createDataFrame(
        [("n.example", "/x/secret")], "host string, path string"
    )
    verdict = robots_allowed(urls, _rules(spark, [("n.example", noisy)]), "a")
    assert verdict.collect()[0].allowed is False
    # NOTE: urllib.robotparser DIVERGES from the RFC here — its parser
    # resets the pending entry on a blank line between User-agent
    # lines, so it would let agent ``a`` fetch /x/secret.  This case is
    # therefore hand-derived (RFC 9309 §2.2 ABNF keeps the run in one
    # group), same posture as the wildcard/anchor divergence tests.
    rp = RobotFileParser()
    rp.parse(noisy.splitlines())
    assert rp.can_fetch("a", "http://n.example/x/secret") is True  # divergence


def test_sitemaps_extracted(spark):
    df = spark.createDataFrame(
        [("a.example", ROBOTS_A)], "host string, robots_txt string"
    )
    assert [r.sitemap for r in sitemap_urls(df).collect()] == [
        "http://a.example/sitemap.xml"
    ]


def _verdicts(spark, robots_pairs, url_rows, agent):
    rules = _rules(spark, robots_pairs)
    urls = spark.createDataFrame(url_rows, "host string, path string")
    out = robots_allowed(urls, rules, agent=agent)
    return {(r.host, r.path): r.allowed for r in out.collect()}


def test_precedence_longest_match_allow_tiebreak(spark):
    got = _verdicts(
        spark,
        [("a.example", ROBOTS_A)],
        [
            ("a.example", "/private/secret.html"),  # disallow /private/
            ("a.example", "/private/press/x.html"),  # allow (longer)
            ("a.example", "/public/x.html"),  # no rule → allowed
            ("b.example", "/anything"),  # no robots → allowed
        ],
        agent="randombot",
    )
    assert got == {
        ("a.example", "/private/secret.html"): False,
        ("a.example", "/private/press/x.html"): True,
        ("a.example", "/public/x.html"): True,
        ("b.example", "/anything"): True,
    }


def test_exact_agent_groups_shadow_star(spark):
    # trainbot gets ONLY its group: /no-train/ blocked, /private/ NOT
    got = _verdicts(
        spark,
        [("a.example", ROBOTS_A)],
        [
            ("a.example", "/no-train/data.html"),
            ("a.example", "/private/secret.html"),
        ],
        agent="TrainBot",  # case-insensitive
    )
    assert got == {
        ("a.example", "/no-train/data.html"): False,
        ("a.example", "/private/secret.html"): True,
    }


def test_wildcards_and_anchor(spark):
    robots = (
        "User-agent: *\n"
        "Disallow: /*.pdf$\n"
        "Disallow: /tmp*/scratch/\n"
    )
    got = _verdicts(
        spark,
        [("w.example", robots)],
        [
            ("w.example", "/docs/report.pdf"),  # *.pdf$ → blocked
            ("w.example", "/docs/report.pdf.html"),  # anchor → allowed
            ("w.example", "/tmp123/scratch/x"),  # mid-wildcard → blocked
            ("w.example", "/tmp123/keep/x"),  # allowed
        ],
        agent="anybot",
    )
    assert got == {
        ("w.example", "/docs/report.pdf"): False,
        ("w.example", "/docs/report.pdf.html"): True,
        ("w.example", "/tmp123/scratch/x"): False,
        ("w.example", "/tmp123/keep/x"): True,
    }


def test_regex_metachars_in_patterns_are_literal(spark):
    robots = "User-agent: *\nDisallow: /a+b(c)/\n"
    got = _verdicts(
        spark,
        [("m.example", robots)],
        [
            ("m.example", "/a+b(c)/x"),  # literal match → blocked
            ("m.example", "/aab(c)/x"),  # '+' must NOT mean repeat
        ],
        agent="anybot",
    )
    assert got == {
        ("m.example", "/a+b(c)/x"): False,
        ("m.example", "/aab(c)/x"): True,
    }


def test_empty_disallow_and_deny_all(spark):
    got = _verdicts(
        spark,
        [("open.example", ROBOTS_C), ("closed.example", ROBOTS_B)],
        [
            ("open.example", "/anything"),
            ("closed.example", "/anything"),
        ],
        agent="anybot",
    )
    assert got == {
        ("open.example", "/anything"): True,
        ("closed.example", "/anything"): False,
    }


def test_duplicate_url_rows_each_keep_their_verdict(spark):
    rules = _rules(spark, [("a.example", ROBOTS_B)])
    urls = spark.createDataFrame(
        [("a.example", "/x")] * 3, "host string, path string"
    )
    out = robots_allowed(urls, rules, agent="any")
    assert [r.allowed for r in out.collect()] == [False, False, False]


def test_independent_oracle_robotparser_wildcard_free(spark):
    """Wildcard-free robots through BOTH implementations: this module
    (longest-match) and urllib.robotparser (first-match) — on a corpus
    where each path has at most one matching rule, the two semantics
    must coincide, so any disagreement is a parsing/matching bug."""
    robots = {
        "h1.example": ROBOTS_A,
        "h2.example": ROBOTS_B,
        "h3.example": ROBOTS_C,
        "h4.example": "User-agent: foo\nDisallow: /only-foo/\n",
    }
    paths = [
        "/", "/private/a", "/private/press/a", "/no-train/a",
        "/x/y.html", "/only-foo/z",
    ]
    agent = "trainbot"
    urls = [(h, p) for h in robots for p in paths]
    got = _verdicts(
        spark, list(robots.items()), urls, agent=agent
    )
    for host, text in robots.items():
        rp = RobotFileParser()
        rp.parse(text.splitlines())
        for p in paths:
            want = rp.can_fetch(agent, f"http://{host}{p}")
            assert got[(host, p)] == want, (host, p, want)


SITEMAP_XML = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>http://a.example/page?x=1&amp;y=2</loc>
    <lastmod>2024-01-05</lastmod>
  </url>
  <url><loc> http://a.example/bare </loc></url>
</urlset>
"""

SITEMAP_INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://b.example/sitemap-1.xml.gz</loc>
  <lastmod>2024-02-01</lastmod></sitemap>
  <sitemap><loc>http://b.example/sitemap-2.xml.gz</loc></sitemap>
</sitemapindex>
"""


def test_parse_sitemap_urlset_and_index(spark):
    from graphdb_neo4j_spark.operators.robots import parse_sitemap

    df = spark.createDataFrame(
        [("a.example", SITEMAP_XML), ("b.example", SITEMAP_INDEX)],
        "host string, sitemap_xml string",
    )
    got = sorted(
        (r.host, r.kind, r.loc, r.lastmod) for r in parse_sitemap(df).collect()
    )
    assert got == [
        ("a.example", "url", "http://a.example/bare", None),
        ("a.example", "url", "http://a.example/page?x=1&y=2", "2024-01-05"),
        ("b.example", "sitemap", "http://b.example/sitemap-1.xml.gz", "2024-02-01"),
        ("b.example", "sitemap", "http://b.example/sitemap-2.xml.gz", None),
    ]


def test_crawl_delays_group_scoping_and_last_wins(spark):
    from graphdb_neo4j_spark.operators.robots import crawl_delays

    txt = (
        "Crawl-delay: 7\n"  # before any group: dropped
        "User-agent: *\n"
        "Crawl-delay: 9\n"
        "Disallow: /x/\n"
        "\n"
        "User-agent: trainbot\n"
        "User-agent: otherbot\n"
        "Disallow: /y/\n"
        "Crawl-delay: fast\n"  # non-numeric: dropped
        "Crawl-delay: 2\n"
        "Crawl-delay: 3\n"  # last wins
    )
    rows = crawl_delays(
        spark.createDataFrame(
            [("d.example", txt)], "host string, robots_txt string"
        )
    ).collect()
    by_agents = {tuple(sorted(r.agents)): r.delay_s for r in rows}
    assert by_agents[("*",)] == 9.0
    assert by_agents[("otherbot", "trainbot")] == 3.0
    # urllib.robotparser agrees on this layout (delays follow rules)
    rp = RobotFileParser()
    rp.parse(txt.splitlines())
    assert rp.crawl_delay("somebody") == 9
    assert rp.crawl_delay("trainbot") == 3


def test_crawl_delay_between_user_agent_lines_stays_one_group(spark):
    """Hand-derived divergence case: our RFC-style grouping keeps the
    UA run together (a Crawl-delay is an ignored unknown line for
    grouping), so both agents share the delay; robotparser's state
    machine instead commits the entry on the delay line and gives
    agent b a fresh delayless entry."""
    from graphdb_neo4j_spark.operators.robots import crawl_delays

    txt = (
        "User-agent: a\n"
        "Crawl-delay: 5\n"
        "User-agent: b\n"
        "Disallow: /x/\n"
    )
    rows = crawl_delays(
        spark.createDataFrame(
            [("d.example", txt)], "host string, robots_txt string"
        )
    ).collect()
    assert len(rows) == 1
    assert sorted(rows[0].agents) == ["a", "b"] and rows[0].delay_s == 5.0


def test_politeness_schedule_shadowing_and_slots(spark):
    from graphdb_neo4j_spark.operators.robots import (
        crawl_delays,
        politeness_schedule,
    )

    robots = spark.createDataFrame(
        [
            (
                "s.example",
                "User-agent: *\nDisallow: /x/\nCrawl-delay: 9\n\n"
                "User-agent: trainbot\nDisallow: /y/\nCrawl-delay: 2\n",
            ),
            ("t.example", "User-agent: *\nDisallow: /p/\n"),  # no delay
        ],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [("s.example", f"/u{i}") for i in range(3)]
        + [("t.example", f"/v{i}") for i in range(2)],
        "host string, url string",
    )
    sched, handle = politeness_schedule(
        urls, crawl_delays(robots), agent="trainbot", order_cols=("url",),
        default_delay_s=1.0,
    )
    out = sched.collect()
    handle.release()
    got = {(r.host, r.url): (r.delay_s, r.slot_no, r.fetch_offset_s) for r in out}
    # exact group shadows star: delay 2, slots 0/1/2 → offsets 0/2/4
    assert got[("s.example", "/u0")] == (2.0, 0, 0.0)
    assert got[("s.example", "/u1")] == (2.0, 1, 2.0)
    assert got[("s.example", "/u2")] == (2.0, 2, 4.0)
    # no delay declared → default
    assert got[("t.example", "/v1")] == (1.0, 1, 1.0)
    # robotparser agrees on the shadowing
    rp = RobotFileParser()
    rp.parse(
        "User-agent: *\nDisallow: /x/\nCrawl-delay: 9\n\n"
        "User-agent: trainbot\nDisallow: /y/\nCrawl-delay: 2\n".splitlines()
    )
    assert rp.crawl_delay("trainbot") == 2 and rp.crawl_delay("other") == 9


def test_independent_oracle_generative_fuzz(spark):
    """40 grammar-generated robots files × 3 agents × every rule path
    through BOTH implementations.  The generator stays inside the
    provably-coincident class (wildcard-free, one rule per path
    prefix, each agent in at most one group per host, no noise inside
    UA runs) so ANY disagreement with urllib.robotparser is a
    parsing/selection bug, not a semantics difference.  Deterministic
    seed."""
    import random as _random

    rng = _random.Random(0xD1CE)
    agents_pool = ["alpha", "beta", "gamma"]
    fixtures = {}  # host -> text
    for h in range(40):
        host = f"f{h}.example"
        # each agent (and '*') may lead at most one group
        leads = rng.sample(
            agents_pool + ["*"], rng.randint(1, 3)
        )
        # group agent-sets must not overlap: assign each lead its own
        # group; optionally pair two non-star leads in ONE group
        groups = []
        if (
            len([x for x in leads if x != "*"]) >= 2
            and rng.random() < 0.3
        ):
            a, b = [x for x in leads if x != "*"][:2]
            rest = [x for x in leads if x not in (a, b)]
            groups.append([a, b])
            groups.extend([[x] for x in rest])
        else:
            groups = [[x] for x in leads]
        text = "# generated\n"
        prefix_no = 0
        for g in groups:
            for ag in g:
                text += f"User-agent: {ag}\n"
            for _ in range(rng.randint(1, 3)):
                directive = rng.choice(["Disallow", "Allow"])
                text += f"{directive}: /r{h}x{prefix_no}/\n"
                prefix_no += 1
            text += "\n"
        fixtures[host] = text

    rules = parse_robots(
        spark.createDataFrame(
            sorted(fixtures.items()), "host string, robots_txt string"
        )
    )
    # probe every declared prefix + one unmatched path, per agent
    probes = []
    for host, text in fixtures.items():
        paths = [
            ln.split(": ", 1)[1] + "leaf.html"
            for ln in text.splitlines()
            if ln.startswith(("Allow: ", "Disallow: "))
        ] + ["/unmatched/none"]
        probes.extend((host, p) for p in paths)
    for agent in ["alpha", "gamma", "nobody"]:
        urls = spark.createDataFrame(probes, "host string, path string")
        got = {
            (r.host, r.path): r.allowed
            for r in robots_allowed(urls, rules, agent=agent).collect()
        }
        for host, text in fixtures.items():
            rp = RobotFileParser()
            rp.parse(text.splitlines())
            for h2, p in probes:
                if h2 != host:
                    continue
                want = rp.can_fetch(agent, f"http://{host}{p}")
                assert got[(host, p)] == want, (agent, host, p, text)


def test_selected_delays_rules_widening_matches_robotparser(spark):
    """ADVICE r8 divergence class, closed when rules= is passed: a host
    whose exact-agent group has RULES but no Crawl-delay, next to a
    '*' group WITH one.  robotparser's entry shadowing returns None
    (caller default); selected_delays agrees only when the tier is
    derived from all entry-forming groups via rules=parse_robots(...).
    WITHOUT rules the star delay wins — the documented legacy
    behavior for callers holding only the delays frame."""
    from graphdb_neo4j_spark.operators.robots import (
        crawl_delays,
        entry_groups,
        selected_delays,
    )

    txt = (
        "User-agent: *\nDisallow: /a/\nCrawl-delay: 7\n\n"
        "User-agent: trainbot\nDisallow: /b/\n"
    )
    # the EMPTY Disallow (allow-everything idiom) ALSO forms a
    # robotparser entry — parse_robots rule rows rightly skip it, so
    # the tier source must be entry_groups (self-review r9)
    txt_empty = (
        "User-agent: *\nDisallow: /c/\nCrawl-delay: 8\n\n"
        "User-agent: trainbot\nDisallow:\n"
    )
    robots = spark.createDataFrame(
        [("w.example", txt), ("e.example", txt_empty)],
        "host string, robots_txt string",
    )
    delays = crawl_delays(robots)
    # legacy: tier from delay-carrying groups only -> star delay leaks
    legacy = {
        r.host: r.delay_s
        for r in selected_delays(delays, agent="trainbot").collect()
    }
    assert legacy == {"w.example": 7.0, "e.example": 8.0}
    # widened: exact entry-forming groups shadow -> no delay row at all
    widened = selected_delays(
        delays, agent="trainbot", rules=entry_groups(robots)
    ).collect()
    assert widened == []
    # robotparser agrees with the widened form on BOTH hosts
    for t in (txt, txt_empty):
        rp = RobotFileParser()
        rp.parse(t.splitlines())
        assert rp.crawl_delay("trainbot") is None
        assert rp.crawl_delay("other") in (7, 8)
