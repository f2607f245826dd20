"""RFC 9309 robots.txt parser + longest-match gate (frontier/robots.py).

The Spark implementation is checked against an independent pure-Python
reference written directly from the RFC in this file (group binding,
agent selection, longest-match, allow-tie, '*'/'$' semantics), plus
hand-pinned cases for each tricky clause.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from warchaeology_spark.frontier.robots import (
    parse_robots_txt,
    robots_gate_from_txt,
)

AGENT = "warchaeology-spark"


# -- independent reference implementation (from RFC 9309) -------------------

def _ref_rules(content: str, agent: str):
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_uas: list[str] = []
    in_ua_run = False
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, value = line.split(":", 1)
        key, value = key.strip().lower(), value.strip()
        if key == "user-agent":
            if not in_ua_run:
                groups.append(([], []))
                in_ua_run = True
            groups[-1][0].append(value.lower())
        elif key in ("allow", "disallow"):
            in_ua_run = False
            if groups and value:
                groups[-1][1].append((value, key == "allow"))
        else:
            in_ua_run = False
    agent = agent.lower()
    specific = [g for g in groups if any(u != "*" and u in agent for u in g[0])]
    chosen = specific if specific else [g for g in groups if "*" in g[0]]
    return [r for g in chosen for r in g[1]]


def _ref_match(rules, path: str) -> bool:
    """True = allowed."""
    best = (-1, True)
    for pattern, allow in rules:
        body = pattern[:-1] if pattern.endswith("$") else pattern
        rx = "^" + re.escape(body).replace(r"\*", ".*")
        if pattern.endswith("$"):
            rx += "$"
        if re.match(rx, path):
            spec = len(pattern)
            if spec > best[0] or (spec == best[0] and allow and not best[1]):
                best = (spec, allow)
    return best[1]


ROBOTS = {
    # group binding: consecutive UA lines share a group; '*' group;
    # specific group beats '*' entirely
    "a.com": """
# comment line
User-agent: othercrawler
User-agent: warchaeology-spark
Disallow: /private/
Allow: /private/ok/
Crawl-delay: 5

User-agent: *
Disallow: /
""",
    # only '*' group; empty Disallow = allow all ; wildcard + anchor
    "b.com": """
User-agent: *
Disallow:
Disallow: /tmp/*.bak$
Allow: /tmp/keep
Disallow: /cgi*
""",
    # longest-match + allow tie; rules before any UA line are ignored
    "c.com": """
Disallow: /orphaned-rule-ignored
User-agent: *
Disallow: /a
Allow: /a/b
Disallow: /a/b
Allow: /x
Disallow: /x
""",
    # specific group present -> '*' ignored even though '*' is stricter
    "d.com": """
User-agent: *
Disallow: /
User-agent: spark
Disallow: /only-this/
""",
    # an unknown directive BETWEEN UA lines ends the first UA run, so the
    # '*' group below is separate and its rules never bind to us
    "e.com": """
User-agent: warchaeology-spark
Crawl-delay: 5
User-agent: *
Disallow: /x
""",
}

PATHS = [
    "/", "/private/", "/private/x", "/private/ok/x", "/public",
    "/tmp/a.bak", "/tmp/a.bak.old", "/tmp/keep/z", "/cgi-bin/q", "/cgx",
    "/a", "/a/b", "/a/bc", "/a/b/c", "/x", "/x/y",
    "/only-this/p", "/anything-else",
]


def _docs_df(spark):
    return spark.createDataFrame(
        [(h, c) for h, c in ROBOTS.items()], "host string, content string"
    )


def _urls_df(spark):
    rows = [
        (h, f"https://{h}{p}") for h in ROBOTS for p in PATHS
    ]
    return spark.createDataFrame(rows, "host string, url_canon string")


def test_rfc_gate_matches_reference(spark):
    got = {
        (r["host"], r["url_canon"]): r["robots_denied"]
        for r in robots_gate_from_txt(_urls_df(spark), _docs_df(spark), AGENT).collect()
    }
    for h, content in ROBOTS.items():
        rules = _ref_rules(content, AGENT)
        for p in PATHS:
            expect_denied = not _ref_match(rules, p)
            assert got[(h, f"https://{h}{p}")] == expect_denied, (h, p)


def test_pinned_semantics(spark):
    got = {
        (r["host"], r["url_canon"]): r["robots_denied"]
        for r in robots_gate_from_txt(_urls_df(spark), _docs_df(spark), AGENT).collect()
    }

    def denied(h, p):
        return got[(h, f"https://{h}{p}")]

    # a.com: we are in the specific group -> '*' Disallow:/ does NOT apply
    assert not denied("a.com", "/public")
    assert denied("a.com", "/private/x")
    assert not denied("a.com", "/private/ok/x")  # longer Allow wins
    # b.com: empty Disallow emits no rule; anchor: .bak blocked, .bak.old not
    assert not denied("b.com", "/")
    assert denied("b.com", "/tmp/a.bak")
    assert not denied("b.com", "/tmp/a.bak.old")
    assert not denied("b.com", "/tmp/keep/z")
    assert denied("b.com", "/cgi-bin/q")  # mid-pattern wildcard prefix
    assert not denied("b.com", "/cgx")
    # c.com: longest match alternates; equal-length tie -> allow wins
    assert denied("c.com", "/a")
    assert not denied("c.com", "/a/b")   # Allow:/a/b vs Disallow:/a/b tie
    assert denied("c.com", "/a/bc") is False  # Allow /a/b longest for /a/bc
    assert not denied("c.com", "/x/y")   # tie again -> allow
    # d.com: 'spark' is a substring of our product token -> specific group
    assert denied("d.com", "/only-this/p")
    assert not denied("d.com", "/anything-else")


def test_unknown_host_and_no_rules_allow(spark):
    urls = spark.createDataFrame(
        [("zz.com", "https://zz.com/anything")], "host string, url_canon string"
    )
    out = robots_gate_from_txt(urls, _docs_df(spark), AGENT).collect()
    assert out[0]["robots_denied"] is False


def test_rfc_gate_agrees_with_simple_gate_on_fixture_rules(spark, fixture_dir):
    """Integration: on the crawl fixture's disallow-only prefix rules
    (no allow rules, no wildcards) the RFC longest-match gate and the
    scheduler's simple any-disallow-prefix gate are semantically
    identical — synthesize robots.txt TEXT from the fixture rule table
    and assert both paths deny the same URL set."""
    from warchaeology_spark.frontier.politeness import robots_gate
    from warchaeology_spark.frontier.scheduler import _init_pending

    robots = spark.read.parquet(f"{fixture_dir}/robots.parquet")
    seeds = spark.read.parquet(f"{fixture_dir}/seeds.parquet")
    disallow = robots.filter(~F.col("allow"))
    docs = disallow.groupBy("host").agg(
        F.concat(
            F.lit("User-agent: *\n"),
            F.array_join(
                F.transform(
                    F.collect_list("path_pref"),
                    lambda p: F.concat(F.lit("Disallow: "), p),
                ),
                "\n",
            ),
        ).alias("content")
    )
    # seeds + one crafted URL under every disallowed prefix (seeds alone
    # may not touch a denied path at depth 0)
    urls = _init_pending(seeds).unionByName(
        disallow.select(
            F.concat(F.lit("com,"), F.col("host")).alias("surt"),  # distinct key
            F.concat(F.lit("https://"), "host", "path_pref", F.lit("x")).alias("url_canon"),
            F.xxhash64("host").alias("url_hash"),
            "host",
            F.lit(0).alias("depth"),
            F.lit(None).cast("string").alias("src_doc_id"),
        )
    )
    simple = robots_gate(urls, robots)
    rfc = robots_gate_from_txt(urls, docs, AGENT)
    a = {(r["url_canon"], r["robots_denied"]) for r in simple.collect()}
    b = {(r["url_canon"], r["robots_denied"]) for r in rfc.collect()}
    assert a == b
    assert any(d for _, d in a)  # the crafted URLs really are denied


def test_parse_rule_shape(spark):
    rules = parse_robots_txt(_docs_df(spark), AGENT)
    b = {
        (r["pattern"], r["allow"], r["wildcard"])
        for r in rules.filter(F.col("host") == "b.com").collect()
    }
    assert b == {
        ("/tmp/*.bak$", False, True),
        ("/tmp/keep", True, False),
        ("/cgi*", False, True),
    }
    # a.com: crawl-delay line ignored; orphaned pre-UA rules on c.com dropped
    c_pats = {
        r["pattern"]
        for r in rules.filter(F.col("host") == "c.com").collect()
    }
    assert "/orphaned-rule-ignored" not in c_pats


def test_unknown_directive_ends_ua_run(spark):
    """Group binding for directives between User-agent lines, aligned
    with _ref_rules (ADVICE r4): an unknown-but-keyed line (Crawl-delay)
    ENDS a UA run — the next UA starts a fresh group; a line with no ':'
    at all is ignored entirely and does NOT end the run."""
    content = (
        "User-agent: warchaeology-spark\n"
        "Crawl-delay: 5\n"
        "User-agent: otherbot\n"
        "Disallow: /x\n"
    )
    docs = spark.createDataFrame([("e.com", content)], "host string, content string")
    # Disallow /x binds ONLY to otherbot's (new) group
    assert parse_robots_txt(docs, AGENT).collect() == []
    got = parse_robots_txt(docs, "otherbot").collect()
    assert [(r["pattern"], r["allow"]) for r in got] == [("/x", False)]
    # matches the sequential reference parser
    assert _ref_rules(content, AGENT) == []
    assert _ref_rules(content, "otherbot") == [("/x", False)]
    # gate outcome: our specific group is empty -> /x allowed for us
    urls = spark.createDataFrame(
        [("e.com", "https://e.com/x")], "host string, url_canon string"
    )
    (row,) = robots_gate_from_txt(urls, docs, AGENT).collect()
    assert not row["robots_denied"]

    content2 = (
        "User-agent: otherbot\n"
        "garbage line with no colon\n"
        "User-agent: warchaeology-spark\n"
        "Disallow: /y\n"
    )
    docs2 = spark.createDataFrame([("f.com", content2)], "host string, content string")
    # the no-colon line is skipped: both UAs share ONE group
    got2 = parse_robots_txt(docs2, "otherbot").collect()
    assert [(r["pattern"], r["allow"]) for r in got2] == [("/y", False)]
    assert _ref_rules(content2, "otherbot") == [("/y", False)]
