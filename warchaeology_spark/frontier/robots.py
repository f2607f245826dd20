"""robots.txt parsing + RFC 9309 longest-match gating, DataFrame-first.

The scheduler's basic gate (politeness.robots_gate) consumes pre-parsed
``(host, path_pref, allow)`` rows with disallow-prefix semantics — the
fixture model. Real crawls fetch robots.txt TEXT; this module turns a
``(host, content)`` corpus of robots.txt bodies into flat per-agent rules
and applies the RFC 9309 match: among all rules whose pattern matches the
path, the LONGEST pattern wins, and allow wins a length tie. ``*``
matches any characters and ``$`` anchors the end (RFC 9309 §2.2.3).

Everything is column expressions over one posexplode of the line list —
group structure (consecutive ``User-agent`` lines start a group; rules
bind to the nearest preceding group) is recovered with two window
functions, not Python. The rule tables are tiny next to the frontier, so
gating is one broadcast join + a per-row ``aggregate`` fold over the
host's rule array; literal patterns match with ``startswith`` (codegen),
wildcard patterns with per-row ``regexp_like`` (rare in practice).

Agent selection (RFC 9309 §2.2.1): groups naming the crawler's product
token (case-insensitive substring of the group's agent token) beat ``*``
groups; if any specific group matches, all ``*`` groups are ignored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots_txt(
    robots_docs: DataFrame, agent: str = "warchaeology-spark"
) -> DataFrame:
    """(host, content) robots.txt bodies -> flat rules for ``agent``:
    (host, pattern, allow, spec, wildcard).

    ``spec`` is the pattern's octet length (the RFC's specificity);
    ``wildcard`` marks patterns needing regex matching ('*' or '$').
    Empty-value Disallow lines mean "allow everything" and emit no rule.
    """
    ln = F.col("line")
    lines = (
        robots_docs.select(
            "host",
            F.posexplode(F.split(F.col("content"), "\r?\n")).alias("pos", "line"),
        )
        .withColumn("line", F.trim(F.substring_index(ln, "#", 1)))  # strip comments
        .filter(F.col("line") != "")
        .withColumn("key", F.lower(F.trim(F.substring_index(F.col("line"), ":", 1))))
        # value = everything after the FIRST ':' (paths may contain ':')
        .withColumn(
            "value",
            F.trim(
                F.substring(
                    F.col("line"), F.instr(F.col("line"), ":") + 1, 1 << 30
                )
            ),
        )
        # lines without a ':' are ignored entirely (they neither bind nor
        # end a UA run); lines with an UNKNOWN key (e.g. Crawl-delay) stay
        # in the stream until after group detection — they end a UA run,
        # so 'UA: a / Crawl-delay: 5 / UA: b' makes b a NEW group (pinned
        # in test_robots against the sequential reference parser)
        .filter(F.instr(F.col("line"), ":") > 0)
    )
    w = Window.partitionBy("host").orderBy("pos")
    is_ua = F.col("key") == "user-agent"
    # a UA line starts a NEW group unless the previous line (of ANY key)
    # was also a UA line (consecutive UA lines share one group)
    starts_group = is_ua & ~F.coalesce(
        F.lag(is_ua).over(w), F.lit(False)
    )
    grouped = (
        lines.withColumn("grp", F.sum(starts_group.cast("int")).over(w))
        .filter(F.col("grp") > 0)  # rules before any UA line bind to nothing
        .filter(F.col("key").isin("user-agent", "allow", "disallow"))
        # three consumers below (rules, agent matching, has-specific);
        # without a boundary Catalyst re-runs the posexplode+window parse
        # per consumer (plan-asserted in test_plans) — parse each
        # robots.txt ONCE, the table is tiny relative to the frontier
        .localCheckpoint(eager=True)
    )

    # which groups apply to us? specific token beats '*'; any-specific
    # present -> '*' groups ignored (RFC 9309 §2.2.1)
    agent_lc = agent.lower()
    uas = grouped.filter(is_ua).select(
        "host", "grp", F.lower(F.col("value")).alias("ua")
    )
    matched = uas.withColumn(
        "kind",
        F.when(F.col("ua") == "*", F.lit("star"))
        .when(F.lit(agent_lc).contains(F.col("ua")), F.lit("specific"))
        .otherwise(F.lit(None)),
    ).filter(F.col("kind").isNotNull())
    host_has_specific = matched.groupBy("host").agg(
        F.max((F.col("kind") == "specific").cast("int")).alias("_has_spec")
    )
    chosen = (
        matched.join(host_has_specific, "host")
        .filter(
            (F.col("kind") == "specific") | (F.col("_has_spec") == 0)
        )
        .select("host", "grp")
        .distinct()
    )

    rules = grouped.filter(~is_ua).join(chosen, ["host", "grp"])
    return rules.filter(F.col("value") != "").select(  # empty Disallow = no rule
        "host",
        F.col("value").alias("pattern"),
        (F.col("key") == "allow").alias("allow"),
        F.length("value").alias("spec"),
        (F.col("value").contains("*") | F.col("value").endswith("$")).alias("wildcard"),
    )


def _pattern_regex(pattern: F.Column) -> F.Column:
    """robots pattern -> anchored Java regex: escape meta, '*' -> '.*',
    trailing '$' -> end anchor (mid-pattern '$' is literal per RFC)."""
    # escape regex metacharacters EXCEPT '*' and '$' (handled below)
    esc = F.regexp_replace(pattern, r"([.^+?(){}\[\]\\|])", r"\\$1")
    has_anchor = pattern.endswith("$")
    body = F.when(has_anchor, F.substring(esc, 1, F.length(esc) - 1)).otherwise(esc)
    body = F.regexp_replace(body, r"\$", r"\\\$")  # literal mid-pattern '$'
    body = F.regexp_replace(body, r"\*", ".*")
    return F.concat(F.lit("^"), body, F.when(has_anchor, F.lit("$")).otherwise(F.lit("")))


def robots_gate_rfc(urls: DataFrame, rules: DataFrame) -> DataFrame:
    """Annotate ``urls`` (needs host, url_canon) with ``robots_denied``
    per RFC 9309: longest matching pattern wins; allow wins length ties;
    no matching rule (or no rules for the host) -> allowed.

    One broadcast join of the per-host rule array + a per-row aggregate
    fold selecting the best-matching rule — no row multiplication.
    """
    prepared = rules.select(
        "host",
        F.struct(
            F.col("pattern"),
            _pattern_regex(F.col("pattern")).alias("re"),
            F.col("allow"),
            F.col("spec").cast("int").alias("spec"),
            F.col("wildcard"),
        ).alias("rule"),
    )
    per_host = prepared.groupBy(F.col("host").alias("_rhost")).agg(
        F.collect_list("rule").alias("_rules")
    )
    # materialize the path as a REAL column before the join: the fold
    # below references it inside an HOF lambda (CodegenFallback), and an
    # inline expression would be re-evaluated once PER RULE in the host's
    # array instead of once per URL (VERDICT r4 #6; plan-pinned in
    # test_plans — one RegExpExtract, not one per rule)
    # (two projections on purpose: aliasing the extract first keeps
    # CollapseProject from inlining it twice into the when/otherwise)
    raw_path = F.regexp_extract(F.col("url_canon"), r"^[a-z]+://[^/]+(/.*)$", 1)
    with_path = (
        urls.withColumn("_rawp", raw_path)
        .withColumn(
            "_path",
            F.when(F.col("_rawp") == "", F.lit("/")).otherwise(F.col("_rawp")),
        )
        .drop("_rawp")
    )
    path = F.col("_path")
    joined = with_path.join(
        F.broadcast(per_host), with_path["host"] == per_host["_rhost"], "left"
    )

    def fold(acc, r):
        hit = F.when(
            r["wildcard"], F.regexp_like(path, r["re"])
        ).otherwise(path.startswith(r["pattern"]))
        better = hit & (
            (r["spec"] > acc["spec"])
            # allow wins the tie (RFC 9309 §2.2.2)
            | ((r["spec"] == acc["spec"]) & r["allow"] & ~acc["allow"])
        )
        return F.when(
            better, F.struct(r["allow"].alias("allow"), r["spec"].alias("spec"))
        ).otherwise(acc)

    best = F.aggregate(
        F.col("_rules"),
        F.struct(F.lit(True).alias("allow"), F.lit(-1).alias("spec")),
        fold,
    )
    denied = F.when(F.col("_rules").isNotNull(), ~best["allow"]).otherwise(F.lit(False))
    return joined.withColumn("robots_denied", denied).drop(
        "_rhost", "_rules", "_path"
    )


def robots_gate_from_txt(
    urls: DataFrame, robots_docs: DataFrame, agent: str = "warchaeology-spark"
) -> DataFrame:
    """Fetch-shaped convenience: robots.txt bodies -> parsed rules ->
    RFC gate. The parse output is tiny; persist it across rounds in a
    real crawl instead of re-parsing (same build-once shape as the seen
    bloom)."""
    return robots_gate_rfc(urls, parse_robots_txt(robots_docs, agent))
