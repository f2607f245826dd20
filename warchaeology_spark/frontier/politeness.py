"""Robots gating + per-host politeness budgets with salted top-k (north rule;
no reference counterpart — SURVEY §2.O3, §4.2).

Deterministic contract (the reference's own answer to ordering is its
``--deterministic`` mode = lexicographically sorted inputs,
/root/reference/cmd/dedup/dedup.go:143-147, 249-253 — we adopt the same
total order, kept under full parallelism):

    crawl priority within a round = ORDER BY (depth ASC, url_canon ASC)

Politeness: each host schedules at most ``max_per_round`` URLs per round
(default budget for unlisted hosts: 2, FIXTURES.md §5), picked by that
total order.

Skew: a heavy host (30% of the frontier) would serialize a plain
``Window.partitionBy(host)`` top-k into one task. The salted two-phase
top-k fixes it without changing semantics:

  phase 1: rank within (host, salt), salt = pmod(xxhash64(url_canon), S)
           -> keep rank <= budget          (each task sees ~1/S of the host)
  phase 2: rank within host over the <= S*budget survivors -> keep <= budget

Top-k of per-salt top-ks == global top-k for the same k, so the result is
bit-identical to the unsalted window — asserted in tests. AQE skew-join
handling covers the residual joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUDGET = 2  # FIXTURES.md §5
DEFAULT_SALTS = 8

PRIORITY_COLS = ("depth", "url_canon")  # the deterministic total order


def robots_gate(urls: DataFrame, robots: DataFrame) -> DataFrame:
    """Annotate with ``robots_denied`` (any disallow prefix matches path).

    ``robots`` is tiny relative to the frontier -> broadcast join; the
    prefix test is a JVM ``startswith``. URLs with no rules pass.
    """
    # aggregate the (tiny) rule table to one prefix-array per host, then a
    # broadcast equi-join + `exists` — no row multiplication, no collapse
    # groupBy afterwards, one narrow broadcast join in the plan
    rules = (
        robots.filter(~F.col("allow"))
        .groupBy(F.col("host").alias("_rhost"))
        .agg(F.collect_list("path_pref").alias("_prefs"))
    )
    path = F.regexp_extract(F.col("url_canon"), r"^[a-z]+://[^/]+(/[^?#]*)", 1)
    joined = urls.join(F.broadcast(rules), urls["host"] == rules["_rhost"], "left")
    denied = F.when(
        F.col("_prefs").isNotNull(),
        F.exists("_prefs", lambda p: path.startswith(p)),
    ).otherwise(F.lit(False))
    return joined.withColumn("robots_denied", denied).drop("_rhost", "_prefs")


def with_budget(urls: DataFrame, politeness: DataFrame, default_budget: int = DEFAULT_BUDGET) -> DataFrame:
    """Attach per-host ``max_per_round`` (broadcast; default for unlisted)."""
    pol = politeness.select("host", "max_per_round")
    return urls.join(F.broadcast(pol), "host", "left").withColumn(
        "max_per_round", F.coalesce(F.col("max_per_round"), F.lit(default_budget))
    )


def politeness_topk(
    pending: DataFrame,
    politeness: DataFrame,
    default_budget: int = DEFAULT_BUDGET,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Select this round's fetches: per-host top-``budget`` by the
    deterministic priority order, via the salted two-phase top-k."""
    p = with_budget(pending, politeness, default_budget)
    order = [F.col(c).asc() for c in PRIORITY_COLS]
    if n_salts > 1:
        salt = F.pmod(F.xxhash64("url_canon"), F.lit(n_salts))
        w1 = Window.partitionBy("host", salt).orderBy(*order)
        p = (
            p.withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= F.col("max_per_round"))
            .drop("_r1")
        )
    w2 = Window.partitionBy("host").orderBy(*order)
    return (
        p.withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= F.col("max_per_round"))
        .drop("_r2", "max_per_round")
    )
