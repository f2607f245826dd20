"""The crawl-frontier round scheduler (north rule; SURVEY §7 M5-M6).

Iterative batch rounds over snapshot state (not Structured Streaming): at
10^10-URL scale the seen/pending state must live in partitioned tables,
not in a streaming state store. Each round is one declarative DataFrame
plan; Catalyst/AQE pick physical strategies, and the only Python on the
data path is the vectorized bloom test (seen.py).

Round dataflow::

    pending ──politeness_topk (salted per-host top-k)──> scheduled(round r)
    scheduled ──anti-join──> pending'
    scheduled ⋈ documents(url) ──extract_outlinks──> raw links
    links ──canonicalize (JVM) ── surt/url_hash ──> candidates
    candidates ──first-wins min_by (shuffle on surt)──> discovered
    discovered ──SeenState.novel (bloom + exact anti-join)──> novel
    novel ──robots_gate──> allowed | denied
    seen += novel;  pending' += allowed(depth+1)
    commit snapshot {pending, seen, bloom, fetch_log_r, metrics_r}

Determinism contract (= the reference's --deterministic semantics,
/root/reference/cmd/dedup/dedup.go:143-147, generalized to stay parallel):
every order-sensitive step keys on the total order (depth, url_canon),
and same-round duplicate discoveries resolve by
min(src_depth, src_url, span_offset, link_idx). The sequential oracle
(frontier/oracle.py) implements the identical contract; parity tests
assert exact crawl-order and seen-set equality.

Scale notes (100 TB / 1000-executor design points):
- the documents ⋈ scheduled join: scheduled is the small side (budget x
  hosts per round) -> broadcast; documents stays put. On a real cluster
  documents is Iceberg-bucketed by xxhash64(url) so even a huge scheduled
  side co-locates.
- seen anti-join: hash-partitioned on url_hash; the bloom pre-filter
  removes the already-seen majority before the shuffle.
- heavy-host skew: salted two-phase top-k (politeness.py) + AQE.
- lineage: every round ends in a parquet-backed snapshot (checkpoint.py),
  so plan depth is O(1) in rounds and a kill resumes from the last commit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warchaeology_spark.frontier.checkpoint import SnapshotStore
from warchaeology_spark.frontier.links import extract_outlinks
from warchaeology_spark.frontier.politeness import politeness_topk, robots_gate
from warchaeology_spark.frontier.seen import SeenState
from warchaeology_spark.functions.urls import canonical_parts, surt_key
from warchaeology_spark.plans.ranks import global_sequence

PENDING_COLS = ["surt", "url_canon", "url_hash", "host", "depth", "src_doc_id"]


@dataclass
class CrawlConfig:
    max_rounds: int = 10
    default_budget: int = 2
    n_salts: int = 8
    use_bloom: bool = True
    broadcast_bloom: bool = True  # False -> cogroup-sharded bloom (seen.py)
    # True -> JVM BloomFilterMightContain serving mode (seen.py jvm_bloom):
    # membership stays whole-stage-codegen JVM, zero Python on the novel
    # path; add() keeps the 8 B/URL delta pull. Overrides broadcast_bloom.
    jvm_bloom: bool = False
    # override SeenState.broadcast_max_delta (rows per add() above which
    # broadcast mode self-demotes to cogroup-sharded); None = seen.py default
    broadcast_max_delta: int | None = None
    num_partitions: int = 8
    expected_total: int = 100_000
    store_root: str | None = None  # enables checkpoint/resume
    resume: bool = False
    # Commit a snapshot every k rounds instead of every round (VERDICT r5
    # next #3: per-round fixed cost). Uncommitted round deltas accumulate
    # in driver-side lists of lazy DataFrames and are appended in ONE
    # commit, so a kill loses at most k-1 rounds of progress and resume
    # replays from the last committed round exactly as before (the
    # manifest's next_round is the first uncommitted one). The final
    # (or early-terminating) round always commits.
    commit_every: int = 1
    # Lazy (deferred) localCheckpoints for the round's carry-over state:
    # pending and seen are checkpointed eager=False, so their
    # materialization folds into the FIRST job of the next round
    # (politeness / novel) instead of costing a dedicated job each —
    # two fewer driver-side job round trips per round. Same lineage
    # truncation, same results; False restores the r5 behavior.
    lazy_state_checkpoints: bool = True
    # Checkpoint the bloom-tested candidate frame inside novel() so the
    # discovered lineage (post-shuffle winner canonicalization + bloom
    # UDF) evaluates ONCE instead of twice (survivors broadcast build +
    # final probe scan) — SeenState.fpp_checkpoint_tested. Costs one
    # materialization of the round's candidates (bounded by per-round
    # candidate volume, never |seen|, so the cache stays round-sized at
    # any crawl scale). Measured on the 16M-URL kernel at 4x4-core
    # executors: -24% pass time (39.4 -> 29.9 s best-of-3). On the FULL
    # crawl the same knob measured +13% SLOWER (interleaved same-session
    # A/B, BENCH/ab_fpp_frontier_r7.json) — here the candidate lineage
    # restarts from the dedup shuffle's materialized map outputs (the
    # expensive parse sits BEFORE that exchange), so re-evaluating
    # `tested` re-reads shuffle files + re-runs the bloom probe, which
    # is cheaper than writing a full-width checkpoint of every
    # candidate. An upstream shuffle is already a materialization
    # boundary; only exchange-free lineages (the kernel's) benefit from
    # an explicit one. Hence default False for the scheduler.
    fpp_checkpoint_tested: bool = False
    # Materialize the round's deduped winners (`discovered`: surt,
    # url_canon, url_hash, host, depth, src_doc_id — winner-sized and
    # narrow) BEFORE the novel filter. novel()'s fpp-rescue shape reads
    # its input twice (slim survivors anti-join + full-width probe);
    # without a boundary here each consumer restarts from the dedup
    # exchange's map outputs and re-runs the winner re-aggregation and
    # the bloom UDF. Unlike fpp_checkpoint_tested (full-width, post-UDF,
    # measured slower on the crawl), this boundary sits pre-UDF at the
    # narrowest shared point of the lineage, so it replaces the repeated
    # post-shuffle work with one winner-sized write. First observed as a
    # side effect of profile_stages (the profiled mid10x pass, doing
    # strictly MORE work, beat the unprofiled one 155 vs 213 s); default
    # set by the interleaved A/B in BENCH/ab_ckpt_disc_r7.json.
    ckpt_discovered: bool = True
    # r8 (VERDICT r7 next #2 — cut per-round fixed cost F kernel-style):
    # lazy localCheckpoints for the INTRA-round frames too (scheduled,
    # discovered, gated). Each eager checkpoint is its own driver job +
    # full barrier; with all three lazy, the round's first action — the
    # merged stats collect — materializes the whole
    # politeness→fetch→dedup→novel→gate lineage in ONE job, and every
    # later consumer (seen add, pending union, fetch log, commit) reads
    # the caches. Same lineage truncation, same sharing, same results;
    # the per-round driver job count drops from ~4 to ~1 (+commit).
    # Interleaved fresh-JVM A/B at the bench mid tier: see
    # BENCH/ab_lazy_round_r8.json. profile_stages forces eager (per-stage
    # wall-clock attribution needs real job boundaries). Env override:
    # SPARK_GRAFT_FRONTIER_LAZY_ROUND=0 restores r7 behavior.
    lazy_round_checkpoints: bool = field(
        default_factory=lambda: __import__("os").environ.get(
            "SPARK_GRAFT_FRONTIER_LAZY_ROUND", "1"
        )
        == "1"
    )
    # Opt-in per-STAGE attribution inside the fetch/gate phase (VERDICT r6
    # next #5: mid10x fetch_gate grew 43 -> 71 -> 86 s/round; is the
    # growth candidate volume or |seen|-superlinear?). When True, the
    # round loop materializes `discovered` (extract + dedup shuffle +
    # winner canonicalization) and `novel` (bloom test + exact rescue)
    # separately, records each stage's wall-clock plus the intermediate
    # row counts. Extra checkpoints + count jobs per round — profiling
    # only, never the production path.
    profile_stages: bool = False


@dataclass
class CrawlResult:
    fetch_log: DataFrame  # (round, seq, url_canon, surt, url_hash, host, depth, src_doc_id)
    seen: DataFrame
    metrics: list[dict] = field(default_factory=list)
    # per-partition lineage (north rule): for each round, scheduled-row
    # counts per url_hash partition — the audit trail that a resume/replay
    # re-derives the same shard contents. Kept separate from `metrics` so
    # metrics stays bit-comparable with the sequential oracle's.
    partition_metrics: list[dict] = field(default_factory=list)
    rounds_run: int = 0
    # per-round wall-clock of each driver-side phase (politeness ckpt,
    # fetch+gate ckpt, merged stats collect, seen add, state ckpts,
    # commit) — the measurement behind the per-round fixed-cost F work
    timings: list[dict] = field(default_factory=list)


def _canonicalized(df: DataFrame, url_col: str) -> DataFrame:
    """Attach url_canon / surt / url_hash / host; drop non-crawlable rows.

    One fused parse (canonical_parts) supplies all three string columns;
    the hash is xxhash64 over the surt (the seen-set identity key).
    """
    out = (
        df.withColumn("_cp", canonical_parts(url_col))
        .select("*", "_cp.url_canon", "_cp.surt", "_cp.host")
        .drop("_cp")
        .filter(F.col("url_canon").isNotNull())
        .withColumn("url_hash", F.xxhash64("surt"))
    )
    return out


def _init_pending(seeds: DataFrame) -> DataFrame:
    """Canonicalize seeds; first-wins per surt by seed_rank (total order)."""
    c = _canonicalized(seeds, "url")
    firsts = c.groupBy("surt").agg(
        F.min_by(
            F.struct("url_canon", "url_hash", "host", "seed_rank"), F.col("seed_rank")
        ).alias("w")
    )
    return firsts.select(
        "surt",
        F.col("w.url_canon").alias("url_canon"),
        F.col("w.url_hash").alias("url_hash"),
        F.col("w.host").alias("host"),
        F.lit(0).alias("depth"),
        F.lit(None).cast("string").alias("src_doc_id"),
    )


def run_crawl(
    spark: SparkSession,
    documents: DataFrame,
    seeds: DataFrame,
    robots: DataFrame,
    politeness: DataFrame,
    config: CrawlConfig = CrawlConfig(),
) -> CrawlResult:
    if config.commit_every < 1:
        # 0 would hit the in-loop modulo as a ZeroDivisionError and negative
        # values would produce a nonsensical commit cadence (ADVICE r6 low)
        raise ValueError(
            f"commit_every must be >= 1, got {config.commit_every}"
        )
    store = SnapshotStore(spark, config.store_root) if config.store_root else None
    if store and not config.resume and store.latest_version() is not None:
        # A fresh crawl must not chain onto an old crawl's append deltas:
        # commit() extends the chain from manifest(latest), so committing
        # v=latest+1 here would union the OLD crawl's seen/fetch_log files
        # into this crawl's state after the first in-loop restore (stale
        # seen rows suppressing new URLs, stale fetch rows leaking into the
        # result). Fail fast; the caller either resumes or points at a
        # fresh root. (ADVICE r3 #1.)
        raise ValueError(
            f"store root {config.store_root!r} already holds snapshot "
            f"v{store.latest_version()}; pass resume=True to continue that "
            "crawl, or use an empty store root for a fresh crawl"
        )
    seen_state = SeenState(
        spark,
        num_partitions=config.num_partitions,
        expected_total=config.expected_total,
        use_bloom=config.use_bloom,
        broadcast_bloom=config.broadcast_bloom,
        jvm_bloom=config.jvm_bloom,
        fpp_checkpoint_tested=config.fpp_checkpoint_tested,
        **(
            {"broadcast_max_delta": config.broadcast_max_delta}
            if config.broadcast_max_delta is not None
            else {}
        ),
    )
    # robots input is either the pre-parsed (host, path_pref, allow)
    # prefix table (fixture/oracle model, any-disallow-prefix semantics)
    # or raw robots.txt DOCUMENTS (host, content) — then the RFC 9309
    # parser runs ONCE per crawl (robots.py; longest-match, allow-tie,
    # wildcards) and each round gates against the persisted rule table.
    if "content" in robots.columns:
        from warchaeology_spark.frontier.robots import (
            parse_robots_txt,
            robots_gate_rfc,
        )

        rules = parse_robots_txt(robots).localCheckpoint(eager=True)

        def gate(df: DataFrame) -> DataFrame:
            return robots_gate_rfc(df, rules)
    else:
        def gate(df: DataFrame) -> DataFrame:
            return robots_gate(df, robots)

    metrics: list[dict] = []
    partition_metrics: list[dict] = []
    # committed vs uncommitted split: commits APPEND only the uncommitted
    # round deltas (seen rows added, fetch rows logged since last commit) —
    # per-round committed bytes are proportional to the round delta, not
    # the accumulated state (VERDICT r2 #4)
    fetch_log_base: DataFrame | None = None
    fetch_logs: list[DataFrame] = []  # uncommitted round logs
    seen_deltas: list[DataFrame] = []  # uncommitted seen additions
    start_round = 0

    if store and config.resume and store.latest_version() is not None:
        m = store.meta()
        start_round = m["next_round"]
        metrics = list(m.get("metrics", []))
        partition_metrics = list(m.get("partition_metrics", []))
        pending = store.load("pending")
        # apply the committed seen-state mode BEFORE restore: a crawl that
        # auto-demoted to sharded must resume sharded (ADVICE r3 #4), and
        # bloom setter semantics depend on the mode. Pre-r4 manifests have
        # no seen_state entry -> keep the configured defaults.
        ss_meta = m.get("seen_state", {})
        if not ss_meta.get("broadcast_bloom", seen_state.broadcast_bloom):
            seen_state.broadcast_bloom = False
        if not ss_meta.get("jvm_bloom", seen_state.jvm_bloom):
            seen_state.jvm_bloom = False  # demotions are one-way (jvm -> sharded)
        committed_rows = ss_meta.get("seen_rows_approx")
        if committed_rows is not None:
            seen_state.seen_rows_approx = int(committed_rows)
        seen_state.restore(
            store.load("seen"),
            store.load("bloom") if config.use_bloom else None,
            # with an exact committed count the join-shape choice is
            # informed; only assume-large when resuming a pre-r4 manifest
            assume_large=committed_rows is None,
        )
        if "fetch_log" in store.manifest()["tables"]:
            fetch_log_base = store.load("fetch_log")
    else:
        gated = gate(_init_pending(seeds))
        gated = gated.localCheckpoint(eager=True)
        # one action gives the gated total AND the denied count: the seed
        # add gets its delta-size hint and n_pending derives arithmetically
        c0 = gated.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("robots_denied").cast("long")).alias("d"),
        ).collect()[0]
        seen_state.add(gated, n_rows=c0["n"])  # denied seeds are seen too
        seen_deltas.append(gated.select("url_hash", "surt", "url_canon"))
        pending = gated.filter(~F.col("robots_denied")).select(*PENDING_COLS)
        pending = pending.localCheckpoint(eager=True)

    # pending size is tracked arithmetically across rounds (one count at
    # init, then pending_after = pending - scheduled + allowed) — saves a
    # driver action per round; at toy round sizes fixed per-round job cost
    # dominates the driver throughput metric.
    if store and config.resume and store.latest_version() is not None:
        n_pending = pending.count()
    else:
        n_pending = c0["n"] - int(c0["d"] or 0)
    timings: list[dict] = []

    def _commit_snapshot(next_round: int) -> None:
        """One snapshot commit: append the accumulated (possibly multi-
        round) seen/fetch deltas, rewrite pending + bloom, then re-read to
        truncate lineage at the snapshot boundary."""
        nonlocal fetch_logs, seen_deltas, pending, fetch_log_base
        # Either delta list may be empty at a flush (e.g. a fresh crawl whose
        # FIRST round schedules nothing: seen_deltas holds the seed delta but
        # fetch_logs is [] — ADVICE r6 medium). Union only what exists and
        # omit the corresponding append key; commit() appends nothing for
        # absent keys, so an empty delta costs no snapshot file.
        append: dict[str, DataFrame] = {}
        if seen_deltas:
            sd = seen_deltas[0]
            for extra in seen_deltas[1:]:
                sd = sd.unionByName(extra)
            append["seen"] = sd
        if fetch_logs:
            fl = fetch_logs[0]
            for extra in fetch_logs[1:]:
                fl = fl.unionByName(extra)
            append["fetch_log"] = fl
        # pending mutates non-monotonically -> full rewrite (bounded by
        # the live frontier; Iceberg swap: merge-on-read). bloom bitsets
        # mutate in place -> full rewrite (3 GB at the 10^10 design
        # point vs ~1 TB for seen — the seen/fetch_log deltas are the
        # write-amplification fix that matters).
        tables = {"pending": pending}
        if config.use_bloom:
            tables["bloom"] = seen_state.bloom
        store.commit(
            tables,
            {
                "next_round": next_round,
                "metrics": metrics,
                "partition_metrics": partition_metrics,
                # seen-state mode must survive resume: a crawl that
                # auto-demoted to cogroup-sharded must NOT resume into
                # broadcast mode (restore would collect the full bitset
                # set — ~3 GB at the 10^10 design point — to the driver
                # and re-enter the mode the demotion guard escaped).
                # The exact row count lets resume keep the right
                # novel() join shape without an extra action.
                # (ADVICE r3 #4.)
                "seen_state": {
                    "broadcast_bloom": seen_state.broadcast_bloom,
                    "jvm_bloom": seen_state.jvm_bloom,
                    "seen_rows_approx": seen_state.seen_rows_approx,
                },
            },
            append=append,
        )
        seen_deltas = []
        fetch_logs = []
        # re-read to truncate lineage at the snapshot boundary. The
        # bloom is NOT restored in broadcast mode: the driver shards
        # are already authoritative and have no lineage to truncate —
        # re-seeding them here would collect the full bitset set to
        # the driver and mark every shard dirty (a full rebroadcast
        # next round), reinstating exactly the per-round full-bloom
        # round-trip the delta-broadcast chain eliminates. Shards are
        # seeded from the store only on an actual resume.
        pending = store.load("pending")
        reload_bloom = seen_state.is_sharded
        # assume_large=False: this is the in-loop lineage-truncation
        # restore — seen_rows_approx is already exact via add() hints;
        # inflating it would lock toy crawls onto the slim-join shape's
        # fixed per-round latency (ADVICE r3 #2)
        seen_state.restore(
            store.load("seen"),
            store.load("bloom") if reload_bloom else None,
            assume_large=False,
            # in-loop lineage-truncation restore of bits this same crawl
            # just wrote — the jvm-layout format probe (a driver job in
            # sharded mode) is only needed on a true resume (ADVICE r6 low)
            check_format=False,
        )
        # a flush with zero logged fetches (fresh crawl whose first round
        # schedules nothing) commits no fetch_log table
        if store.has_table("fetch_log"):
            fetch_log_base = store.load("fetch_log")

    import time as _time

    eager_state = not config.lazy_state_checkpoints
    # profile_stages needs real job boundaries for per-stage attribution
    eager_round = config.profile_stages or not config.lazy_round_checkpoints
    r = start_round
    while r < config.max_rounds:
        tr: dict = {"round": r}
        t0 = _time.monotonic()
        scheduled = politeness_topk(
            pending, politeness, config.default_budget, config.n_salts
        ).localCheckpoint(eager=eager_round)
        tr["politeness_ckpt_sec"] = round(_time.monotonic() - t0, 3)

        fetch_log_r = scheduled.select(
            F.lit(r).alias("round"), "url_canon", "surt", "url_hash", "host",
            "depth", "src_doc_id",
        )
        pending_next = pending.join(
            scheduled.select("surt"), "surt", "left_anti"
        )

        # fetch: exact canonical-URL match against the document table.
        # scheduled is tiny vs documents -> broadcast the scheduled side.
        fetched_docs = documents.join(
            F.broadcast(scheduled.select(F.col("url_canon").alias("url"))), "url"
        )
        links = extract_outlinks(fetched_docs.select("doc_id", "url", "spans"))
        links = links.join(
            F.broadcast(
                scheduled.select(F.col("url_canon").alias("src_url"), F.col("depth").alias("src_depth"))
            ),
            "src_url",
        )
        # Two-step canonicalization around the dedup shuffle: the map side
        # computes ONLY the surt grouping key (one parse tree + its filter
        # copy — Catalyst inlines column expressions into every consumer,
        # so each extra derived column would re-run the full parse per
        # row); the winner's url_canon/host are derived AFTER the shuffle,
        # on the deduped survivors only. Same winner row, same outputs:
        # the min_by order tuple is unchanged, and url_canon/host are pure
        # functions of the winning raw_url.
        cands = links.withColumn("surt", surt_key(F.col("raw_url"))).filter(
            F.col("surt").isNotNull()
        )
        # same-round first-wins per surt: min over the discovery total order
        winners = cands.groupBy("surt").agg(
            F.min_by(
                F.struct("raw_url", "src_depth", "src_doc_id"),
                F.struct("src_depth", "src_url", "span_offset", "link_idx"),
            ).alias("w")
        )
        wcp = canonical_parts(F.col("w.raw_url"))
        discovered = winners.select(
            "surt",
            wcp["url_canon"].alias("url_canon"),
            F.xxhash64("surt").alias("url_hash"),
            wcp["host"].alias("host"),
            (F.col("w.src_depth") + 1).alias("depth"),
            F.col("w.src_doc_id").alias("src_doc_id"),
        )

        if config.profile_stages or config.ckpt_discovered:
            t0 = _time.monotonic()
            discovered = discovered.localCheckpoint(eager=eager_round)
            tr["extract_dedup_sec"] = round(_time.monotonic() - t0, 3)
        if config.profile_stages:
            tr["discovered_rows"] = discovered.count()  # cached, one cheap job
            t0 = _time.monotonic()
            novel = seen_state.novel(discovered).localCheckpoint(eager=True)
            tr["novel_filter_sec"] = round(_time.monotonic() - t0, 3)
            tr["novel_rows"] = novel.count()
        else:
            novel = seen_state.novel(discovered)
        t0 = _time.monotonic()
        gated = gate(novel).localCheckpoint(eager=eager_round)
        tr["fetch_gate_ckpt_sec"] = round(_time.monotonic() - t0, 3)

        # ONE merged driver action for everything the round must learn
        # (VERDICT r5 next #3 — was two collects): the scheduled count +
        # per-partition lineage AND the gated novel/denied counts, as a
        # union of two tiny aggregates over the two checkpointed frames.
        t0 = _time.monotonic()
        pid_col = (
            F.pmod(F.col("url_hash"), F.lit(config.num_partitions))
            .cast("int")
            .alias("pid")
        )
        sched_stats = scheduled.groupBy(pid_col).agg(
            F.count(F.lit(1)).alias("value")
        ).select(F.lit("part").alias("kind"), "pid", "value")
        gated_stats = (
            gated.agg(
                F.count(F.lit(1)).alias("novel"),
                F.sum(F.col("robots_denied").cast("long")).alias("denied"),
            )
            .select(
                F.explode(
                    F.array(
                        F.struct(
                            F.lit("novel").alias("kind"),
                            F.lit(-1).alias("pid"),
                            F.col("novel").cast("long").alias("value"),
                        ),
                        F.struct(
                            F.lit("denied").alias("kind"),
                            F.lit(-1).alias("pid"),
                            F.coalesce(F.col("denied"), F.lit(0))
                            .cast("long")
                            .alias("value"),
                        ),
                    )
                ).alias("s")
            )
            .select("s.*")
        )
        stats = sched_stats.unionByName(gated_stats).collect()
        part_rows = [x for x in stats if x["kind"] == "part"]
        n_sched = sum(x["value"] for x in part_rows)
        n_novel = next(x["value"] for x in stats if x["kind"] == "novel")
        n_denied = int(next(x["value"] for x in stats if x["kind"] == "denied"))
        tr["stats_collect_sec"] = round(_time.monotonic() - t0, 3)
        if n_sched == 0:
            # nothing scheduled -> the (empty) round changed no state;
            # flush any deltas deferred by commit_every before stopping
            if store and (fetch_logs or seen_deltas):
                _commit_snapshot(r)
            break
        fetch_logs.append(fetch_log_r)
        pending = pending_next

        t0 = _time.monotonic()
        seen_state.add(gated, n_rows=n_novel)  # hint: auto mode-demotion
        seen_deltas.append(gated.select("url_hash", "surt", "url_canon"))
        allowed = gated.filter(~F.col("robots_denied")).select(*PENDING_COLS)
        tr["seen_add_sec"] = round(_time.monotonic() - t0, 3)
        # carry-over state: lazily checkpointed by default — the lineage
        # cut still happens, but materialization rides the next round's
        # first job instead of costing a dedicated job here
        t0 = _time.monotonic()
        pending = pending.unionByName(allowed).localCheckpoint(eager=eager_state)
        seen_state.seen = seen_state.seen.localCheckpoint(eager=eager_state)
        if seen_state.is_sharded:
            # sharded mode (configured, or auto-demoted on a large delta):
            # truncate the cogroup lineage. Broadcast and jvm modes keep
            # their bits on the driver — nothing to checkpoint here.
            seen_state.bloom = seen_state.bloom.localCheckpoint(eager=True)
        tr["state_ckpt_sec"] = round(_time.monotonic() - t0, 3)

        # derived, not re-counted: pending' = pending - scheduled + allowed
        # (the scheduled anti-join removes exactly n_sched rows — scheduled
        # is a subset of pending by construction; allowed = novel - denied)
        n_pending = n_pending - n_sched + (n_novel - n_denied)
        metrics.append(
            {
                "round": r,
                "scheduled": n_sched,
                "novel": n_novel,
                "robots_denied": n_denied,
                "pending_after": n_pending,
            }
        )
        partition_metrics.append(
            {"round": r, "scheduled_per_partition": {int(x["pid"]): x["value"] for x in part_rows}}
        )

        if store and (
            (r + 1 - start_round) % config.commit_every == 0
            or r == config.max_rounds - 1
        ):
            t0 = _time.monotonic()
            _commit_snapshot(r + 1)
            tr["commit_sec"] = round(_time.monotonic() - t0, 3)
        timings.append(tr)
        r += 1

    parts = ([fetch_log_base] if fetch_log_base is not None else []) + fetch_logs
    if parts:
        fl = parts[0]
        for extra in parts[1:]:
            fl = fl.unionByName(extra)
    else:
        fl = spark.createDataFrame(
            [], "round int, url_canon string, surt string, url_hash long,"
            " host string, depth int, src_doc_id string"
        )
    # global crawl order: rounds ascend; within a round the deterministic
    # total order (depth, url_canon). Dense seq via the distributed two-pass.
    fl = global_sequence(fl, ["round", "depth", "url_canon"], "seq")
    return CrawlResult(
        fetch_log=fl,
        seen=seen_state.seen,
        metrics=metrics,
        partition_metrics=partition_metrics,
        rounds_run=r - start_round,
        timings=timings,
    )
