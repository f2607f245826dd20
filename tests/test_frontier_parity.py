"""Crawl-order + URL-seen-set parity: engine vs sequential oracle
(BASELINE.json metric; FIXTURES.md §6). Also: bloom on/off equivalence,
salted top-k equivalence, checkpoint/resume equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from warchaeology_spark.frontier.oracle import simulate_crawl
from warchaeology_spark.frontier.scheduler import CrawlConfig, run_crawl


def _load_inputs(spark, fixture_dir):
    docs = spark.read.parquet(f"{fixture_dir}/documents_spans.parquet")
    seeds = spark.read.parquet(f"{fixture_dir}/seeds.parquet")
    robots = spark.read.parquet(f"{fixture_dir}/robots.parquet")
    pol = spark.read.parquet(f"{fixture_dir}/politeness.parquet")
    return docs, seeds, robots, pol


def _rows(df):
    return [r.asDict(recursive=True) for r in df.collect()]


@pytest.fixture(scope="module")
def oracle_result(spark, fixture_dir):
    docs, seeds, robots, pol = _load_inputs(spark, fixture_dir)
    return simulate_crawl(
        _rows(docs), _rows(seeds), _rows(robots), _rows(pol), max_rounds=5
    )


def _fetch_tuples(fetch_log_df):
    return [
        (r["round"], r["seq"], r["url_canon"], r["surt"], r["url_hash"],
         r["host"], r["depth"], r["src_doc_id"])
        for r in fetch_log_df.orderBy("seq").collect()
    ]


def _oracle_tuples(oracle_result):
    return [
        (e["round"], e["seq"], e["url_canon"], e["surt"], e["url_hash"],
         e["host"], e["depth"], e["src_doc_id"])
        for e in oracle_result.fetch_log
    ]


def test_crawl_order_and_seen_parity(spark, fixture_dir, oracle_result):
    docs, seeds, robots, pol = _load_inputs(spark, fixture_dir)
    res = run_crawl(
        spark, docs, seeds, robots, pol,
        CrawlConfig(max_rounds=5, use_bloom=True, num_partitions=4,
                    expected_total=20_000),
    )
    assert _fetch_tuples(res.fetch_log) == _oracle_tuples(oracle_result)

    engine_seen = {
        (r["surt"], r["url_hash"], r["url_canon"]) for r in res.seen.collect()
    }
    oracle_seen = {
        (surt, h, canon) for surt, (h, canon) in oracle_result.seen.items()
    }
    assert engine_seen == oracle_seen

    # per-round metrics agree too
    assert res.metrics == oracle_result.metrics

    # per-partition lineage: shard counts sum to the round's scheduled count
    for m, pm in zip(res.metrics, res.partition_metrics):
        assert m["round"] == pm["round"]
        assert sum(pm["scheduled_per_partition"].values()) == m["scheduled"]


def test_bloom_off_equivalence(spark, fixture_dir, oracle_result):
    docs, seeds, robots, pol = _load_inputs(spark, fixture_dir)
    res = run_crawl(
        spark, docs, seeds, robots, pol,
        CrawlConfig(max_rounds=5, use_bloom=False),
    )
    assert _fetch_tuples(res.fetch_log) == _oracle_tuples(oracle_result)


def test_fpp_checkpoint_tested_equivalence(spark, fixture_dir, oracle_result):
    # CrawlConfig.fpp_checkpoint_tested (evaluate the bloom-tested
    # candidates once, cached) must preserve exact fetch-log parity.
    # (At this fixture's size novel() takes the branchy small-state
    # shape — the slim-branch checkpoint itself is pinned row-exact in
    # test_seen_bloom.test_slim_and_branchy_novel_shapes_agree; this
    # test pins the config plumbing end-to-end.)
    docs, seeds, robots, pol = _load_inputs(spark, fixture_dir)
    res = run_crawl(
        spark, docs, seeds, robots, pol,
        CrawlConfig(max_rounds=5, use_bloom=True, num_partitions=4,
                    expected_total=20_000, fpp_checkpoint_tested=True),
    )
    assert _fetch_tuples(res.fetch_log) == _oracle_tuples(oracle_result)


def test_ckpt_discovered_off_equivalence(spark, fixture_dir, oracle_result):
    # ckpt_discovered defaults True (the -25% materialization fix,
    # BENCH/ab_ckpt_disc_r7.json) so the default path is exercised by
    # every other test here; this pins the NON-default lazy path — the
    # checkpoint must be semantically transparent in both directions.
    docs, seeds, robots, pol = _load_inputs(spark, fixture_dir)
    res = run_crawl(
        spark, docs, seeds, robots, pol,
        CrawlConfig(max_rounds=5, use_bloom=True, num_partitions=4,
                    expected_total=20_000, ckpt_discovered=False),
    )
    assert _fetch_tuples(res.fetch_log) == _oracle_tuples(oracle_result)


def test_bloom_sharded_equivalence(spark, fixture_dir, oracle_result):
    # cogroup-sharded bloom path (broadcast off) must match too
    docs, seeds, robots, pol = _load_inputs(spark, fixture_dir)
    res = run_crawl(
        spark, docs, seeds, robots, pol,
        CrawlConfig(max_rounds=3, use_bloom=True, broadcast_bloom=False,
                    num_partitions=4, expected_total=20_000),
    )
    oracle3 = [t for t in _oracle_tuples(oracle_result) if t[0] < 3]
    assert _fetch_tuples(res.fetch_log) == oracle3


def test_bloom_jvm_equivalence(spark, fixture_dir, oracle_result):
    # JVM BloomFilterMightContain serving mode (zero-Python membership)
    # must schedule fetch-for-fetch identically too
    docs, seeds, robots, pol = _load_inputs(spark, fixture_dir)
    res = run_crawl(
        spark, docs, seeds, robots, pol,
        CrawlConfig(max_rounds=3, use_bloom=True, jvm_bloom=True,
                    num_partitions=4, expected_total=20_000),
    )
    oracle3 = [t for t in _oracle_tuples(oracle_result) if t[0] < 3]
    assert _fetch_tuples(res.fetch_log) == oracle3


def test_salting_does_not_change_semantics(spark, fixture_dir, oracle_result):
    docs, seeds, robots, pol = _load_inputs(spark, fixture_dir)
    res = run_crawl(
        spark, docs, seeds, robots, pol,
        CrawlConfig(max_rounds=3, use_bloom=False, n_salts=1),
    )
    res_salted = run_crawl(
        spark, docs, seeds, robots, pol,
        CrawlConfig(max_rounds=3, use_bloom=False, n_salts=16),
    )
    assert _fetch_tuples(res.fetch_log) == _fetch_tuples(res_salted.fetch_log)


def test_checkpoint_resume(spark, fixture_dir, oracle_result, tmp_path):
    docs, seeds, robots, pol = _load_inputs(spark, fixture_dir)
    root = str(tmp_path / "snap")
    # run 2 rounds with checkpointing, then "crash" and resume to 5
    run_crawl(spark, docs, seeds, robots, pol,
              CrawlConfig(max_rounds=2, store_root=root))
    resumed = run_crawl(
        spark, docs, seeds, robots, pol,
        CrawlConfig(max_rounds=5, store_root=root, resume=True),
    )
    assert _fetch_tuples(resumed.fetch_log) == _oracle_tuples(oracle_result)
    engine_seen = {r["surt"] for r in resumed.seen.collect()}
    assert engine_seen == set(oracle_result.seen)


def test_deferred_commit_every_k_rounds(spark, fixture_dir, oracle_result, tmp_path):
    """commit_every=2 defers snapshot commits: one commit appends TWO
    rounds' seen/fetch deltas, and resume replays from the last committed
    round exactly (VERDICT r5 next #3 — per-round fixed cost)."""
    docs, seeds, robots, pol = _load_inputs(spark, fixture_dir)
    root = str(tmp_path / "snap_k2")
    run_crawl(spark, docs, seeds, robots, pol,
              CrawlConfig(max_rounds=3, store_root=root, commit_every=2))
    resumed = run_crawl(
        spark, docs, seeds, robots, pol,
        CrawlConfig(max_rounds=5, store_root=root, resume=True,
                    commit_every=2),
    )
    assert _fetch_tuples(resumed.fetch_log) == _oracle_tuples(oracle_result)
    assert {r["surt"] for r in resumed.seen.collect()} == set(oracle_result.seen)


def test_kill_with_uncommitted_deferred_rounds_resumes_exactly(
    spark, fixture_dir, oracle_result, tmp_path, monkeypatch
):
    """The deferred-commit durability contract: a kill loses at most k-1
    uncommitted rounds, and resume REPLAYS them exactly. Simulated by
    dropping every snapshot commit after the first on the floor (the
    crash happens before later commits reach disk), then resuming: the
    store holds only rounds 0-1, so rounds 2+ re-run — and the replayed
    crawl must still match the sequential oracle row-for-row."""
    from warchaeology_spark.frontier import checkpoint as cp

    docs, seeds, robots, pol = _load_inputs(spark, fixture_dir)
    root = str(tmp_path / "snap_kill")
    real_commit = cp.SnapshotStore.commit
    n_commits = {"n": 0}

    def crashy_commit(self, *a, **kw):
        n_commits["n"] += 1
        if n_commits["n"] > 1:
            return None  # commit never reached disk: the process died
        return real_commit(self, *a, **kw)

    monkeypatch.setattr(cp.SnapshotStore, "commit", crashy_commit)
    run_crawl(spark, docs, seeds, robots, pol,
              CrawlConfig(max_rounds=4, store_root=root, commit_every=2))
    monkeypatch.setattr(cp.SnapshotStore, "commit", real_commit)
    assert n_commits["n"] > 1  # the crawl DID attempt later commits

    resumed = run_crawl(
        spark, docs, seeds, robots, pol,
        CrawlConfig(max_rounds=5, store_root=root, resume=True,
                    commit_every=2),
    )
    # the store's manifest stops at round 2 -> rounds 2-4 replay
    assert resumed.rounds_run == 3
    assert _fetch_tuples(resumed.fetch_log) == _oracle_tuples(oracle_result)
    assert {r["surt"] for r in resumed.seen.collect()} == set(oracle_result.seen)


def test_eager_state_checkpoints_equivalent(spark, fixture_dir, oracle_result):
    """lazy_state_checkpoints=False (the r5 behavior: a dedicated
    materialization job per carry-over table per round) must produce the
    identical crawl — the lazy default only moves WHEN materialization
    happens, never what is computed."""
    docs, seeds, robots, pol = _load_inputs(spark, fixture_dir)
    res = run_crawl(
        spark, docs, seeds, robots, pol,
        CrawlConfig(max_rounds=5, lazy_state_checkpoints=False),
    )
    assert _fetch_tuples(res.fetch_log) == _oracle_tuples(oracle_result)


def test_delta_commits_write_round_delta_not_full_state(spark, fixture_dir, oracle_result, tmp_path):
    # append-only tables (seen, fetch_log) must commit O(round delta)
    # bytes, not O(accumulated state): each snapshot's manifest appends
    # exactly one new delta path whose row count equals that round's
    # additions (VERDICT r2 #4)
    from warchaeology_spark.frontier.checkpoint import SnapshotStore

    docs, seeds, robots, pol = _load_inputs(spark, fixture_dir)
    root = str(tmp_path / "snap")
    res = run_crawl(spark, docs, seeds, robots, pol,
                    CrawlConfig(max_rounds=4, store_root=root))
    store = SnapshotStore(spark, root)
    versions = store.versions()
    assert len(versions) == res.rounds_run
    prev_paths: list[str] = []
    for i, v in enumerate(versions):
        entry = store.manifest(v)["tables"]["seen"]
        paths = entry["paths"]
        # chain grows by exactly one delta, reusing prior files verbatim
        assert paths[:-1] == prev_paths
        delta_rows = spark.read.parquet(paths[-1]).count()
        m = res.metrics[i]
        if i == 0:  # round-0 delta also carries the gated seed set
            from warchaeology_spark.frontier.scheduler import _init_pending

            expected = m["novel"] + _init_pending(seeds).count()
        else:
            expected = m["novel"]
        assert delta_rows == expected
        fl_paths = store.manifest(v)["tables"]["fetch_log"]["paths"]
        assert len(fl_paths) == i + 1
        assert spark.read.parquet(fl_paths[-1]).count() == m["scheduled"]
        prev_paths = paths
    # the unioned chain is the full seen set
    assert store.load("seen").count() == res.seen.count()


def test_delta_chain_compacts(spark, fixture_dir, oracle_result, tmp_path, monkeypatch):
    # chains longer than compact_after collapse to one file set and
    # resume/parity still holds
    from warchaeology_spark.frontier.checkpoint import SnapshotStore

    monkeypatch.setattr(SnapshotStore, "compact_after", 2)
    docs, seeds, robots, pol = _load_inputs(spark, fixture_dir)
    root = str(tmp_path / "snap")
    run_crawl(spark, docs, seeds, robots, pol,
              CrawlConfig(max_rounds=2, store_root=root))
    resumed = run_crawl(
        spark, docs, seeds, robots, pol,
        CrawlConfig(max_rounds=5, store_root=root, resume=True),
    )
    store = SnapshotStore(spark, root)
    for v in store.versions():
        for t in ("seen", "fetch_log"):
            assert len(store.manifest(v)["tables"][t]["paths"]) <= 3
    assert _fetch_tuples(resumed.fetch_log) == _oracle_tuples(oracle_result)
    engine_seen = {r["surt"] for r in resumed.seen.collect()}
    assert engine_seen == set(oracle_result.seen)


def test_torn_commit_tmp_manifest_is_harmless(spark, fixture_dir, oracle_result, tmp_path):
    # a driver killed between manifest write and rename leaves a
    # {v}.json.tmp behind; it must not break versions()/resume, and the
    # next store init garbage-collects it
    from warchaeology_spark.frontier.checkpoint import SnapshotStore

    docs, seeds, robots, pol = _load_inputs(spark, fixture_dir)
    root = str(tmp_path / "snap")
    run_crawl(spark, docs, seeds, robots, pol,
              CrawlConfig(max_rounds=2, store_root=root))
    store = SnapshotStore(spark, root)
    v = store.latest_version()
    # simulate the torn commit: an in-flight temp for the NEXT version
    store._write_text(f"{root}/snapshots/{v + 1:08d}.json.tmp", "{torn")
    assert store.versions()[-1] == v  # filter ignores it even before GC
    store2 = SnapshotStore(spark, root)  # init GCs the stray temp
    assert store2.latest_version() == v
    assert not store2._fs.exists(
        store2._Path(f"{root}/snapshots/{v + 1:08d}.json.tmp")
    )
    resumed = run_crawl(
        spark, docs, seeds, robots, pol,
        CrawlConfig(max_rounds=5, store_root=root, resume=True),
    )
    assert _fetch_tuples(resumed.fetch_log) == _oracle_tuples(oracle_result)


def test_auto_demotion_mid_crawl_parity(spark, fixture_dir, oracle_result, tmp_path):
    """Mid-crawl broadcast->sharded bloom demotion (seen.py
    broadcast_max_delta) must preserve exact fetch-log/seen parity, the
    demoted MODE must be recorded in the snapshot meta, and a resume must
    come back sharded instead of collecting the bitsets to the driver
    (ADVICE r3 #4; VERDICT r3 next #6)."""
    from warchaeology_spark.frontier.checkpoint import SnapshotStore

    docs, seeds, robots, pol = _load_inputs(spark, fixture_dir)
    root = str(tmp_path / "snap")
    # round-0 seed add is small; round-1+ novel counts exceed 5 on this
    # fixture, so a max_delta of 5 forces a MID-crawl demotion
    demoted = run_crawl(
        spark, docs, seeds, robots, pol,
        CrawlConfig(max_rounds=3, num_partitions=4, expected_total=20_000,
                    broadcast_max_delta=5, store_root=root),
    )
    oracle3 = [t for t in _oracle_tuples(oracle_result) if t[0] < 3]
    assert _fetch_tuples(demoted.fetch_log) == oracle3
    store = SnapshotStore(spark, root)
    ss_meta = store.meta()["seen_state"]
    assert ss_meta["broadcast_bloom"] is False  # demotion happened + persisted
    # resume must apply the sharded mode BEFORE restore and stay exact
    resumed = run_crawl(
        spark, docs, seeds, robots, pol,
        CrawlConfig(max_rounds=5, num_partitions=4, expected_total=20_000,
                    broadcast_max_delta=5, store_root=root, resume=True),
    )
    assert _fetch_tuples(resumed.fetch_log) == _oracle_tuples(oracle_result)
    assert {r["surt"] for r in resumed.seen.collect()} == set(oracle_result.seen)


def test_fresh_crawl_refuses_dirty_store(spark, fixture_dir, tmp_path):
    """resume=False against a root holding an old crawl's snapshots must
    fail fast: commit() would chain the old crawl's seen/fetch_log deltas
    into the new crawl's state (ADVICE r3 #1)."""
    docs, seeds, robots, pol = _load_inputs(spark, fixture_dir)
    root = str(tmp_path / "snap")
    run_crawl(spark, docs, seeds, robots, pol,
              CrawlConfig(max_rounds=2, store_root=root))
    with pytest.raises(ValueError, match="resume=True"):
        run_crawl(spark, docs, seeds, robots, pol,
                  CrawlConfig(max_rounds=2, store_root=root))


def test_crawl_from_robots_txt_documents(spark, fixture_dir, oracle_result):
    """run_crawl accepts raw robots.txt documents (host, content): the
    RFC parser runs once per crawl and the crawl is IDENTICAL to one
    gated by the equivalent pre-parsed prefix table (the fixture rules
    are disallow-only prefixes, where both semantics coincide)."""
    docs, seeds, robots, pol = _load_inputs(spark, fixture_dir)
    txt = (
        robots.filter(~F.col("allow"))
        .groupBy("host")
        .agg(
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
    )
    res = run_crawl(
        spark, docs, seeds, txt, pol,
        CrawlConfig(max_rounds=3, num_partitions=4, expected_total=20_000),
    )
    oracle3 = [t for t in _oracle_tuples(oracle_result) if t[0] < 3]
    assert _fetch_tuples(res.fetch_log) == oracle3


def test_robots_gating_effective(spark, fixture_dir, oracle_result):
    # fixture guarantees one fully-disallowed host; it must never be fetched
    docs, seeds, robots, pol = _load_inputs(spark, fixture_dir)
    denied_hosts = {
        r["host"] for r in robots.filter(F.col("path_pref") == "/").collect()
    }
    assert denied_hosts
    fetched_hosts = {e["host"] for e in oracle_result.fetch_log}
    assert not (denied_hosts & fetched_hosts)


def test_span_sequence_invariant(spark, fixture_dir):
    """input_hint per-row invariant: the engine's span processing preserves
    span-sequence equality (kind, text, media_ref, order). Explode -> process
    -> reassemble-by-position must reproduce each document's span array
    exactly, and match a driver-side Python reconstruction."""
    docs = spark.read.parquet(f"{fixture_dir}/documents_spans.parquet")
    re = (
        docs.select("doc_id", F.posexplode("spans").alias("pos", "span"))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "span"))).alias("ps"))
        .select(
            "doc_id",
            F.transform("ps", lambda x: x["span"]).alias("spans_reassembled"),
        )
    )
    joined = docs.join(re, "doc_id", "full")
    assert joined.filter(
        F.col("spans").isNull()
        | F.col("spans_reassembled").isNull()
        | (F.col("spans") != F.col("spans_reassembled"))
    ).count() == 0
    # driver-side reference: tuple-for-tuple, order included
    eng = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in r["spans_reassembled"]
        ]
        for r in re.collect()
    }
    ref = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in r["spans"]
        ]
        for r in docs.collect()
    }
    assert eng == ref


def test_all_seeds_denied_first_round_flush(spark, fixture_dir, tmp_path):
    """ADVICE r6 medium: a fresh store-backed crawl whose FIRST round
    schedules zero URLs (all seeds robots-denied) reaches the flush with
    seen_deltas=[seed delta] but fetch_logs=[] — pre-fix this crashed with
    IndexError in _commit_snapshot. Must instead commit the seed delta,
    omit the fetch_log append, and finish with an empty fetch log."""
    from warchaeology_spark.functions.urls import host_of

    docs, seeds, robots, pol = _load_inputs(spark, fixture_dir)
    deny_all = (
        seeds.select(host_of("url").alias("host"))
        .unionByName(robots.select("host"))
        .distinct()
        .select("host", F.lit("/").alias("path_pref"), F.lit(False).alias("allow"))
    )
    root = str(tmp_path / "snap_denied")
    res = run_crawl(
        spark, docs, seeds, deny_all, pol,
        CrawlConfig(max_rounds=3, store_root=root),
    )
    assert res.fetch_log.count() == 0
    # the seeds still entered the seen set (they were considered, denied)
    assert res.seen.count() >= seeds.count()
    # and the store is resumable without error
    resumed = run_crawl(
        spark, docs, seeds, deny_all, pol,
        CrawlConfig(max_rounds=3, store_root=root, resume=True),
    )
    assert resumed.fetch_log.count() == 0


def test_commit_every_validation(spark, fixture_dir):
    """ADVICE r6 low: commit_every=0 hit the in-loop modulo as a
    ZeroDivisionError; negatives gave a nonsensical cadence. Both must
    raise ValueError up front."""
    docs, seeds, robots, pol = _load_inputs(spark, fixture_dir)
    for bad in (0, -1):
        with pytest.raises(ValueError, match="commit_every"):
            run_crawl(spark, docs, seeds, robots, pol,
                      CrawlConfig(max_rounds=1, commit_every=bad))


def test_profile_stages_parity(spark, fixture_dir, oracle_result):
    """profile_stages adds checkpoints + count jobs for attribution; the
    crawl itself must be bit-identical, and the per-round timing rows
    must carry the stage fields."""
    docs, seeds, robots, pol = _load_inputs(spark, fixture_dir)
    res = run_crawl(
        spark, docs, seeds, robots, pol,
        CrawlConfig(max_rounds=5, num_partitions=4, expected_total=20_000,
                    profile_stages=True),
    )
    assert _fetch_tuples(res.fetch_log) == _oracle_tuples(oracle_result)
    assert all(
        {"extract_dedup_sec", "novel_filter_sec", "discovered_rows",
         "novel_rows"} <= set(t)
        for t in res.timings if t.get("round", 0) < res.rounds_run
    )
