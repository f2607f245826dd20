"""Stage-level kernel profile: parse / bloom+anti-join / politeness split.

Same workload as bench.py run_kernel but with an eager materialization
between stages so each stage's cost is attributable. Usage:

    SPARK_GRAFT_CPUS=4 SPARK_GRAFT_KERNEL_URLS=16000000 python tools/profile_kernel.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from warchaeology_spark.frontier.politeness import politeness_topk  # noqa: E402
from warchaeology_spark.frontier.seen import SeenState  # noqa: E402
from warchaeology_spark.functions.urls import canonicalize_url, parts_from_canon  # noqa: E402
from warchaeology_spark.session import get_spark  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    n_urls = int(os.environ.get("SPARK_GRAFT_KERNEL_URLS", "16000000"))
    n_hosts = 10_000
    spark = get_spark("profile-kernel", master=f"local[{cpus}]", shuffle_partitions=cpus)

    i = F.col("id")
    raw = F.format_string(
        "HTTPS://Host%d.Example.COM:443/p/%d?b=%d&a=1#f",
        F.pmod(i, F.lit(n_hosts)), i, F.pmod(i, F.lit(7)),
    )
    urls = spark.range(n_urls, numPartitions=cpus * 2).select(raw.alias("raw_url")).localCheckpoint(eager=True)
    seen = SeenState(spark, num_partitions=cpus, expected_total=n_urls, use_bloom=True)
    pre = spark.range(0, n_urls, 2, numPartitions=cpus).select(
        F.format_string("com,example,host%d)/p/%d?a=1&b=%d",
                        F.pmod(F.col("id"), F.lit(n_hosts)), F.col("id"),
                        F.pmod(F.col("id"), F.lit(7))).alias("surt")
    ).select(F.xxhash64("surt").alias("url_hash"), "surt", F.lit("x").alias("url_canon")).localCheckpoint(eager=True)
    t0 = time.monotonic()
    seen.add(pre)
    if not seen.broadcast_bloom:
        seen.bloom = seen.bloom.localCheckpoint(eager=True)
    print(f"bloom build: {time.monotonic()-t0:.1f}s", flush=True)
    seen.seen = pre
    pol = spark.range(n_hosts).select(
        F.format_string("host%d.example.com", F.col("id")).alias("host"),
        (F.pmod(F.col("id"), F.lit(3)) * 16 + 16).cast("int").alias("max_per_round"),
    ).localCheckpoint(eager=True)

    def stage(name, fn):
        t0 = time.monotonic()
        r = fn()
        dt = time.monotonic() - t0
        print(f"{name}: {dt:.1f}s ({n_urls/dt/1000:.0f}k URLs/s) -> {r}", flush=True)

    # two-step parse, mirroring bench.py run_kernel: stage 1a materializes
    # ONLY url_canon; stage 1b derives surt/host/hash via byte-scan
    # intrinsics from the clean canonical string.
    box = {}
    def canon():
        box["canon"] = (
            urls.select(canonicalize_url(F.col("raw_url")).alias("url_canon"))
            .filter(F.col("url_canon").isNotNull())
            .localCheckpoint(eager=True)
        )
        return box["canon"].rdd.getNumPartitions()
    stage("1a canonicalize+materialize", canon)
    def derive():
        d = parts_from_canon(F.col("url_canon"))
        box["cand"] = (
            box["canon"].select(
                "url_canon", d["surt"].alias("surt"), d["host"].alias("host")
            )
            .select("url_canon", "surt", "host",
                    F.xxhash64("surt").alias("url_hash"),
                    F.lit(0).alias("depth"))
            .localCheckpoint(eager=True)
        )
        return box["cand"].rdd.getNumPartitions()
    stage("1b derive surt/host/hash", derive)
    cand_plan = box.get("cand")
    def nov():
        box["novel"] = seen.novel(box["cand"]).localCheckpoint(eager=True)
        return box["novel"].count()
    stage("2 bloom+anti-join", nov)
    stage("3 politeness topk", lambda: politeness_topk(box["novel"], pol, default_budget=16, n_salts=8).count())
    # full kernel exactly as bench.py run_kernel stages it (canon checkpoint
    # inside), end-to-end timing for cross-checking the ladder numbers
    t0 = time.monotonic()
    canon_step = (
        urls.select(canonicalize_url(F.col("raw_url")).alias("url_canon"))
        .filter(F.col("url_canon").isNotNull())
        .localCheckpoint(eager=True)
    )
    d2 = parts_from_canon(F.col("url_canon"))
    full_cand = canon_step.select(
        "url_canon", d2["surt"].alias("surt"), d2["host"].alias("host")
    ).select("url_canon", "surt", "host", F.xxhash64("surt").alias("url_hash"),
             F.lit(0).alias("depth"))
    n = politeness_topk(seen.novel(full_cand), pol, default_budget=16, n_salts=8).count()
    dt = time.monotonic() - t0
    print(f"FULL kernel (two-step): {dt:.1f}s ({n_urls/dt/1000:.0f}k URLs/s) sched={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
