"""A/B the novel() (bloom + exact anti-join) stage shapes at N and 4N cores.

The r4 stage ladder attributes the kernel's scaling residual to the
SHORT post-parse stages — novel() worst at 0.504 — not canonicalize
(0.813). Hypotheses measured here, each in a fresh JVM:

- base:     current slim shape. ``tested`` (bloom-UDF column over the
            candidates) is consumed TWICE (survivor anti-join + final
            probe), so the bloom UDF + derive expressions run 2x per row.
- bigbatch: base + spark.sql.execution.arrow.maxRecordsPerBatch=65536
            (default 10k -> 1600 Python batches for 16M rows; per-batch
            overhead is fixed cost that hits the 16-core side hardest).
- ckpt:     localCheckpoint(tested) before the two consumers — one bloom
            UDF evaluation total, at the price of materializing the
            tested frame.
- jvm:      r5: SeenState(jvm_bloom=True) — membership via the codegen'd
            JVM BloomFilterMightContain expression (driver bitset kept in
            BloomFilterImpl layout); ZERO Python on the novel path, so
            the per-batch Arrow fixed cost that bigbatch only shrinks is
            eliminated outright.
            MEASURED r5 (BENCH/ab_novel_r5.json): REJECTED — 35-44%
            slower than base at both 4 and 16 cores and worse 4->16
            efficiency (0.497 vs 0.662); the ~14 MB filter literal is
            deserialized per task in every consuming stage. See the
            round-5 note in BENCH/BASELINE.md.

Usage: python tools/ab_novel.py                      # all variants, 4+16
       python tools/ab_novel.py --child V CPUS N     # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = ("base", "bigbatch", "ckpt", "jvm")


def child(variant: str, cpus: int, n_urls: int) -> None:
    from pyspark.sql import functions as F

    from warchaeology_spark.frontier.seen import SeenState
    from warchaeology_spark.session import get_spark

    n_hosts = 10_000
    extra = {}
    if variant == "bigbatch":
        extra["spark.sql.execution.arrow.maxRecordsPerBatch"] = "65536"
    spark = get_spark(f"abnovel-{variant}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus, extra_conf=extra)
    # pre-derived candidates (the novel stage's real input shape)
    cand = (
        spark.range(n_urls, numPartitions=cpus * 2)
        .select(
            F.format_string(
                "https://host%d.example.com/p/%d?a=1&b=%d",
                F.pmod(F.col("id"), F.lit(n_hosts)), F.col("id"),
                F.pmod(F.col("id"), F.lit(7)),
            ).alias("url_canon"),
            F.format_string(
                "com,example,host%d)/p/%d?a=1&b=%d",
                F.pmod(F.col("id"), F.lit(n_hosts)), F.col("id"),
                F.pmod(F.col("id"), F.lit(7)),
            ).alias("surt"),
            F.format_string("host%d.example.com", F.pmod(F.col("id"), F.lit(n_hosts))).alias("host"),
        )
        .select("url_canon", "surt", "host", F.xxhash64("surt").alias("url_hash"),
                F.lit(0).alias("depth"))
        .localCheckpoint(eager=True)
    )
    seen = SeenState(spark, num_partitions=cpus, expected_total=n_urls,
                     use_bloom=True, jvm_bloom=(variant == "jvm"),
                     broadcast_max_delta=n_urls)
    pre = (
        spark.range(0, n_urls, 2, numPartitions=cpus)
        .select(
            F.format_string(
                "com,example,host%d)/p/%d?a=1&b=%d",
                F.pmod(F.col("id"), F.lit(n_hosts)), F.col("id"),
                F.pmod(F.col("id"), F.lit(7)),
            ).alias("surt")
        )
        .select(F.xxhash64("surt").alias("url_hash"), "surt", F.lit("x").alias("url_canon"))
        .localCheckpoint(eager=True)
    )
    seen.add(pre)
    seen.seen = pre
    if variant == "ckpt":
        seen.fpp_checkpoint_tested = True

    jsc = spark.sparkContext._jsc
    keep_ids = {int(x) for x in jsc.getPersistentRDDs().keySet().toArray()}

    def free_pass_rdds():
        cur = jsc.getPersistentRDDs()
        for rid in cur.keySet().toArray():
            if int(rid) not in keep_ids:
                cur.get(rid).unpersist(False)

    def one_pass(df) -> int:
        out = seen.novel(df).localCheckpoint(eager=True)
        return out.count()

    one_pass(cand.limit(2_000_000))  # warmup
    free_pass_rdds()
    times = []
    n = 0
    for _ in range(4):
        t0 = time.monotonic()
        n = one_pass(cand)
        times.append(round(time.monotonic() - t0, 2))
        free_pass_rdds()
    print(json.dumps({
        "variant": variant, "cpus": cpus, "n_urls": n_urls, "novel_out": n,
        "best_sec": min(times), "pass_times_sec": times,
        "urls_per_sec": round(n_urls / min(times), 1),
    }))
    spark.stop()


def wait_quiet() -> float:
    t0 = time.monotonic()
    while time.monotonic() - t0 < 900:
        with open("/proc/loadavg") as f:
            load = float(f.read().split()[0])
        if load < 2.5:
            return load
        time.sleep(20)
    return load


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
        return
    n_urls = int(os.environ.get("SPARK_GRAFT_AB_URLS", "16000000"))
    trials = int(os.environ.get("SPARK_GRAFT_AB_TRIALS", "2"))
    sel = os.environ.get("SPARK_GRAFT_AB_VARIANTS")
    variants = tuple(sel.split(",")) if sel else VARIANTS
    results = []
    for _ in range(trials):
        for cpus in (16, 4):
            for v in variants:
                load = wait_quiet()
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--child",
                     v, str(cpus), str(n_urls)],
                    capture_output=True, text=True, timeout=1800,
                    env=dict(os.environ, SPARK_DRIVER_MEM="48g"),
                    cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                )
                try:
                    rec = json.loads(
                        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
                    )
                except Exception:
                    rec = {"variant": v, "cpus": cpus, "error": out.stderr[-400:]}
                rec["loadavg_before"] = load
                results.append(rec)
                print(json.dumps(rec), flush=True)
    with open("BENCH/ab_novel.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
