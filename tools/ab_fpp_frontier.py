"""Interleaved A/B of CrawlConfig.fpp_checkpoint_tested on the FULL
frontier job (bench.py --frontier-only, local-cluster executors).

The kernel-side A/B (BENCH/ab_fpp_ckpt_r7.json) measured -13% (1x4
executors) / -24% (4x4 profiler steady-state) from localCheckpointing
the bloom-tested candidate frame so its lineage + bloom-probe UDF
evaluate once (survivors broadcast build and final probe scan both read
the cache). The scheduler plumbs the same knob
(CrawlConfig.fpp_checkpoint_tested -> SeenState.fpp_checkpoint_tested)
but defaults it OFF pending this measurement: the crawl's fetch-gate
stage contains the kernel's candidate stage, but the crawl also pays
politeness, robots, per-round stats and state checkpoints around it, so
the knob's share of the full pipeline must be measured on the full
pipeline.

Protocol: legs alternate knob 0,1,0,1,... within one session (fresh
bench.py subprocess each, i.e. fresh JVM per leg, exactly like the
executor ladder) so co-tenant drift hits both arms equally. Each leg is
bench.py's own best-of-SPARK_GRAFT_FRONTIER_PASSES crawl. Per the
round-6 ab_build.py advice: subprocess failures and timeouts are
recorded as error legs, never allowed to abort the run.

Usage: python tools/ab_fpp_frontier.py [pairs_4x4] [pairs_1x4]
       (defaults 2 and 1)
Writes BENCH/ab_fpp_frontier_r7.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_leg(n_exec: int, cores_per: int, knob: int) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_MASTER=f"local-cluster[{n_exec},{cores_per},7168]",
        SPARK_GRAFT_CPUS=str(n_exec * cores_per),
        SPARK_GRAFT_EXECUTOR_MEM="6g",
        SPARK_GRAFT_OFFHEAP_SIZE="4g",
        SPARK_DRIVER_MEM="8g",
        SPARK_GRAFT_FRONTIER_FPP_CKPT=str(knob),
    )
    with open("/proc/loadavg") as f:
        load_before = f.read().split()[0]
    try:
        out = subprocess.run(
            [sys.executable, "bench.py", "--frontier-only"],
            capture_output=True, text=True, env=env, timeout=2400, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return {"knob": knob, "executors": n_exec,
                "error": "timeout after 2400s", "loadavg_before": load_before}
    try:
        line = [l for l in out.stdout.strip().splitlines()
                if l.startswith("{")][-1]
        fr = json.loads(line)["frontier"]
    except Exception:
        return {"knob": knob, "executors": n_exec,
                "error": (out.stderr or out.stdout)[-800:],
                "loadavg_before": load_before}
    return {
        "knob": knob,
        "executors": n_exec,
        "best_sec": fr["elapsed_sec"],
        "pass_times_sec": fr.get("pass_times_sec"),
        "urls_per_sec": fr["urls_per_sec"],
        "urls_scheduled": fr["urls_scheduled"],
        "loadavg_before": load_before,
    }


def summarize(legs: list[dict]) -> dict:
    ok = [l for l in legs if "error" not in l]
    arms: dict[int, list[float]] = {0: [], 1: []}
    for l in ok:
        arms[l["knob"]].append(l["best_sec"])
    out: dict = {"legs": legs}
    if arms[0] and arms[1]:
        b0, b1 = min(arms[0]), min(arms[1])
        m0 = sum(arms[0]) / len(arms[0])
        m1 = sum(arms[1]) / len(arms[1])
        out["best_ckpt0_sec"] = b0
        out["best_ckpt1_sec"] = b1
        out["delta_best"] = f"{(b1 - b0) / b0 * 100:+.1f}%"
        out["delta_interleaved_mean"] = f"{(m1 - m0) / m0 * 100:+.1f}%"
        out["winner"] = 1 if m1 < m0 else 0
    return out


def main() -> None:
    pairs_4x4 = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    pairs_1x4 = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    subprocess.run(["bash", os.path.join(REPO, "tools", "make_submit.sh")],
                   check=True, capture_output=True)
    result: dict = {
        "what": ("fpp_checkpoint_tested A/B on the FULL frontier crawl "
                 "(bench.py --frontier-only, mid tier, local-cluster "
                 "executors, legs interleaved 0,1 within one session)"),
        "knob": "CrawlConfig.fpp_checkpoint_tested -> SeenState",
    }
    legs_4: list[dict] = []
    for _ in range(pairs_4x4):
        for knob in (0, 1):
            rec = run_leg(4, 4, knob)
            legs_4.append(rec)
            print(json.dumps(rec), flush=True)
    result["4x4_core_executors"] = summarize(legs_4)
    legs_1: list[dict] = []
    for _ in range(pairs_1x4):
        for knob in (0, 1):
            rec = run_leg(1, 4, knob)
            legs_1.append(rec)
            print(json.dumps(rec), flush=True)
    result["1x4_core_executors"] = summarize(legs_1)
    result["timestamp"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(os.path.join(REPO, "BENCH", "ab_fpp_frontier_r7.json"),
              "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items()
                      if k.endswith("executors")}))


if __name__ == "__main__":
    main()
