"""Interleaved A/B of CrawlConfig.ckpt_discovered on the FULL frontier
job (bench.py --frontier-only, local-cluster executors).

Motivation: the round-7 profile_stages run at mid10x — which does
strictly MORE work per round (two extra checkpoints + two count jobs) —
beat the unprofiled run 155.0 vs 212.9 s on back-to-back sessions. The
only plan difference that can SAVE time is the eager localCheckpoint of
`discovered` (the deduped winners) before novel(): novel()'s fpp-rescue
shape has two consumers of its input (slim survivors anti-join +
full-width probe join), and without a boundary each consumer restarts
from the dedup exchange's map outputs, re-running the winner min_by
re-aggregation and the bloom-probe UDF. Checkpointing `discovered` is
winner-sized and narrow — unlike fpp_checkpoint_tested (full candidate
width, post-UDF), which the same protocol measured +13% SLOWER at the
mid tier (BENCH/ab_fpp_frontier_r7.json).

Protocol: identical to tools/ab_fpp_frontier.py — legs alternate knob
0,1,0,1 with a fresh bench.py subprocess (fresh JVM) per leg so
co-tenant drift hits both arms equally; each leg reports bench.py's own
best-of-SPARK_GRAFT_FRONTIER_PASSES crawl; subprocess failures and
timeouts become error legs, never aborts.

Usage: python tools/ab_ckpt_disc.py [tier] [pairs] [n_exec] [cores_per]
       (defaults: mid 2 4 4)
Writes BENCH/ab_ckpt_disc_r7.json (one section per tier run; reruns with
a different tier merge into the same file).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH", "ab_ckpt_disc_r7.json")


def run_leg(tier: str, n_exec: int, cores_per: int, knob: int) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_MASTER=f"local-cluster[{n_exec},{cores_per},7168]",
        SPARK_GRAFT_CPUS=str(n_exec * cores_per),
        SPARK_GRAFT_EXECUTOR_MEM="6g",
        SPARK_GRAFT_OFFHEAP_SIZE="4g",
        SPARK_DRIVER_MEM="8g",
        SPARK_GRAFT_FRONTIER_TIER=tier,
        SPARK_GRAFT_FRONTIER_CKPT_DISC=str(knob),
    )
    if tier != "mid":
        # big tiers skip the warmup crawl and amortize via pass 2 instead
        env.setdefault("SPARK_GRAFT_FRONTIER_WARMUP", "0")
    with open("/proc/loadavg") as f:
        load_before = f.read().split()[0]
    try:
        out = subprocess.run(
            [sys.executable, "bench.py", "--frontier-only"],
            capture_output=True, text=True, env=env, timeout=3000, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return {"knob": knob, "executors": n_exec,
                "error": "timeout after 3000s", "loadavg_before": load_before}
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
    tier = sys.argv[1] if len(sys.argv) > 1 else "mid"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_exec = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    cores_per = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    subprocess.run(["bash", os.path.join(REPO, "tools", "make_submit.sh")],
                   check=True, capture_output=True)
    result: dict = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            result = json.load(f)
    result.setdefault("what", (
        "ckpt_discovered A/B on the FULL frontier crawl (bench.py "
        "--frontier-only, local-cluster executors, legs interleaved "
        "0,1 within one session, fresh JVM per leg)"))
    result["knob"] = "CrawlConfig.ckpt_discovered"
    legs: list[dict] = []
    for _ in range(pairs):
        for knob in (0, 1):
            rec = run_leg(tier, n_exec, cores_per, knob)
            legs.append(rec)
            print(json.dumps(rec), flush=True)
    key = f"{tier}_{n_exec}x{cores_per}"
    # re-runs of the same shape MERGE with the recorded legs (pairs
    # accumulate across sessions instead of silently replacing)
    prior = result.get(key, {}).get("legs", [])
    result[key] = summarize(prior + legs)
    result["timestamp"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({key: {k: v for k, v in result[key].items()
                            if k != "legs"}}))


if __name__ == "__main__":
    main()
