"""Interleaved build-vs-build bench A/B: separate BOX drift from CODE.

Round-6 lesson: this box's effective memory bandwidth swings 30-70%
between nights (and +36% trial-to-trial within one night) while loadavg
and a cheap row-scan control both read quiet — so comparing absolute
bench numbers across rounds silently conflates box and build. The only
trustworthy build comparison is INTERLEAVED on the same night: check
out the baseline commit into a scratch clone, then run
baseline->candidate->baseline->candidate with the identical harness
env, quiet-gating each leg, and compare best-of within the same window.
(This protocol adjudicated round 6's apparent 29->50 s kernel
"regression" as 100% box: the r5 build read 36.9-50.2 s on the same
night, and HEAD was faster on the cleanest same-control pair.)

Usage:
  python tools/ab_build.py BASELINE_REF [--mode kernel|frontier]
      [--trials 2] [--master local-cluster[4,4,7168] | local[16]]

Writes BENCH/ab_build_<mode>.json: per-leg records (elapsed, passes,
loadavg, control) tagged baseline/candidate, plus a best-of summary and
the baseline/candidate ratio. The scratch clone lives in /tmp and is
reused if its checkout already matches BASELINE_REF.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sh(args: list[str], **kw) -> subprocess.CompletedProcess:
    return subprocess.run(args, capture_output=True, text=True, **kw)


def ensure_baseline_clone(ref: str) -> str:
    rp = _sh(["git", "rev-parse", "--verify", "--quiet", f"{ref}^{{commit}}"],
             cwd=REPO)
    sha = rp.stdout.strip()
    if rp.returncode != 0 or not sha:
        raise SystemExit(f"unknown ref: {ref}")
    path = f"/tmp/ab_build_{sha[:12]}"
    # a half-created or stale clone silently benches the wrong code labeled
    # "baseline" (ADVICE r6 low): clone/checkout must hard-fail, and a
    # reused dir must actually sit at the resolved sha
    if not os.path.isdir(path):
        _sh(["git", "clone", "-q", REPO, path]).check_returncode()
        _sh(["git", "checkout", "-q", sha], cwd=path).check_returncode()
    head = _sh(["git", "rev-parse", "HEAD"], cwd=path)
    head.check_returncode()
    if head.stdout.strip() != sha:
        raise SystemExit(
            f"stale baseline clone at {path}: HEAD={head.stdout.strip()[:12]} "
            f"!= {sha[:12]} — remove the dir and rerun"
        )
    # the submit zip is what local-cluster executors import
    _sh(["bash", os.path.join(path, "tools", "make_submit.sh")],
        cwd=path).check_returncode()
    _sh(["bash", os.path.join(REPO, "tools", "make_submit.sh")],
        cwd=REPO).check_returncode()
    return path


def wait_quiet(threshold: float, timeout_sec: float) -> str:
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout_sec:
        with open("/proc/loadavg") as f:
            load = f.read().split()[0]
        if float(load) < threshold:
            return load
        time.sleep(15)
    return load


def run_leg(repo: str, mode: str, master: str, cpus: int) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_MASTER=master,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_KERNEL_URLS=env.get("SPARK_GRAFT_KERNEL_URLS", "16000000"),
        SPARK_GRAFT_KERNEL_PASSES=env.get("SPARK_GRAFT_KERNEL_PASSES", "3"),
        SPARK_GRAFT_FRONTIER_PASSES=env.get("SPARK_GRAFT_FRONTIER_PASSES", "2"),
    )
    if master.startswith("local-cluster"):
        env.setdefault("SPARK_GRAFT_EXECUTOR_MEM", "6g")
        env.setdefault("SPARK_GRAFT_OFFHEAP_SIZE", "4g")
        env.setdefault("SPARK_DRIVER_MEM", "8g")
    load = wait_quiet(
        float(os.environ.get("SPARK_GRAFT_QUIET_LOAD", "2.5")),
        float(os.environ.get("SPARK_GRAFT_QUIET_TIMEOUT", "600")),
    )
    flag = "--frontier-only" if mode == "frontier" else "--kernel-only"
    try:
        out = _sh([sys.executable, "bench.py", flag], env=env, cwd=repo,
                  timeout=2400)
    except subprocess.TimeoutExpired:
        # record an error leg instead of aborting the whole interleaved
        # run — losing the remaining legs loses the A/B (ADVICE r6 low)
        return {"error": "bench leg timed out (2400s)", "loadavg_at_gate": load}
    try:
        line = [l for l in out.stdout.strip().splitlines()
                if l.startswith("{")][-1]
        parsed = json.loads(line)
        rec = parsed["frontier" if mode == "frontier" else "kernel"]
        rec["control"] = parsed.get("control")
    except Exception:
        rec = {"error": (out.stderr or out.stdout)[-800:]}
    rec["loadavg_at_gate"] = load
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline_ref")
    ap.add_argument("--mode", choices=("kernel", "frontier"),
                    default="kernel")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--master", default="local-cluster[4,4,7168]")
    ap.add_argument("--cpus", type=int, default=16)
    a = ap.parse_args()
    base = ensure_baseline_clone(a.baseline_ref)
    legs = {"baseline": [], "candidate": []}
    for _ in range(a.trials):
        for name, repo in (("baseline", base), ("candidate", REPO)):
            rec = run_leg(repo, a.mode, a.master, a.cpus)
            rec["build"] = name
            legs[name].append(rec)
            print(json.dumps(rec), flush=True)
    summary: dict = {
        "mode": a.mode, "master": a.master,
        "baseline_ref": a.baseline_ref, "trials": a.trials, "legs": legs,
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    ok = {n: [r for r in rs if "error" not in r] for n, rs in legs.items()}
    if ok["baseline"] and ok["candidate"]:
        best = {n: min(r["elapsed_sec"] for r in rs) for n, rs in ok.items()}
        summary["best_elapsed"] = best
        # >1.0 = candidate faster
        summary["speedup_vs_baseline"] = round(
            best["baseline"] / best["candidate"], 3
        )
    print(json.dumps({k: v for k, v in summary.items() if k != "legs"}))
    out_path = os.path.join(REPO, "BENCH", f"ab_build_{a.mode}.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
