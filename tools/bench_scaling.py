"""N-vs-4N scaling-efficiency evidence (BASELINE.json north rule).

The sandbox has no multi-executor cluster, so per the driver note the same
job runs at two parallelism levels (local[N] and local[4N]) on the same
input; throughput at both + scaling efficiency land in BENCH/BASELINE.md.

The measured job is the frontier kernel (bench.py run_kernel): one pass of
the per-round machinery (canonicalize -> SURT -> xxhash64 -> broadcast-bloom
+ exact seen anti-join -> salted politeness top-k) over SPARK_GRAFT_KERNEL_URLS
synthesized URLs. Each configuration is a fresh JVM (subprocess).

Usage: python tools/bench_scaling.py [N] [trials]   (default N=4, trials=2)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def wait_quiet(threshold: float, timeout_sec: float) -> None:
    """Block until 1-min loadavg drops below threshold (co-tenant gate).

    The box is shared; trials started under a co-tenant spike measure the
    neighbour, not the engine. Give up after timeout so the ladder always
    completes (the load is logged per-trial either way).
    """
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout_sec:
        with open("/proc/loadavg") as f:
            if float(f.read().split()[0]) < threshold:
                return
        time.sleep(20)


def run_once(cpus: int, n_urls: int) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_KERNEL_URLS=str(n_urls),
        SPARK_DRIVER_MEM="48g",
        # best-of-3 timed passes per JVM: steady-state (C2-JIT-warm) rate
        # with the co-tenant's bursts factored out; per-pass times logged
        SPARK_GRAFT_KERNEL_PASSES=os.environ.get("SPARK_GRAFT_KERNEL_PASSES", "3"),
    )
    wait_quiet(
        float(os.environ.get("SPARK_GRAFT_QUIET_LOAD", "2.5")),
        float(os.environ.get("SPARK_GRAFT_QUIET_TIMEOUT", "900")),
    )
    with open("/proc/loadavg") as f:
        load_before = f.read().split()[0]
    out = subprocess.run(
        [sys.executable, "bench.py", "--kernel-only"],
        capture_output=True, text=True, env=env, timeout=1800,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    line = out.stdout.strip().splitlines()[-1]
    parsed = json.loads(line)
    rec = parsed["kernel"]
    rec["control"] = parsed.get("control")
    rec["cpus"] = cpus
    rec["loadavg_before"] = load_before
    return rec


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_urls = int(os.environ.get("SPARK_GRAFT_KERNEL_URLS", "16000000"))
    results = {n: [], 4 * n: []}
    # interleave trials so background-load drift hits both configs equally
    for _ in range(trials):
        for cpus in (4 * n, n):
            rec = run_once(cpus, n_urls)
            results[cpus].append(rec)
            print(json.dumps(rec), flush=True)
    best = {c: min(rs, key=lambda r: r["elapsed_sec"]) for c, rs in results.items()}
    thr_n = best[n]["urls_per_sec"]
    thr_4n = best[4 * n]["urls_per_sec"]
    eff = (thr_4n / thr_n) / 4
    # control-normalized efficiency: the chained-xxhash64 control (no
    # strings, embarrassingly parallel) measures what scaling the BOX
    # delivers N->4N under current co-tenant load; kernel efficiency
    # divided by control efficiency is the engine's own share.
    ctrl_best = {
        c: min((r["control"] for r in rs if r.get("control")),
               key=lambda x: x["elapsed_sec"], default=None)
        for c, rs in results.items()
    }
    ctrl_eff = None
    eff_normalized = None
    if ctrl_best[n] and ctrl_best[4 * n]:
        ctrl_eff = (ctrl_best[4 * n]["rows_per_sec"] / ctrl_best[n]["rows_per_sec"]) / 4
        if ctrl_eff > 0:
            eff_normalized = round(min(eff / ctrl_eff, 1.0), 3)
    summary = {
        "n_urls": n_urls,
        "N": n,
        "throughput_N": thr_n,
        "throughput_4N": thr_4n,
        "speedup": round(thr_4n / thr_n, 2),
        "scaling_efficiency": round(eff, 3),
        "control_scaling_efficiency": round(ctrl_eff, 3) if ctrl_eff else None,
        "scaling_efficiency_vs_control": eff_normalized,
        "trials": results,
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "trials"}))
    with open("BENCH/scaling.json", "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
