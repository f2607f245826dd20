"""Merge trials from multiple bench_scaling runs into one best-of summary.

The box is co-tenanted and contention is bursty WITHIN trials, so single
ladder runs under-sample the quiet windows; merging every gated trial of
the same engine build and taking best-of per configuration is the fairest
steady-state estimate (each config gets the same number of chances — the
ladder interleaves configs within each run).

Usage: python tools/merge_scaling.py out.json run1.json [run2.json ...]
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    out_path, *ins = sys.argv[1:]
    trials: dict[str, list[dict]] = {}
    n_urls = None
    n = None
    for p in ins:
        with open(p) as f:
            d = json.load(f)
        n_urls = d["n_urls"]
        n = d["N"]
        for cpus, recs in d["trials"].items():
            trials.setdefault(cpus, []).extend(recs)
    cN, c4N = str(n), str(4 * n)
    best = {c: min(rs, key=lambda r: r["elapsed_sec"]) for c, rs in trials.items()}
    thr_n = best[cN]["urls_per_sec"]
    thr_4n = best[c4N]["urls_per_sec"]
    eff = (thr_4n / thr_n) / 4
    ctrl_best = {
        c: min((r["control"] for r in rs if r.get("control")),
               key=lambda x: x["elapsed_sec"], default=None)
        for c, rs in trials.items()
    }
    ctrl_eff = None
    eff_normalized = None
    if ctrl_best[cN] and ctrl_best[c4N]:
        ctrl_eff = (ctrl_best[c4N]["rows_per_sec"] / ctrl_best[cN]["rows_per_sec"]) / 4
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
        "trials": trials,
        "merged_from_runs": len(ins),
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "trials"}))
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
