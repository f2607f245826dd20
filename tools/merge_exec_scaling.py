"""Merge trials from multiple exec_scaling runs into one best-of summary.

Same rationale as tools/merge_scaling.py (the box is co-tenanted and
contention is bursty WITHIN trials, so single ladder runs under-sample
the quiet windows; merging every gated trial of the same engine build
and taking best-of per configuration is the fairest steady-state
estimate), adapted to the exec_scaling.py artifact format: trials keyed
by EXECUTOR count instead of thread count, plus the overdetermined
T = F + W/cores fixed-cost fit recomputed over the merged bests.

Usage: python tools/merge_exec_scaling.py out.json run1.json [run2.json ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from exec_scaling import fit_fixed_cost  # noqa: E402


def main() -> None:
    out_path, *ins = sys.argv[1:]
    trials: dict[int, list[dict]] = {}
    meta: dict = {}
    per_run = []
    for p in ins:
        with open(p) as f:
            d = json.load(f)
        meta = {k: d[k] for k in ("mode", "n_urls", "cores_per_executor")}
        per_run.append({
            "run": p,
            "scaling_efficiency": d.get("scaling_efficiency"),
            "control": d.get("control_scaling_efficiency"),
        })
        for n, recs in d["trials"].items():
            trials.setdefault(int(n), []).extend(
                r for r in recs if "error" not in r
            )
    configs = sorted(trials)
    lo, hi = configs[0], configs[-1]
    cores_per = meta["cores_per_executor"]
    best = {n: min(rs, key=lambda r: r["elapsed_sec"]) for n, rs in trials.items()}
    thr = {n: best[n]["urls_per_sec"] for n in configs}
    eff = (thr[hi] / thr[lo]) / (hi / lo)
    ctrl_best = {
        n: min((r["control"] for r in rs if r.get("control")),
               key=lambda x: x["elapsed_sec"], default=None)
        for n, rs in trials.items()
    }
    ctrl_eff = None
    eff_normalized = None
    if ctrl_best[lo] and ctrl_best[hi]:
        ctrl_eff = (ctrl_best[hi]["rows_per_sec"]
                    / ctrl_best[lo]["rows_per_sec"]) / (hi / lo)
        if ctrl_eff > 0:
            eff_normalized = round(min(eff / ctrl_eff, 1.0), 3)
    summary = {
        **meta,
        "executors_N": lo,
        "executors_4N": hi,
        "executor_shape": f"{cores_per} cores, 6g heap, 4g off-heap "
                          "(constant across configs; only the executor "
                          "COUNT scales)",
        "merged_runs": len(ins),
        "trials_per_config": {str(n): len(trials[n]) for n in configs},
        "throughput_by_executors": {str(n): thr[n] for n in configs},
        "best_elapsed_by_executors": {
            str(n): best[n]["elapsed_sec"] for n in configs
        },
        "pairwise_efficiency": {
            f"{a}->{b}": round((thr[b] / thr[a]) / (b / a), 3)
            for a, b in zip(configs, configs[1:])
        },
        "throughput_N": thr[lo],
        "throughput_4N": thr[hi],
        "speedup": round(thr[hi] / thr[lo], 2),
        "scaling_efficiency": round(eff, 3),
        "control_scaling_efficiency": round(ctrl_eff, 3) if ctrl_eff else None,
        "scaling_efficiency_vs_control": eff_normalized,
        "fixed_cost_fit": fit_fixed_cost(
            [(n * cores_per, best[n]["elapsed_sec"]) for n in configs]
        ),
        "per_run_summaries": per_run,
        "trials": {str(n): trials[n] for n in configs},
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "trials"}))
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
