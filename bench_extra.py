"""Per-query isolation bench (guide §1.4): times selected registry queries
with the SAME methodology as the frozen bench.py (build DataFrame + count),
optionally through the noop sink instead (isolates compute from the count
short-circuit), and optionally dumps .explain("formatted") per query.

bench.py is FROZEN for measurement; this file exists so optimization rounds
can isolate and re-measure single queries without touching it.

Usage:
  python bench_extra.py --sf /root/testdata/sf0.1 \
      --queries embedding_neardup_pairs,ngram_jaccard_pairs \
      [--noop] [--passes 2] [--plan-dir plans/r08] [--plan-suffix _before]

Prints one JSON line: {"sf": ..., "queries": {name: [sec, ...]}, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", required=True)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--passes", type=int, default=1)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--plan-suffix", default="")
    args = ap.parse_args()

    from warchaeology_spark.queries import bench_queries, queries
    from warchaeology_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-extra", master=f"local[{cpus}]", shuffle_partitions=cpus)
    qs = {**queries(), **bench_queries()}
    names = [n for n in args.queries.split(",") if n]
    out: dict = {"sf": args.sf, "cpus": cpus, "noop": args.noop, "queries": {}}
    with open("/proc/loadavg") as f:
        out["loadavg_before"] = float(f.read().split()[0])
    for name in names:
        fn = qs[name]
        times = []
        for _ in range(max(args.passes, 1)):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            df = fn(spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            times.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out["queries"][name] = times
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plan_dir, f"{name}{args.plan_suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
