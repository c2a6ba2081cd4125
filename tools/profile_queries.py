"""Per-query profiler for the optimization rounds.

Times individual declared queries through the noop sink (bench
methodology: best-of-N, min + spread), labels each run in the UI via
setJobDescription, and optionally dumps `.explain("formatted")` to
plans/<tag>/<query>_<suffix>.txt.

Usage:
  python tools/profile_queries.py [--n 3] [--plans r11 --suffix before]
                                  [--sf-dir DIR] query [query ...]
  python tools/profile_queries.py --all       # every QUERY_ORDER entry

Prints one line per query: min seconds, spread, and job count.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from amaxa_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--plans", default=None,
                    help="plans/<tag> subdir to write explain() output into")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--plan-only", action="store_true",
                    help="write plans without timing the queries")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    names = list(entrymod.QUERY_ORDER) if args.all else args.queries
    spark = get_spark("amaxa_spark_profile")
    sc = spark.sparkContext
    for t in ("customer", "orders", "lineitem", "documents", "events"):
        spark.read.parquet(f"{args.sf_dir}/{t}.parquet").count()

    qs = entrymod.queries()
    out = {}
    for name in names:
        fn = qs[name]
        if args.plans:
            plan_dir = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "plans", args.plans)
            os.makedirs(plan_dir, exist_ok=True)
            df = fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            with open(os.path.join(plan_dir,
                                   f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        if args.plan_only:
            print(f"plan written: {name}", flush=True)
            continue
        samples = []
        jobs0 = sc._jsc.sc().dagScheduler().nextJobId()
        for i in range(args.n):
            sc.setJobDescription(f"profile:{name}#{i}")
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite").save()
            samples.append(time.time() - t0)
            sc.setJobDescription(None)
        jobs1 = sc._jsc.sc().dagScheduler().nextJobId()
        mn = min(samples)
        out[name] = {
            "min": round(mn, 3),
            "spread": round(max(samples) - mn, 3),
            "jobs_per_run": round((jobs1 - jobs0) / args.n, 1),
        }
        print(f"{mn:8.3f}s  spread={max(samples)-mn:6.3f}  "
              f"jobs/run={(jobs1-jobs0)/args.n:5.1f}  {name}", flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
