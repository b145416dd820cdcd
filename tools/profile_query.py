#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1).

For each named query: time the plan CONSTRUCTION (python/py4j +
analysis) separately from EXECUTION (noop sink), min-of-N, and
optionally dump ``explain('formatted')`` to plans/<round>/<name>_<tag>.txt
(--plan-dir, default r11).

Usage::

    python tools/profile_query.py q21_sole_delaying_supplier [more...] \
        [--reps 5] [--explain-tag before] [--sf-dir /root/testdata/sf0.1]

Separating build from execution tells us whether a slow query is
driver-bound (plan size, py4j chatter — guide §7.3) or executor-bound
(shuffles, python boundary — guide §2/§4).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--explain-tag", default=None)
    ap.add_argument("--plan-dir", default="r11")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from boat_etl_pyspark_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # warm-up: JVM + codegen + python worker pool (same as bench.py)
    queries["q1_pricing_summary"](spark, args.sf_dir).write.format(
        "noop").mode("overwrite").save()
    spark.range(32).mapInPandas(lambda it: it, "id long").write.format(
        "noop").mode("overwrite").save()

    out = {}
    for name in args.names:
        fn = queries[name]
        build_ts, exec_ts, total_ts = [], [], []
        df = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"profile:{name}")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            spark.sparkContext.setJobDescription(None)
            build_ts.append(t1 - t0)
            exec_ts.append(t2 - t1)
            total_ts.append(t2 - t0)
        out[name] = {
            "build_min": round(min(build_ts), 3),
            "exec_min": round(min(exec_ts), 3),
            "total_min": round(min(total_ts), 3),
            "total_all": [round(t, 3) for t in total_ts],
        }
        if args.explain_tag and df is not None:
            pdir = os.path.join(repo, "plans", args.plan_dir)
            os.makedirs(pdir, exist_ok=True)
            path = os.path.join(pdir, f"{name}_{args.explain_tag}.txt")
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(path, "w") as f:
                f.write(plan)
        print(name, json.dumps(out[name]))
    print("TOTALS", json.dumps({n: v["total_min"] for n, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
