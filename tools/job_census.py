#!/usr/bin/env python
"""One-rep sweep recording per-query wall time + Spark job/stage/task
counts (guide §1: find queries whose cost is scheduling overhead —
many tiny jobs — rather than compute). Writes /tmp/job_census.json.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from boat_etl_pyspark_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("job-census")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    names = sys.argv[1:] or sorted(queries)

    queries["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    spark.range(32).mapInPandas(lambda it: it, "id long").write.format(
        "noop").mode("overwrite").save()

    jsc = spark.sparkContext._jsc.sc()
    out = {}
    for name in names:
        nj0 = jsc.dagScheduler().nextJobId().get() if hasattr(jsc.dagScheduler().nextJobId(), "get") else jsc.dagScheduler().nextJobId()
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        nj1 = jsc.dagScheduler().nextJobId().get() if hasattr(jsc.dagScheduler().nextJobId(), "get") else jsc.dagScheduler().nextJobId()
        out[name] = {
            "build": round(t1 - t0, 3),
            "exec": round(t2 - t1, 3),
            "total": round(t2 - t0, 3),
            "jobs": nj1 - nj0,
        }
        with open("/tmp/job_census.json", "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    with open("/tmp/job_census.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    top = sorted(out.items(), key=lambda kv: -kv[1]["jobs"])[:30]
    for k, v in top:
        print(f"jobs={v['jobs']:3d} total={v['total']:7.3f} build={v['build']:7.3f} {k}")
    spark.stop()


if __name__ == "__main__":
    main()
