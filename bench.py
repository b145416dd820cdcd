#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs every contract query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "total_sec_all_queries", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Execution is forced with the noop sink (full computation, no driver
collect) except for streaming queries, whose memory-sink table is
counted. A warm-up query absorbs JVM/codegen startup so per-query
numbers measure the plans, not the JIT.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


# stream_stream_left_outer replays 3 files through availableNow so the
# watermark genuinely advances across micro-batches; the replay harness
# itself costs ~3.9s of the query's ~4.3s (dropping to 2 files saved
# only 0.35s — measured round 4, SCALE.md "bench-regression
# attribution"). Recorded into bench_full.json so a future slowdown on
# that query can be split into harness floor vs plan regression.
_SSLO_REPLAY_FLOOR_SEC = 3.9


def _cpu_fingerprint() -> float:
    """Single-thread CPU speed probe (seconds for a fixed pure-python
    loop). Recorded into bench_full.json so cross-round comparisons
    can tell host drift from code regressions: round 3's 91s->103s
    'regression' reproduced byte-identically on round-2 code — the
    host, not the repo, had slowed."""
    t0 = time.perf_counter()
    s = 0
    for i in range(2_000_000):
        s += i * i
    return round(time.perf_counter() - t0, 4)


def _fingerprint_worker(_arg: int) -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(2_000_000):
        s += i * i
    return time.perf_counter() - t0


def _cpu_fingerprint_mc() -> float:
    """Multi-core CPU speed probe: wall seconds for os.cpu_count()
    processes to each run the fixed pure-python loop concurrently.
    Round-7 verdict item 4: the single-thread probe is the wrong
    instrument for a multi-core sandbox whose per-core throughput
    moves independently under neighbor load — round 7's uniform
    ~1.35x fleet-wide slowdown sat invisible between a calm
    single-thread probe and the agg scale. Under contention this
    probe degrades the way the 32-thread Spark queries actually do."""
    import multiprocessing as mp

    n = os.cpu_count() or 1
    ctx = mp.get_context("fork")  # no pickling: children inherit memory
    procs = [
        ctx.Process(target=_fingerprint_worker, args=(i,)) for i in range(n)
    ]
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    return round(time.perf_counter() - t0, 4)


def host_scale_disagreement(
    fp_scale: float | None, agg_scale: float | None, threshold: float = 1.15
) -> tuple[float | None, bool]:
    """(fp_scale/agg_scale ratio, alarm_fired). The two host-scale
    estimates should agree on a quiet host; min(fp, agg) scaling
    absorbs a FLEET-WIDE slowdown into the aggregate denominator
    (round-6 ADVICE), so when they diverge past ``threshold`` the
    round's bench needs a manual look. Round 7's 1.22x event sailed
    under the old 1.25 alarm — hence 1.15, and the ratio is now
    always printed, not only when the alarm fires."""
    if not fp_scale or not agg_scale:
        return None, False
    ratio = round(fp_scale / agg_scale, 2)
    fired = max(fp_scale, agg_scale) / min(fp_scale, agg_scale) > threshold
    return ratio, fired


def _rss_mb() -> dict:
    """Driver-python and JVM resident-set sizes in MB (local mode: the
    executor lives inside the driver JVM, so this is the whole app)."""
    out = {}
    try:
        import resource

        out["python_max_mb"] = round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
        )
    except Exception:
        pass
    try:
        jvm = 0
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/comm") as f:
                    if f.read().strip() != "java":
                        continue
                with open(f"/proc/{pid}/status") as f:
                    for line in f:
                        if line.startswith("VmRSS:"):
                            jvm += int(line.split()[1])
                            break
            except OSError:
                continue
        if jvm:
            out["jvm_rss_mb"] = round(jvm / 1024, 1)
    except Exception:
        pass
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(sf_match.group(1)) if sf_match else None

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from boat_etl_pyspark_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("boat-etl-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # warm-up: JVM, parquet footers, codegen
    queries["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # warm-up: Python worker pool (Arrow path) — otherwise the first
    # mapInPandas query's number includes one-time worker spawn
    import pandas as _pd  # noqa: F401

    spark.range(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    # min-of-N per query: the host is noisy (same code measured +/-50%
    # across runs round 1), so the minimum is the signal. Spread is
    # reported so regressions are attributable to code vs host noise.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    fp_start = _cpu_fingerprint()
    fp_mc_start = _cpu_fingerprint_mc()
    runs: dict[str, list[float]] = {name: [] for name in queries}
    rss_per_rep = []
    for _ in range(reps):
        for name in sorted(queries):
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs[name].append(time.perf_counter() - t0)
        rss_per_rep.append(_rss_mb())
    fp_end = _cpu_fingerprint()
    fp_mc_end = _cpu_fingerprint_mc()

    # hand back executor storage memory pinned by the dedup-family
    # shared caches and per-query persisted intermediates
    from boat_etl_pyspark_spark.plans import release_caches

    released = release_caches(spark)

    timings = {name: round(min(ts), 3) for name, ts in sorted(runs.items())}
    spread = {name: round(max(ts) - min(ts), 3) for name, ts in sorted(runs.items())}
    total = round(sum(timings.values()), 3)

    # Host-drift normalization + per-query comparison vs the best prior
    # round (bench_baseline.json, checked in; fp_ref is the CPU
    # fingerprint measured alongside those timings). normalized_sec =
    # measured * fp_ref / fp_measured: a slower host (bigger
    # fingerprint) scales timings DOWN, so cross-round ratios compare
    # code, not hosts. Ratios > 2.0 are flagged as regressions.
    fp_measured = round((fp_start + fp_end) / 2, 4)
    fp_mc_measured = round((fp_mc_start + fp_mc_end) / 2, 4)
    normalized_value = None
    vs_best_prior: dict[str, float] = {}
    vs_best_prior_fp: dict[str, float] = {}
    regressions: dict[str, float] = {}
    scale_disagree = mc_disagree = None
    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json"
    )
    baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
    # per-query ratios only make sense at the baseline's scale factor —
    # at a smaller sf, fixed per-query overhead dominates and every
    # ratio reads as a phantom regression
    fp_scale = agg_scale = fp_mc_scale = None
    scale_alarm = False
    if baseline is not None and baseline.get("sf") == sf:
        fp_scale = baseline["fp_ref"] / fp_measured
        if baseline.get("fp_mc_ref"):
            fp_mc_scale = baseline["fp_mc_ref"] / fp_mc_measured
        # The python fingerprint is a rough JVM proxy (round 6: it said
        # the host was 1.45x slower while the 327-query aggregate said
        # 1.07x). For REGRESSION FLAGGING use the smaller of the two
        # host-scale estimates, so a fingerprint error can only shrink
        # ratios, never mint a phantom flag; a real per-query regression
        # barely moves the aggregate, so it still stands out. (The
        # banking direction is the opposite — tools/bank_bench.py uses
        # the LARGER scale so a banked best is never fingerprint
        # flattery.)
        common = [n for n in timings if n in baseline["queries"]]
        agg_scale = fp_scale
        if common:
            agg_scale = sum(baseline["queries"][n] for n in common) / max(
                sum(timings[n] for n in common), 1e-9
            )
        scale = min(fp_scale, agg_scale)
        normalized_value = round(total * scale, 3)
        for name, sec in timings.items():
            prior = baseline["queries"].get(name)
            if prior:
                vs_best_prior[name] = round(sec * scale / prior, 2)
                vs_best_prior_fp[name] = round(sec * fp_scale / prior, 2)
        regressions = {n: r for n, r in vs_best_prior.items() if r > 2.0}
        # min(fp, agg) scaling absorbs a FLEET-WIDE slowdown into the
        # aggregate denominator (round-6 ADVICE): a uniform 3x code
        # regression inflates agg_scale and every ratio still reads
        # ~1.0. Surface that blind spot (round-7 verdict item 4): the
        # disagreement is ALWAYS printed now, the alarm threshold is
        # 1.15 (round 7's 1.22 event sailed under the old 1.25), and
        # the multi-core probe — which degrades under neighbor load
        # the way the 32-thread queries actually do — gets its own
        # scale + alarm when the baseline has banked fp_mc_ref. The
        # raw fp-scaled ratios stay in bench_full.json where a broad
        # slowdown remains visible.
        scale_disagree, fired = host_scale_disagreement(fp_scale, agg_scale)
        mc_disagree, mc_fired = host_scale_disagreement(
            fp_mc_scale, agg_scale
        )
        scale_alarm = fired or mc_fired

    # Full detail goes to a FILE (the driver's stdout capture keeps only
    # the last 2000 characters — verified in BENCH_r01/r02, where the
    # ~4.5 KB all-queries JSON line was truncated and "parsed" came back
    # null both rounds). The printed line must fit the tail window.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_full.json"
    )
    with open(detail_path, "w") as f:
        json.dump(
            {
                "queries": timings,
                "query_spread": spread,
                "reps_detail": {
                    name: [round(t, 3) for t in ts]
                    for name, ts in sorted(runs.items())
                },
                "rss_per_rep_mb": rss_per_rep,
                "cpu_fingerprint_sec": {"start": fp_start, "end": fp_end},
                "cpu_fingerprint_mc_sec": {
                    "start": fp_mc_start,
                    "end": fp_mc_end,
                },
                "normalized_value": normalized_value,
                "host_scale_fp": fp_scale,
                "host_scale_fp_mc": fp_mc_scale,
                "host_scale_agg": agg_scale,
                "host_scale_disagreement": scale_disagree,
                "host_scale_mc_disagreement": mc_disagree,
                "host_scale_alarm": scale_alarm,
                "vs_best_prior": vs_best_prior,
                "vs_best_prior_fp_scaled": vs_best_prior_fp,
                "regressions_gt_2x": regressions,
                "stream_stream_left_outer_replay_floor_sec": _SSLO_REPLAY_FLOOR_SEC,
                "caches_released": released,
                "reps": reps,
                "unit": "sec",
                "sf": sf,
                "metric": "total_sec_all_queries",
                "value": total,
            },
            f,
            indent=1,
            sort_keys=True,
        )

    # ONE short JSON line (≤ ~1900 chars): headline total plus as many
    # per-query timings as fit, most expensive first — those are the
    # ones a regression check needs. The rest live in bench_full.json.
    line_queries: dict[str, float] = {}
    base = {
        "metric": "total_sec_all_queries",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "reps": reps,
        "n_queries": len(timings),
        "cpu_fp_sec": fp_measured,
        "cpu_fp_mc_sec": fp_mc_measured,
        "normalized_value": normalized_value,
        "n_regressed_gt_2x": len(regressions),
        "scale_disagree": scale_disagree,
        "scale_disagree_mc": mc_disagree,
        "scale_alarm": scale_alarm,
        # worst normalized ratios vs the best prior round, capped so the
        # headline per-query timings still fit the driver's tail window
        "vs_best_prior": dict(
            sorted(vs_best_prior.items(), key=lambda kv: -kv[1])[:8]
        ),
        "detail": "bench_full.json",
    }
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
        trial = dict(base, queries=dict(line_queries, **{name: sec}))
        if len(json.dumps(trial)) > 1900:
            break
        line_queries[name] = sec
    print(json.dumps(dict(base, queries=line_queries)))
    spark.stop()


if __name__ == "__main__":
    main()
