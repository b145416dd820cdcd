"""Round-7 verdict item 4: the bench's host-drift instrumentation.

The single-thread CPU probe is a poor instrument for a multi-core
sandbox whose per-core throughput moves independently under neighbor
load — round 7's uniform ~1.35x fleet-wide slowdown sat invisible
between a calm single-thread probe and the aggregate scale, and the
1.22x disagreement sailed under the old 1.25 alarm. These tests pin
the fixes: a multi-core probe exists and measures something real, the
alarm threshold is 1.15, and a synthetic round-7-sized event FIRES it.
"""

from __future__ import annotations

import importlib.util
import os

_BENCH = os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")


def _bench_mod():
    spec = importlib.util.spec_from_file_location("bench", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_alarm_fires_on_round7_sized_disagreement():
    bench = _bench_mod()
    # round 7's actual event: fp said 1.039, agg said 0.848 -> 1.22x
    ratio, fired = bench.host_scale_disagreement(1.039, 0.848)
    assert fired, "the 1.22x round-7 event must now trip the alarm"
    assert ratio == 1.23  # 1.039 / 0.848, reported even when quiet
    # a quiet host does not fire but still reports the ratio
    ratio, fired = bench.host_scale_disagreement(1.02, 0.97)
    assert not fired
    assert ratio is not None
    # symmetric: agg >> fp fires too (uniform speedup mis-banked)
    _, fired = bench.host_scale_disagreement(0.80, 1.00)
    assert fired
    # missing estimates (no baseline / no fp_mc_ref) stay silent
    assert bench.host_scale_disagreement(None, 1.0) == (None, False)
    assert bench.host_scale_disagreement(1.0, None) == (None, False)


def test_alarm_threshold_is_at_most_1_15():
    bench = _bench_mod()
    # exactly at the boundary: 1.16x disagreement must fire
    _, fired = bench.host_scale_disagreement(1.16, 1.0)
    assert fired


def test_multicore_probe_measures_parallel_throughput():
    bench = _bench_mod()
    # the very first fork storm on a cold container pays one-time
    # page-fault/CoW costs (measured 2.55s vs the 2.14s bound on a
    # fresh sandbox); warm the fork path before judging concurrency
    bench._cpu_fingerprint_mc()
    st = bench._cpu_fingerprint()
    mc = bench._cpu_fingerprint_mc()
    assert st > 0 and mc > 0
    # all workers run CONCURRENTLY: wall time must be far below the
    # serial sum (cpu_count x single-thread), or the probe is not
    # actually exercising the cores the Spark queries use
    n = os.cpu_count() or 1
    if n >= 4:
        for _ in range(2):  # one retry: a neighbor burst is not a probe bug
            mc = bench._cpu_fingerprint_mc()
            if mc < st * n * 0.5:
                break
        assert mc < st * n * 0.5, (mc, st, n)
