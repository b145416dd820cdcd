#!/usr/bin/env python
"""Merge a fresh ``bench_full.json`` into ``bench_baseline.json``.

The baseline holds the per-query BEST timing seen so far, normalized
to the baseline's own CPU fingerprint (``fp_ref``). Host drift makes
that normalization the hard part: the pure-python fingerprint can
badly overestimate how much slower the JVM actually runs (measured
round 6: python-fp said 1.45x, the 327-query aggregate said 1.07x).
Banking with an overestimated slowdown writes baselines ~30% below
what any honest host can reproduce — phantom regressions forever
after.

So the banking scale is the CONSERVATIVE (larger) of two estimates:

- fp scale  = fp_ref / fp_measured (the python probe), and
- agg scale = sum(banked prior) / sum(measured), over the queries
  both sides know (the JVM-implied host factor; a single query's
  genuine regression barely moves a 327-query aggregate).

``normalized = measured * scale`` with the larger scale can only
over-state a fresh timing, so a banked best is never an artifact of
fingerprint error. The merge itself is elementwise min + add-new,
never raising a banked best.

Usage: ``python tools/bank_bench.py`` after a bench run.
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    with open(os.path.join(REPO, "bench_full.json")) as f:
        full = json.load(f)
    path = os.path.join(REPO, "bench_baseline.json")
    with open(path) as f:
        base = json.load(f)

    if full.get("sf") != base.get("sf"):
        raise SystemExit(
            f"scale mismatch: bench_full sf={full.get('sf')} vs baseline sf={base.get('sf')}"
        )
    fp = full["cpu_fingerprint_sec"]
    fp_measured = (fp["start"] + fp["end"]) / 2
    fp_scale = base["fp_ref"] / fp_measured

    common = [n for n in full["queries"] if n in base["queries"]]
    agg_scale = fp_scale
    if common:
        agg_scale = sum(base["queries"][n] for n in common) / sum(
            full["queries"][n] for n in common
        )
    scale = max(fp_scale, agg_scale)

    # Establish the multi-core fingerprint reference (round-7 verdict
    # item 4) the first time a bench run carries the probe: project the
    # measured mc fingerprint into fp_ref space with the same scale the
    # timings use (on the quiet host this banking demands, single-core
    # and multi-core drift together, so the projection is faithful).
    # Once set it is pinned to the fp_ref era and never overwritten.
    # Round-8 ADVICE: when fp and agg scales already DISAGREE at
    # banking time the host is not quiet, the max() projection inflates
    # fp_mc_ref, and every future mc disagreement alarm is biased — so
    # refuse to pin the mc reference from such a run.
    disagreement = max(fp_scale, agg_scale) / min(fp_scale, agg_scale)
    if "fp_mc_ref" not in base and "cpu_fingerprint_mc_sec" in full:
        if disagreement >= 1.15:
            print(
                f"NOT banking fp_mc_ref: fp/agg scale disagreement "
                f"{disagreement:.2f} >= 1.15 — rerun on a quiet host"
            )
        else:
            mc = full["cpu_fingerprint_mc_sec"]
            base["fp_mc_ref"] = round(
                ((mc["start"] + mc["end"]) / 2) * scale, 4
            )

    improved, added = 0, 0
    for name, sec in full["queries"].items():
        norm = round(sec * scale, 3)
        prior = base["queries"].get(name)
        if prior is None:
            base["queries"][name] = norm
            added += 1
        elif norm < prior:
            base["queries"][name] = norm
            improved += 1

    with open(path, "w") as f:
        json.dump(base, f, indent=1, sort_keys=True)
    print(
        f"banked: {improved} improved, {added} new, "
        f"{len(base['queries'])} total "
        f"(fp scale {fp_scale:.3f}, agg scale {agg_scale:.3f}, used {scale:.3f})"
    )


if __name__ == "__main__":
    main()
