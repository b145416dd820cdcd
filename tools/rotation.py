#!/usr/bin/env python
"""Mechanized driver-gate rotation.

The driver's correctness gate checks the FIRST 50 ``queries()`` entries
per round, so ``__spark_entry__._CHECK_FIRST`` decides which queries
get a fresh ``CORRECTNESS_r{N}.json`` row. Round 5 maintained that list
as an ~80-line hand-written prose comment naming 105 queries — one typo
would silently mis-rotate a round. This tool replaces the prose: it
computes the 50-name window from the actual ``CORRECTNESS_r*.json``
history, and ``tests/test_contract_hygiene.py`` pins ``_CHECK_FIRST``
to its output so the two can never drift.

Policy (round-5 verdict, "Next round: do this" items 1 and 6):

1. NEVER-CHECKED queries (no green driver row in any round) outrank
   every stale green. Among them, the verdict's named highest-stakes
   queries come first (``PRIORITY``); the rest follow in registry
   order.
2. Queries whose plan or oracle CHANGED after their latest green row
   (``CHANGED_SINCE_GREEN``, hand-updated when editing a green query)
   come next, in registry order — their old green no longer certifies
   the shipped code.
3. Remaining slots go to stale greens, oldest round first (ties in
   registry order).

Green = ``err`` null, ``rows_match`` and ``schema_match`` true, and
``hash_match`` not false (rows-only streaming checks keep their weaker
row). A red row does NOT count as checked — the query stays at the
front until a green row lands.

Usage: ``python tools/rotation.py`` prints the 50 names, one per line;
``--python`` prints them as a tuple literal ready to paste into
``__spark_entry__.py``.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Driver gate width: CORRECTNESS_r{N}.json rows per round.
WINDOW = 50

#: Queries whose plan or oracle text changed AFTER their latest green
#: driver row — hand-append when editing a green query (the pinned
#: hygiene test keeps _CHECK_FIRST synced to the resulting order).
#: Round 6 edits: the rollup/cube/grouping-sets empty-input HAVING
#: guards, the time-to-convert / fisher / fingerprints oracle
#: coalesces, the incremental-dedup source guard, the three
#: filesystem-fact boolean redefinitions, the Spearman grid knob, the
#: checksum mod-after-sum, and the documents rules added to the data
#: contract. Entries that are ALSO never-checked are harmless (the
#: never-checked rank dominates).
CHANGED_SINCE_GREEN = (
    "agg_rollup_nation_segment",
    "agg_cube_flag_status",
    "agg_grouping_sets",
    "agg_spearman_rho",
    "dedup_incremental",
    "text_fingerprints",
    "events_time_to_convert",
    "io_binary_manifest",
    "io_small_file_compaction",
    "validate_data_contract",
    "agg_fisher_exact",
    "graph_community_modularity",
    "validate_table_checksum",
    "io_codec_tradeoff",
    "ml_pinball_quantile_eval",
    "text_token_stats",
    "text_quality_score",
    "text_language_id",
)

#: Hand-pinned head for NEVER-CHECKED queries only (round-5 verdict's
#: highest-stakes list, in its order). Never-checked names absent from
#: this tuple follow in registry order; once a query has a green row
#: the tuple has no effect on it.
PRIORITY = (
    "stream_checkpoint_restart",
    "graph_connected_components",
    "graph_kcore_peeling",
    "agg_heavy_hitters",
    "dedup_minhash_calibration",
    "multimodal_phash_pairs",
    "text_substring_dedup",
    "ml_roc_auc",
    "ml_pr_auc",
    "ml_naive_bayes_lang",
    "io_dynamic_partition_overwrite",
    "validate_referential_integrity",
)


def available_rounds(repo: str = REPO) -> tuple[int, ...]:
    """Round numbers with a CORRECTNESS_r*.json on disk."""
    return tuple(
        sorted(
            int(re.search(r"_r(\d+)\.json$", p).group(1))
            for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
        )
    )


def latest_green(
    repo: str = REPO, rounds: tuple[int, ...] | None = None
) -> dict[str, int]:
    """name -> latest round with a green driver row. ``rounds``
    restricts to those correctness files — the pinned hygiene test
    passes ``__spark_entry__._CHECK_FIRST_BASIS`` so a NEW round's
    file landing on disk doesn't retroactively redden the pin; the
    next round's builder reruns ``--python`` and updates both tuples."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        if rounds is not None and rnd not in rounds:
            continue
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            green = (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
            )
            if green:
                out[name] = max(out.get(name, 0), rnd)
    return out


def registry_names() -> list[str]:
    """Registry names in raw (pre-rotation) module order."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry_mod

    return list(entry_mod._RAW_QUERIES)


def compute_check_first(
    names: list[str] | None = None,
    greens: dict[str, int] | None = None,
    window: int = WINDOW,
    rounds: tuple[int, ...] | None = None,
) -> tuple[str, ...]:
    names = registry_names() if names is None else list(names)
    greens = latest_green(rounds=rounds) if greens is None else greens
    pos = {n: i for i, n in enumerate(names)}
    prio = {n: i for i, n in enumerate(PRIORITY)}
    never = sorted(
        (n for n in names if n not in greens),
        key=lambda n: (prio.get(n, len(PRIORITY)), pos[n]),
    )
    changed = sorted(
        (n for n in names if n in greens and n in set(CHANGED_SINCE_GREEN)),
        key=lambda n: pos[n],
    )
    stale = sorted(
        (n for n in names if n in greens and n not in set(CHANGED_SINCE_GREEN)),
        key=lambda n: (greens[n], pos[n]),
    )
    return tuple((never + changed + stale)[:window])


def main() -> None:
    if "--report" in sys.argv:
        names = registry_names()
        greens = latest_green()
        never = [n for n in names if n not in greens]
        by_round: dict[int, int] = {}
        for n in names:
            if n in greens:
                by_round[greens[n]] = by_round.get(greens[n], 0) + 1
        print(f"registry: {len(names)} queries")
        print(f"never driver-checked: {len(never)}")
        for rnd in sorted(by_round):
            print(f"latest green r{rnd:02d}: {by_round[rnd]}")
        window = compute_check_first(names=names, greens=greens)
        after = len(never) - sum(1 for n in window if n not in greens)
        print(f"this round's window covers {len(window)} "
              f"(backlog after a green round: {max(after, 0)})")
        return
    check_first = compute_check_first()
    if "--python" in sys.argv:
        rounds = available_rounds()
        print(f"_CHECK_FIRST_BASIS = {rounds!r}")
        print("_CHECK_FIRST = (")
        for name in check_first:
            print(f'    "{name}",')
        print(")")
    else:
        for name in check_first:
            print(name)


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:
        pass  # piped into head/grep; nothing to clean up
