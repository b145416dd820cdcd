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

Policy (round-6 verdict, "Next round: do this" items 1 and 3):

1. CHANGED-SINCE-GREEN queries come FIRST, **capped at CHANGED_CAP
   slots per round** — their old green row certifies code that is no
   longer on disk, the worst kind of stale signal. The set is
   MECHANIZED (round-6 verdict item 3 / ADVICE):
   ``tools/fingerprints.py`` hashes each query's plan source + oracle
   SQL + referenced module-level string templates against the
   fingerprint its latest green row certified
   (``tools/fingerprint_bank.json``); editing a green query's plan or
   oracle auto-promotes it here with no manual step. Ordered by
   banked-green round ascending (stalest signal first), ties in
   registry order.

   ANTI-STARVATION RULE (round-7 verdict items 1-2, pinned by
   ``tests/test_contract_hygiene.py``): round 7 edited 73 green
   queries, so uncapped changed-first filled the whole 50-slot window
   with re-certifications and the never-checked backlog (55) did not
   shrink at all — any future hardening round would reproduce that
   starvation. The cap guarantees never-checked/stale names at least
   ``WINDOW - CHANGED_CAP`` slots every round regardless of how much
   a round edits. Changed names beyond the cap rank AFTER
   never-checked but BEFORE plain stale greens (they are stale greens
   with a known edit on top — strictly worse).
2. NEVER-CHECKED queries (no green driver row in any round) come
   next. Among them, the verdict's named highest-stakes queries come
   first (``PRIORITY``); the rest follow in registry order.
3. Changed names beyond the cap, same order as (1).
4. Remaining slots go to stale greens, oldest round first (ties in
   registry order).

Green = ``err`` null, ``rows_match`` and ``schema_match`` true, and
``hash_match`` not false (rows-only streaming checks keep their weaker
row). A red row does NOT count as checked — the query stays at the
front until a green row lands.

Usage: ``python tools/rotation.py`` prints the 50 names, one per line;
``--python`` prints them as tuple literals ready to paste into
``__spark_entry__.py`` — including ``_CHECK_FIRST_CHANGED_BASIS``, the
changed-since-green set AS OF PIN TIME. The window is pinned at ROUND
START, before the round's plan edits (round-8 verdict item 7: a
hardening round's own edits must not displace the never-checked
backlog drain); queries edited after the pin become changed-since-green
and enter the NEXT round's window head. The hygiene test replays the
computation with the pinned changed set so mid-round edits cannot
silently redden (or retroactively rewrite) a round's window.
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

#: Max window slots changed-since-green names may take per round; the
#: other WINDOW - CHANGED_CAP always drain never-checked / stale names
#: (round-7 verdict anti-starvation rule — see module docstring).
CHANGED_CAP = WINDOW // 2

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
    changed_set: set[str] | None = None,
) -> tuple[str, ...]:
    names = registry_names() if names is None else list(names)
    greens = latest_green(rounds=rounds) if greens is None else greens
    if changed_set is None:
        changed_set = changed_since_green_set(greens)
    pos = {n: i for i, n in enumerate(names)}
    prio = {n: i for i, n in enumerate(PRIORITY)}
    changed = sorted(
        (n for n in names if n in greens and n in changed_set),
        key=lambda n: (greens[n], pos[n]),
    )
    never = sorted(
        (n for n in names if n not in greens),
        key=lambda n: (prio.get(n, len(PRIORITY)), pos[n]),
    )
    stale = sorted(
        (n for n in names if n in greens and n not in changed_set),
        key=lambda n: (greens[n], pos[n]),
    )
    head, overflow = changed[:CHANGED_CAP], changed[CHANGED_CAP:]
    return tuple((head + never + overflow + stale)[:window])


def changed_since_green_set(greens: dict[str, int]) -> set[str]:
    """Mechanized CHANGED_SINCE_GREEN via tools/fingerprints.py."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import fingerprints

    return fingerprints.changed_since_green(greens)


def main() -> None:
    if "--report" in sys.argv:
        names = registry_names()
        greens = latest_green()
        never = [n for n in names if n not in greens]
        by_round: dict[int, int] = {}
        for n in names:
            if n in greens:
                by_round[greens[n]] = by_round.get(greens[n], 0) + 1
        changed = sorted(changed_since_green_set(greens))
        print(f"registry: {len(names)} queries")
        print(f"never driver-checked: {len(never)}")
        print(f"changed since green: {len(changed)} {changed}")
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
        changed = sorted(changed_since_green_set(latest_green(rounds=rounds)))
        print(f"_CHECK_FIRST_BASIS = {rounds!r}")
        print("_CHECK_FIRST_CHANGED_BASIS = (")
        for name in changed:
            print(f'    "{name}",')
        print(")")
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
