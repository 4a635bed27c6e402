#!/usr/bin/env python
"""Propose the next round's gate window under the steady-state rule
(COVERAGE.md "Steady state (rounds 11+, ledger closed)").

With the driver ledger closed at 346/346 and the registry frozen, every
round's ``_GATE_FIRST_50`` is canaries only, composed in priority order:

1. **Prior-round reds** — any row that failed the previous round's
   driver CORRECTNESS file re-gates first (the standing rule
   ``test_window_regates_all_prior_round_reds`` enforces).
2. **Changed-path re-gates** — every query whose shared code path
   changed this round (``--changed``, comma list or @file of names;
   the round author knows the diff).
3. **Rotation fill** — remaining slots rotate through the registry so
   each query periodically re-faces the driver: oldest driver-green
   evidence first (ascending by the round of each query's most recent
   driver-green row), round-robin across families so every family
   appears (family = leading name token, e.g. ``graph``, ``dedup``,
   ``streaming``), name-ordered within a (round, family) bucket for
   determinism.

The output is a ready-to-paste Python list. The proposal is advisory —
the round author still swaps names when a late diff touches a shared
path — but the rotation arithmetic (who is stalest, which families are
covered) stops being hand-maintained.

Usage:
    python tools/steady_window.py                      # propose 50
    python tools/steady_window.py --changed dedup_simhash_pairs,graph_pagerank
    python tools/steady_window.py --slots 50 --json    # machine-readable
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def row_green(row: dict) -> bool:
    """A driver CORRECTNESS row counts as green when rows+schema match
    and the value hash did not fail (hash_match is None for the weaker
    rows-only check on non-SQL-expressible ops — that still counts,
    matching how COVERAGE.md's ledger tallies the cumulative union)."""
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match") is not False
        and row.get("err") in (None, "")
    )


def load_ledger(paths: list[str]) -> tuple[dict[str, int], set[str]]:
    """(query -> most recent driver-green round, prior-round red names).

    ``paths`` are CORRECTNESS_rNN.json files; the highest-numbered one
    is "the prior round" whose reds must re-gate.
    """
    greens: dict[str, int] = {}
    reds_last: set[str] = set()
    numbered = sorted(
        (int(re.search(r"_r(\d+)\.json$", p).group(1)), p)
        for p in paths
        if re.search(r"_r(\d+)\.json$", p)
    )
    for rnd, path in numbered:
        with open(path, encoding="utf-8") as f:
            data = json.load(f)
        for name, row in data.items():
            if row_green(row):
                greens[name] = max(greens.get(name, 0), rnd)
    if numbered:
        with open(numbered[-1][1], encoding="utf-8") as f:
            last = json.load(f)
        reds_last = {n for n, row in last.items() if not row_green(row)}
    return greens, reds_last


def family(name: str) -> str:
    return name.split("_", 1)[0]


def propose_window(
    registry: list[str],
    greens: dict[str, int],
    reds_last: set[str],
    changed: list[str],
    slots: int = 50,
) -> list[str]:
    """Compose the window per the steady-state priority order.

    Pure function of its inputs (no filesystem) so the composition rule
    is unit-testable; determinism matters because the window is frozen
    at round start and pinned by tests.
    """
    unknown = [n for n in changed if n not in registry]
    if unknown:
        raise ValueError(f"--changed names not in the registry: {unknown}")
    # A red row whose query was since renamed/removed must not emit a
    # nonexistent name into the window (ADVICE r10) — warn and drop; the
    # rename's NEW name re-gates via --changed, which the round author
    # owns.
    ghost_reds = sorted(n for n in reds_last if n not in registry)
    if ghost_reds:
        print(
            f"WARNING: prior-round reds not in the registry "
            f"(renamed/removed?), skipped: {ghost_reds}",
            file=sys.stderr,
        )
        reds_last = {n for n in reds_last if n in registry}
    window: list[str] = []
    seen: set[str] = set()

    def take(name: str) -> None:
        if name not in seen and len(window) < slots:
            window.append(name)
            seen.add(name)

    for name in sorted(reds_last):  # priority 1: prior-round reds
        take(name)
    for name in changed:  # priority 2: changed-path re-gates, as given
        take(name)

    # Priority 3: oldest-evidence rotation, round-robin across families.
    # Never-driver-green queries (round 0) sort first — with the ledger
    # closed there should be none, but a future registration that missed
    # its window must not be starved.
    remaining = [n for n in registry if n not in seen]
    by_family: dict[str, list[str]] = {}
    for n in sorted(remaining, key=lambda n: (greens.get(n, 0), n)):
        by_family.setdefault(family(n), []).append(n)
    # Families cycle in order of their stalest member, so every family
    # appears before any second pick from the same family.
    order = sorted(
        by_family, key=lambda f: (greens.get(by_family[f][0], 0), f)
    )
    while len(window) < slots and any(by_family.values()):
        for f in order:
            if by_family[f]:
                take(by_family[f].pop(0))
            if len(window) >= slots:
                break
    return window


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument(
        "--changed",
        default="",
        help="comma list (or @file, one per line) of queries whose "
        "shared code paths changed this round — mandatory re-gates",
    )
    ap.add_argument("--slots", type=int, default=50)
    ap.add_argument(
        "--json", action="store_true", help="emit a JSON object instead"
    )
    args = ap.parse_args(argv)

    changed: list[str] = []
    if args.changed.startswith("@"):
        with open(args.changed[1:], encoding="utf-8") as f:
            changed = [ln.strip() for ln in f if ln.strip()]
    elif args.changed:
        changed = [n.strip() for n in args.changed.split(",") if n.strip()]

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    registry = list(entry.queries())
    greens, reds_last = load_ledger(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r[0-9][0-9].json"))
    )
    window = propose_window(registry, greens, reds_last, changed, args.slots)

    if args.json:
        print(
            json.dumps(
                {
                    "window": window,
                    "prior_reds": sorted(reds_last),
                    "changed": changed,
                    "families": sorted({family(n) for n in window}),
                    "stalest_round": min(
                        (greens.get(n, 0) for n in window), default=None
                    ),
                },
                indent=1,
            )
        )
        return
    print("_GATE_FIRST_50 = [")
    for name in window:
        age = greens.get(name, 0)
        tag = (
            "prior-round RED"
            if name in reds_last
            else "changed path"
            if name in changed
            else f"last driver-green r{age:02d}"
        )
        print(f'    "{name}",  # {tag}')
    print("]")


if __name__ == "__main__":
    main()
