#!/usr/bin/env python
"""Mechanically derive the next round's ADJUDICATION_PRIORITY window.

The driver adjudicates the first 50 entries of ``queries()`` each round, so
the window must rotate by evidence, not memory.  This script computes, from
the committed CORRECTNESS_r*.json artifacts and the registry itself:

1. every registered query with NO driver verdict in any round (ordered as
   ``ADJUDICATION_DEFERRED`` documents, then registration order), then
2. rotation picks: queries whose most recent verdict is OLDEST (round
   ascending, then name) — re-adjudication insurance for early greens,

and prints the 50-entry tuple ready to paste over ADJUDICATION_PRIORITY,
plus the leftover never-checked tail that must become the new
ADJUDICATION_DEFERRED.  Run at round start, after the driver's
CORRECTNESS_r{N}.json lands:

    python scripts/repin_window.py
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoopmapreduce_spark import registry  # noqa: E402

WINDOW = 50


def main() -> None:
    registry.load_all()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    last_round: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)", os.path.basename(path)).group(1))
        with open(path) as f:
            for name in json.load(f):
                if name in registry.QUERIES:
                    last_round[name] = max(last_round.get(name, 0), rnd)

    deferred_order = [n for n in registry.ADJUDICATION_DEFERRED
                      if n in registry.QUERIES]
    never = [n for n in deferred_order if n not in last_round]
    never += [n for n in registry.QUERIES
              if n not in last_round and n not in never]
    rotation = sorted(
        (n for n in registry.QUERIES if n in last_round),
        key=lambda n: (last_round[n], n),
    )

    window = (never + rotation)[:WINDOW]
    leftover = [n for n in never if n not in window]

    print(f"# {len(never)} never-checked, {len(rotation)} with verdicts; "
          f"window={WINDOW}, leftover never-checked={len(leftover)}")
    print("ADJUDICATION_PRIORITY: tuple[str, ...] = (")
    for n in window:
        tag = "never-checked" if n not in last_round else f"last verdict r{last_round[n]}"
        print(f'    "{n}",  # {tag}')
    print(")")
    if leftover:
        print("\n# leftover never-checked (new ADJUDICATION_DEFERRED):")
        print("ADJUDICATION_DEFERRED: tuple[str, ...] = (")
        for n in leftover:
            print(f'    "{n}",')
        print(")")
    else:
        print("\n# no leftover — ADJUDICATION_DEFERRED becomes empty")


if __name__ == "__main__":
    main()
