#!/usr/bin/env python
"""Mechanical cross-round bench comparison (VERDICT r11 ask #2's "no
prose adjudication" criterion): given two bench sidecars, emit the
common-query-set statistics raw AND canary-normalized, so a round-over-
round verdict is one table instead of a NOTES.md argument.

Per-query normalization uses each run's canary ratio at the query's
segment (canary_bracket / canary_min of ITS OWN run) — dividing a
query's wall by its segment's load factor estimates the idle-host wall,
and the cross-run ratio of those is ambient-free to first order.

Usage: python scripts/compare_bench.py [OLD.json NEW.json]

With no arguments (ADVICE r12: the documented defaults are now real),
OLD is the COMMITTED bench_full.json (``git show HEAD:bench_full.json``
— the gated sidecar each round close commits) and NEW is the
working-tree bench_full.json — i.e. "did the run I just did regress
against the committed prior", zero typing.

The last stdout line is one JSON object (median/total ratios raw,
normalized, and canary-anchored) so a round close can commit the
adjudication as a machine artifact (VERDICT r12 ask #7) instead of
prose.
"""
from __future__ import annotations

import json
import statistics
import subprocess
import sys


def _segment_factor(series: list, idx_done: int, lo: float) -> float:
    """Load factor (>=1) of the segment containing the idx_done-th query:
    mean of the bracketing canary samples over the run's canary_min."""
    if not series or lo <= 0:
        return 1.0
    prev = series[0]
    for s in series[1:]:
        if s[0] >= idx_done:
            if prev[1] > 0 and s[1] > 0:
                return ((prev[1] + s[1]) / 2.0) / lo
            return 1.0
        prev = s
    return 1.0


def parse(d: dict) -> dict:
    """{query: (raw_sec, canary_normalized_sec)} from one sidecar dict."""
    canary = d.get("canary") or {}
    series = canary.get("series") or []
    lo = canary.get("min") or -1.0
    qs = d.get("queries") or {}
    out = {}
    for i, name in enumerate(sorted(qs)):
        t = qs[name]
        if t is None or t < 0:
            continue
        f = _segment_factor(series, i + 1, lo)
        out[name] = (t, t / f)
    return out


def _read(label: str) -> dict:
    """Load a sidecar dict from a path or a ``git:REF`` pseudo-path."""
    if label.startswith("git:"):
        out = subprocess.run(
            ["git", "show", label[4:]], capture_output=True, text=True
        )
        if out.returncode != 0:
            raise FileNotFoundError(f"git show {label[4:]}: {out.stderr.strip()}")
        return json.loads(out.stdout)
    with open(label) as f:
        return json.load(f)


def main() -> int:
    args = sys.argv[1:]
    if len(args) == 2:
        old_label, new_label = args
    elif not args:
        old_label, new_label = "git:HEAD:bench_full.json", "bench_full.json"
    else:
        print("usage: compare_bench.py [OLD.json NEW.json]", file=sys.stderr)
        return 2
    old_d, new_d = _read(old_label), _read(new_label)
    old, new = parse(old_d), parse(new_d)
    common = sorted(set(old) & set(new))
    only_new = sorted(set(new) - set(old))
    if not common:
        print("no common queries")
        return 1
    raw = [new[q][0] / old[q][0] for q in common if old[q][0] > 0]
    norm = [new[q][1] / old[q][1] for q in common if old[q][1] > 0]

    def qtl(xs, p):
        xs = sorted(xs)
        return xs[min(len(xs) - 1, int(p * len(xs)))]

    print(f"old: {old_label}  new: {new_label}")
    print(f"common queries: {len(common)}; new-only: {len(only_new)} "
          f"(+{sum(new[q][0] for q in only_new):.1f} s raw)")
    print(f"common-set total raw: {sum(old[q][0] for q in common):.1f} -> "
          f"{sum(new[q][0] for q in common):.1f} s; "
          f"canary-normalized: {sum(old[q][1] for q in common):.1f} -> "
          f"{sum(new[q][1] for q in common):.1f} s")
    # cross-run canary anchor: canary_min is the same fixed query on the
    # same data in both runs, so its ratio IS the host-speed ratio; a
    # per-query median ~equal to the anchor means ambient, not code.
    anchor = None
    c_old = old_d.get("canary") or {}
    c_new = new_d.get("canary") or {}
    if (c_old.get("min") or 0) > 0 and (c_new.get("min") or 0) > 0:
        anchor = c_new["min"] / c_old["min"]
    rows = [("raw", raw), ("canary-normalized", norm)]
    if anchor:
        rows.append(("canary-anchored (normalized / host-speed ratio "
                     f"{anchor:.2f}x)", [x / anchor for x in norm]))
    for label, xs in rows:
        print(f"per-query ratio ({label}): median "
              f"{statistics.median(xs):.2f}x, p25 {qtl(xs, 0.25):.2f}, "
              f"p75 {qtl(xs, 0.75):.2f}")
    worst = sorted(common, key=lambda q: -(new[q][1] / old[q][1] if old[q][1] else 0))[:8]
    print("worst normalized regressions:")
    for q in worst:
        print(f"  {q}: {old[q][0]:.2f} -> {new[q][0]:.2f} s raw "
              f"({new[q][1] / old[q][1]:.2f}x normalized)"
              if old[q][1] else f"  {q}: n/a")
    verdict = {
        "old": old_label,
        "new": new_label,
        "common": len(common),
        "new_only": only_new,
        "total_raw_old": round(sum(old[q][0] for q in common), 3),
        "total_raw_new": round(sum(new[q][0] for q in common), 3),
        "median_ratio_raw": round(statistics.median(raw), 4),
        "median_ratio_normalized": round(statistics.median(norm), 4),
        "canary_anchor": round(anchor, 4) if anchor else None,
        "median_ratio_anchored": (
            round(statistics.median(x / anchor for x in norm), 4)
            if anchor else None
        ),
        "worst_normalized": [
            [q, round(old[q][0], 3), round(new[q][0], 3),
             round(new[q][1] / old[q][1], 3)]
            for q in worst if old[q][1]
        ][:8],
    }
    print(json.dumps(verdict))
    return 0


if __name__ == "__main__":
    sys.exit(main())
