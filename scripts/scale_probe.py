#!/usr/bin/env python
"""Empirical super-linearity probe: run the most expensive queries at two
scale factors from the SAME generator (scripts/gen_scale_fixtures.py) and
report the wall-time ratio against the data ratio.

A ~linear query at 3x data should land well under ~3x wall on local[32]
(fixed per-query overhead — session, planning, task launch — dilutes the
ratio); a quadratic one lands near 9x. Emits a markdown table for SCALE.md.

Usage: python scripts/scale_probe.py [sf_a sf_b]   (default 0.1 0.3)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoopmapreduce_spark import registry  # noqa: E402
from hadoopmapreduce_spark.session import get_spark  # noqa: E402

# most expensive per bench_full.json, minus the streaming family (replay
# volume, not table size, drives those) — plus the two documented quadratic
# baselines, kept in deliberately to SHOW the expected super-linear ratio
PROBE = [
    "graph_bfs_distances",
    "dedup_clusters_twostar",
    "dedup_clusters",
    "graph_pagerank_int",
    "minhash_lsh_dedup",
    "simhash_dedup",
    "graph_copurchase_triangles",
    "agg_pricing_summary",
    "q5_local_supplier_volume",
    "contamination_check",
    "doc_repetition_signals",
    "ngram_jaccard_pairs",  # quadratic BY DESIGN (differential oracle)
    "embedding_near_dup",  # quadratic BY DESIGN (exact baseline)
    # round-5 fourth-session additions worth tracking across rounds
    "dedup_prefix_filter_jaccard",
    "fin_prorate_largest_remainder",
    "dq_fact_detail_reconcile",
    "agg_pareto_frontier_2d",
    "event_rolling_28d_actives",
]


def best_of(fn, sf_dir: str, n: int = 2) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn(get_spark(), sf_dir).collect()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    sf_a, sf_b = (sys.argv[1:3] + ["0.1", "0.3"])[:2]
    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scale_fixtures",
    )
    dir_a, dir_b = os.path.join(base, f"sf{sf_a}"), os.path.join(base, f"sf{sf_b}")
    data_ratio = float(sf_b) / float(sf_a)
    registry.load_all()
    # probe a custom set (e.g. just this session's new operators) without
    # re-running the standing list: SPARK_GRAFT_PROBE_QUERIES=a,b,c
    override = os.environ.get("SPARK_GRAFT_PROBE_QUERIES")
    probe = override.split(",") if override else PROBE
    spark = get_spark()

    print(f"| query | sf{sf_a} (s) | sf{sf_b} (s) | wall ratio (data x{data_ratio:.0f}) |")
    print("|---|---|---|---|")
    for name in probe:
        fn = registry.QUERIES[name]
        try:
            a = best_of(fn, dir_a)
            b = best_of(fn, dir_b)
            print(f"| {name} | {a:.2f} | {b:.2f} | {b / a:.2f}x |")
        except Exception as exc:  # keep probing the rest
            print(f"| {name} | ERROR | {type(exc).__name__} | {str(exc)[:80]} |")
        sys.stdout.flush()
    spark.catalog.clearCache()


if __name__ == "__main__":
    main()
