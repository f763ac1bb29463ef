"""Query registry: the single source of truth wired into ``__spark_entry__``.

Each operator module registers its public queries here with the ``@query``
decorator.  A query is a callable ``(spark, sf_dir) -> DataFrame``; if it is
SQL-expressible it also carries a DuckDB oracle SQL string (tables
``region nation customer supplier part orders lineitem events documents
embeddings`` are pre-registered as views by the driver).

Determinism contract (the driver hashes values): every registered query must
be fully deterministic — explicit tie-breaks in any top-k/limit selection, and
floating-point aggregation routed through ``functions.numeric`` so the result
does not depend on Spark's partial-aggregation order.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# The driver adjudicates the FIRST 50 entries of ``queries()`` in iteration
# order each round.  This list pins that window explicitly so verification
# coverage rotates across rounds instead of re-checking the same prefix.
# Round-11 pin (scripts/repin_window.py over CORRECTNESS_r1..r10, per
# VERDICT r10 ask #1): slots 1-8 are the eight r10 ADJUDICATION_DEFERRED
# registrations (never-checked, so they outrank rotation); slots 9-31
# drain the 23 remaining stale r4 verdicts; slots 32-50 start the r5
# rotation (oldest-by-name).  After this window goes green, every query
# registered through r10 has a verdict and none is older than r5.
# Queries not named here keep registration order after the pinned prefix
# — nothing is ever dropped, so verdicts union toward full coverage.
ADJUDICATION_PRIORITY: tuple[str, ...] = (
    # --- r10 deferred registrations (never-checked) ---
    "sample_importance_dsir",
    "image_gif_lzw_decode",
    "streaming_join_left_outer_expiry",
    "agg_hll_portable_estimate",
    "ts_changepoint_cusum",
    "eval_rouge2_pairs",
    "graph_louvain_move_pass",
    "eval_matryoshka_truncation",
    # --- the 23 remaining stale r4 verdicts, oldest-by-name ---
    "graph_copurchase_triangles",
    "graph_pagerank_int",
    "group_avg_ctr",
    "incremental_agg_merge",
    "join_bucketed_colocated",
    "layout_zorder_stats",
    "maintenance_compact_roundtrip",
    "mm_payload_stats",
    "pack_token_budget",
    "q22_sales_opportunity",
    "sample_split_train_val_test",
    "sample_stratified",
    "scan_csv_source",
    "sink_partitioned_pruned",
    "streaming_merge_upsert",
    "streaming_static_enrich",
    "token_count_bpe",
    "ts_gapfill_locf",
    "ts_interpolate_linear",
    "ts_resample_ohlc",
    "ts_rollup_time_hierarchy",
    "udf_cogrouped_asof",
    "udtf_bigram_expand",
    # --- r5 rotation, oldest-by-name ---
    "agg_bitmap_distinct",
    "agg_cms_heavy_hitters",
    "agg_cube_grouping_id",
    "agg_decile_lift_table",
    "agg_pareto_nation_n80",
    "agg_weighted_avg_exact",
    "agg_weighted_quantile_exact",
    "dedup_fuzzy_blocking",
    "dedup_incremental_corpus",
    "dedup_minhash_eval",
    "dedup_substring_spans",
    "doc_containment_pairs",
    "dq_benford_first_digit",
    "dq_freshness_lag",
    "dq_uniqueness_audit",
    "event_attribution_last_touch",
    "event_attribution_linear",
    "fn_url_suite",
    "fn_xxhash64_suite",
)

# Registered queries with NO driver verdict yet that deliberately sit
# OUTSIDE this round's 50-slot window.  Mid-round registrations that do
# not fit the window land here and FRONT the next round's window
# (tests/test_parity.py enforces every never-checked query is in exactly
# one of the two lists).  The eight r10 deferrals now front the r11
# window above; round-11 registrations defer here rather than displace
# the VERDICT-r10-mandated rotation picks (the round-7 precedent).  Each
# entry below must be locally oracle-verified at sf0.001+sf0.01 and
# test-pinned before landing.
ADJUDICATION_DEFERRED: tuple[str, ...] = (
    "streaming_join_right_outer_expiry",
    "streaming_join_full_outer_expiry",
    "graph_louvain_phase1",
    "image_gif_interlaced_decode",
    "eval_mrr_label_match",
    "pipeline_temperature_mix",
    "graph_louvain_phase2_aggregate",
)


def ordered_queries() -> dict[str, QueryFn]:
    """Registry contents with the adjudication-priority prefix first."""
    out: dict[str, QueryFn] = {}
    for name in ADJUDICATION_PRIORITY:
        if name in QUERIES:
            out[name] = QUERIES[name]
    for name, fn in QUERIES.items():
        if name not in out:
            out[name] = fn
    return out


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is the DuckDB SQL twin
    (omit for genuinely non-SQL-expressible ops → driver does rows-only)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registration side-effects run."""
    from hadoopmapreduce_spark import operators  # noqa: F401

    operators.load_all()
