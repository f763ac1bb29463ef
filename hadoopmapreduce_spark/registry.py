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
# Round-8 pin (mechanically derived by ``scripts/repin_window.py`` from the
# committed CORRECTNESS_r1..r7 artifacts): slots 1-6 drain the round-7
# ADJUDICATION_DEFERRED tail (the last never-checked queries — once green,
# driver coverage is 100% of the registry); slots 7-13 are the round-8
# registrations (SemDeDup, Kaplan-Meier, KMV sketch set algebra,
# MATCH_RECOGNIZE funnel, join-view IVM, NN image resize, JPEG structural
# probe — never-checked, so they outrank rotation); slots 14-50 are the
# oldest-green re-adjudication rotation (VERDICT r7 ask #2): the 9
# remaining r1 verdicts, then the oldest r2 cohort (TPC-H suite, join
# family, agg family) — adjudicated 6 rounds ago while sources/ctr kept
# moving.  The rotation tail was trimmed by 7 to fit the registrations
# (round-7 precedent); anything that does not fit goes to
# ADJUDICATION_DEFERRED.
# Queries not named here keep registration order after the pinned prefix —
# nothing is ever dropped, so verdicts union toward full coverage.
ADJUDICATION_PRIORITY: tuple[str, ...] = (
    # --- never-checked (late round-7 registrations, locally oracle-exact) ---
    "text_lm_surprise",
    "graph_harmonic_centrality",
    "dedup_golden_record",
    "join_temporal_scd2_fact",
    "sample_neyman_allocation",
    "ts_time_weighted_avg",
    # --- round-8 registrations (never-checked; rotation tail trimmed to
    # fit, round-7 precedent) ---
    "dedup_semantic_clustered",
    "ts_survival_km",
    "agg_kmv_set_intersect",
    "event_match_recognize_funnel",
    "incremental_join_maintenance",
    "mm_image_resize_nn",
    "image_jpeg_probe_features",
    # --- oldest-green rotation: the 9 remaining r1 verdicts ---
    "set_union_all_counts",
    "sort_multi_key",
    "sort_topk_orders",
    "window_lag_lead",
    "window_range_frame",
    "window_rank_parts",
    "window_running_sum",
    "window_topk_per_group",
    "window_value_functions",
    # --- oldest-green rotation: the oldest r2 cohort (round then name) ---
    "agg_approx_count_distinct",
    "agg_count_distinct",
    "agg_cube",
    "agg_grouping_sets",
    "agg_histogram_totalprice",
    "agg_pivot_status",
    "agg_pricing_summary",
    "agg_rollup",
    "agg_stats_acctbal",
    "dedup_latest_event_per_user",
    "encode_decode_kv_roundtrip",
    "join_anti_orderless_customers",
    "join_broadcast_dim_chain",
    "join_cross_region_flags",
    "join_full_outer_nation_presence",
    "join_inner_segment_revenue",
    "join_left_customer_orders",
    "join_range_price_bands",
    "join_semi_urgent_customers",
    "join_skew_salted",
    "project_fields",
    "q10_returned_items",
    "q11_important_stock",
    "q12_late_shipment_priority",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_supplier_relationship",
)

# Registered queries with NO driver verdict yet that deliberately sit
# OUTSIDE this round's 50-slot window.  Empty at round-8 start: the r7
# window drained the 30-query backlog and the 6 late-r7 registrations
# now front the window above.  Mid-round round-8 registrations that do
# not fit the window land here (tests/test_parity.py enforces every
# never-checked query is in exactly one of the two lists).
ADJUDICATION_DEFERRED: tuple[str, ...] = ()


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
