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
# Round-12 pin (scripts/repin_window.py over CORRECTNESS_r1..r11, per
# VERDICT r11 ask #1): slots 1-7 are the seven r11 ADJUDICATION_DEFERRED
# registrations (never-checked, so they outrank rotation); slots 8-38
# drain the 31 remaining stale r5 verdicts; slots 39-50 start the r6
# rotation (oldest-by-name).  After this window goes green, every query
# registered through r11 has a verdict and none is older than r6.
# Queries not named here keep registration order after the pinned prefix
# — nothing is ever dropped, so verdicts union toward full coverage.
ADJUDICATION_PRIORITY: tuple[str, ...] = (
    "streaming_join_right_outer_expiry",  # never-checked
    "streaming_join_full_outer_expiry",  # never-checked
    "graph_louvain_phase1",  # never-checked
    "image_gif_interlaced_decode",  # never-checked
    "eval_mrr_label_match",  # never-checked
    "pipeline_temperature_mix",  # never-checked
    "graph_louvain_phase2_aggregate",  # never-checked
    "graph_basket_lift_top",  # last verdict r5
    "graph_kcore_peel_trace",  # last verdict r5
    "graph_wcc_components",  # last verdict r5
    "join_bloom_multiprobe",  # last verdict r5
    "join_bloom_prefilter",  # last verdict r5
    "join_broadcast_fallback",  # last verdict r5
    "join_interval_overlap",  # last verdict r5
    "join_partition_pruned_dynamic",  # last verdict r5
    "knn_filtered_topk",  # last verdict r5
    "mm_cdc_chunking",  # last verdict r5
    "mm_chunk_manifest",  # last verdict r5
    "pipeline_training_data_prep",  # last verdict r5
    "scan_dirty_json_quarantine",  # last verdict r5
    "scan_nested_struct_pruned",  # last verdict r5
    "scd2_asof_lookup",  # last verdict r5
    "simhash_dedup",  # last verdict r5
    "sink_textkv_writer_roundtrip",  # last verdict r5
    "streaming_dim_refresh_enrich",  # last verdict r5
    "streaming_late_data_audit",  # last verdict r5
    "streaming_sliding_topk",  # last verdict r5
    "table_diff_reconcile",  # last verdict r5
    "text_bpe_learn_merges",  # last verdict r5
    "topk_terms_per_lang",  # last verdict r5
    "ts_mom_revenue_change",  # last verdict r5
    "ts_seasonal_decompose",  # last verdict r5
    "udaf_pandas_grouped_agg",  # last verdict r5
    "udaf_tdigest_quantiles",  # last verdict r5
    "window_distribution_suite",  # last verdict r5
    "window_gap_islands",  # last verdict r5
    "window_rolling_median_exact",  # last verdict r5
    "window_running_distinct",  # last verdict r5
    "agg_filter_clause",  # last verdict r6
    "agg_gini_coefficient",  # last verdict r6
    "agg_herfindahl_index",  # last verdict r6
    "agg_pareto_frontier_2d",  # last verdict r6
    "agg_percentile_disc",  # last verdict r6
    "agg_rfm_segmentation",  # last verdict r6
    "agg_share_of_parent",  # last verdict r6
    "dedup_prefix_filter_jaccard",  # last verdict r6
    "dedup_url_canonicalize",  # last verdict r6
    "dq_completeness_profile",  # last verdict r6
    "dq_cross_field_rules",  # last verdict r6
    "dq_duplicate_payments",  # last verdict r6
)

# Registered queries with NO driver verdict yet that deliberately sit
# OUTSIDE this round's 50-slot window.  Mid-round registrations that do
# not fit the window land here and FRONT the next round's window
# (tests/test_parity.py enforces every never-checked query is in exactly
# one of the two lists).  The seven r11 deferrals now front the r12
# window above; round-12 registrations defer here rather than displace
# the VERDICT-r11-mandated rotation picks.  Each entry below must be
# locally oracle-verified at sf0.001+sf0.01 and test-pinned before
# landing.
ADJUDICATION_DEFERRED: tuple[str, ...] = (
    "graph_louvain_multilevel",
    "text_bm25_topk",
    "image_bmp_rle8_decode",
    "eval_bleu_components",
    "graph_leiden_refine",
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
