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
# Round-13 pin (scripts/repin_window.py over CORRECTNESS_r1..r12, per
# VERDICT r12 ask #1): slots 1-5 are the five r12 ADJUDICATION_DEFERRED
# registrations (never-checked, so they outrank rotation); slots 6-43
# drain the r6 cohort completely (38 stale r6 verdicts); slots 44-50
# start the r7 rotation (oldest-by-name).  After this window goes green,
# every query registered through r12 has a verdict and none is older
# than r7.  Queries not named here keep registration order after the
# pinned prefix — nothing is ever dropped, so verdicts union toward full
# coverage.
ADJUDICATION_PRIORITY: tuple[str, ...] = (
    "graph_louvain_multilevel",  # never-checked
    "text_bm25_topk",  # never-checked
    "image_bmp_rle8_decode",  # never-checked
    "eval_bleu_components",  # never-checked
    "graph_leiden_refine",  # never-checked
    "dq_fact_detail_reconcile",  # last verdict r6
    "dq_mad_outliers",  # last verdict r6
    "dq_observe_metrics",  # last verdict r6
    "event_funnel_24h",  # last verdict r6
    "event_markov_transitions",  # last verdict r6
    "event_new_vs_returning",  # last verdict r6
    "event_rolling_28d_actives",  # last verdict r6
    "event_top_journeys",  # last verdict r6
    "fin_fifo_inventory_match",  # last verdict r6
    "fin_prorate_largest_remainder",  # last verdict r6
    "fn_array_hof_suite",  # last verdict r6
    "fn_binary_suite",  # last verdict r6
    "fn_struct_suite",  # last verdict r6
    "graph_degree_assortativity",  # last verdict r6
    "graph_degree_distribution",  # last verdict r6
    "graph_neighbor_jaccard_top",  # last verdict r6
    "graph_ppr_seeded",  # last verdict r6
    "join_asof_nearest_view",  # last verdict r6
    "join_null_safe_eq",  # last verdict r6
    "mm_cdc_dedup_report",  # last verdict r6
    "pipeline_curriculum_mix",  # last verdict r6
    "sample_bottomk_per_group",  # last verdict r6
    "sample_weighted_bottomk",  # last verdict r6
    "scan_parquet_footer_stats",  # last verdict r6
    "sort_collation_unicode",  # last verdict r6
    "sort_topk_with_ties",  # last verdict r6
    "sql_shared_correlated",  # last verdict r6
    "sql_shared_ctr",  # last verdict r6
    "sql_shared_revenue",  # last verdict r6
    "text_inverted_index",  # last verdict r6
    "text_trigram_novelty",  # last verdict r6
    "text_zipf_fit",  # last verdict r6
    "ts_cusum_alerts",  # last verdict r6
    "ts_linear_trend",  # last verdict r6
    "ts_weekday_profile",  # last verdict r6
    "window_max_drawdown",  # last verdict r6
    "window_session_bounce",  # last verdict r6
    "agg_approx_quantiles",  # last verdict r7
    "agg_collation_ci_groups",  # last verdict r7
    "agg_moments",  # last verdict r7
    "agg_salted_skew",  # last verdict r7
    "agg_time_decay_revenue",  # last verdict r7
    "agg_unpivot",  # last verdict r7
    "audio_decode_features",  # last verdict r7
    "dedup_chunk_rewrite",  # last verdict r7
)

# Registered queries with NO driver verdict yet that deliberately sit
# OUTSIDE this round's 50-slot window.  Mid-round registrations that do
# not fit the window land here and FRONT the next round's window
# (tests/test_parity.py enforces every never-checked query is in exactly
# one of the two lists).  The five r12 deferrals now front the r13
# window above; round-13 registrations defer here rather than displace
# the VERDICT-r12-mandated rotation picks.  Each entry below must be
# locally oracle-verified at sf0.001+sf0.01 and test-pinned before
# landing.
ADJUDICATION_DEFERRED: tuple[str, ...] = (
    "retrieval_rrf_fusion",
    "ann_lsh_eval",
    "text_bpe_train_merges",
    "image_jpeg_huffman_decode",
    "retrieval_rbo_overlap",
    "text_wordpiece_train_merges",
    "eval_chrf_components",
    "archive_deflate_decode",
    "archive_deflate_dynamic_decode",
    "eval_pass_at_k",
    "text_utf8_validate",
    "image_jpeg_restart_decode",
    "archive_warc_probe",
    "text_kneser_ney_bigrams",
    "archive_gzip_member_probe",
    "graph_boruvka_round",
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
