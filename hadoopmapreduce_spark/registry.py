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
# Round-6 pin (mechanically derived by ``scripts/repin_window.py`` from the
# committed CORRECTNESS_r1..r5 artifacts): all 50 slots go to queries that
# have NEVER had a driver verdict — the round-5 backlog was 80, the single
# highest-leverage item per VERDICT r5 ask #1.  The remaining 30
# never-checked queries wait in ``ADJUDICATION_DEFERRED`` and front the
# round-7 window, after which the oldest-green rotation (VERDICT r4 ask #6)
# resumes.  Registry growth is FROZEN this round so the window drains the
# backlog instead of chasing new registrations.  Queries not named here keep
# registration order after the pinned prefix — nothing is ever dropped, so
# verdicts union toward full coverage across rounds.
ADJUDICATION_PRIORITY: tuple[str, ...] = (
    "sql_shared_revenue",
    "sql_shared_ctr",
    "mm_cdc_dedup_report",
    "graph_degree_distribution",
    "fn_struct_suite",
    "fn_array_hof_suite",
    "fn_binary_suite",
    "agg_filter_clause",
    "agg_percentile_disc",
    "dedup_url_canonicalize",
    "agg_gini_coefficient",
    "join_asof_nearest_view",
    "window_max_drawdown",
    "agg_herfindahl_index",
    "dq_fact_detail_reconcile",
    "agg_pareto_frontier_2d",
    "fin_prorate_largest_remainder",
    "event_markov_transitions",
    "text_inverted_index",
    "dedup_prefix_filter_jaccard",
    "dq_mad_outliers",
    "sample_bottomk_per_group",
    "ts_linear_trend",
    "sql_shared_correlated",
    "dq_completeness_profile",
    "scan_parquet_footer_stats",
    "join_null_safe_eq",
    "agg_rfm_segmentation",
    "ts_cusum_alerts",
    "sort_topk_with_ties",
    "event_top_journeys",
    "agg_share_of_parent",
    "scan_schema_evolution_union",
    "dq_cross_field_rules",
    "dq_duplicate_payments",
    "event_new_vs_returning",
    "graph_degree_assortativity",
    "ts_weekday_profile",
    "window_session_bounce",
    "event_rolling_28d_actives",
    "dq_observe_metrics",
    "sample_weighted_bottomk",
    "fin_fifo_inventory_match",
    "event_funnel_24h",
    "text_zipf_fit",
    "text_trigram_novelty",
    "pipeline_curriculum_mix",
    "graph_neighbor_jaccard_top",
    "sort_collation_unicode",
    "graph_ppr_seeded",
)

# Registered queries with NO driver verdict yet that deliberately sit
# OUTSIDE this round's 50-slot window (the backlog exceeds the window, so
# somebody must wait).  Every one is locally oracle-verified at
# sf0.001+sf0.01 under tests/test_parity.py, which also enforces that
# nothing else is silently left out.  These 30 exhaust the never-checked
# backlog — they front the round-7 window, after which the oldest-green
# rotation resumes.
ADJUDICATION_DEFERRED: tuple[str, ...] = (
    "dq_chisq_drift",           # exact-integer chi-square drift audit
                                # (portable PSI alternative; HUGEINT/d38)
    "dedup_linkage_score_fs",   # Fellegi-Sunter log-odds scoring over the
                                # green fuzzy-blocking candidates
    "agg_collation_ci_groups",  # UNICODE_CI grouping vs en_us.nocase —
                                # CI half of the collation family
    "fin_lifo_periodic_match",  # reversed-receipt-axis sibling of the
                                # FIFO interval alignment; conservation
                                # cross-check against FIFO unit-tested
    "dedup_chunk_rewrite",      # sub-document chunk dedup + reassembly on
                                # the green mm_cdc_chunking manifest;
                                # tiling + digest invariants unit-tested
    "text_bpe_apply_tokenize",  # apply half of the green BPE pair; shares
                                # the learn loop; token-bound invariants
                                # unit-tested
    "agg_time_decay_revenue",   # exact power-of-two recency weighting
                                # (integer shift, data-derived H); weight-
                                # extreme bounds unit-tested
    "sample_poisson_bootstrap",  # derandomized Poisson(1) bootstrap via
                                 # the md5-nibble inverse-CDF ladder;
                                 # concentration bounds unit-tested
    "udf_arrow_token_stats",    # mapInArrow contract query (4th Python-
                                # interop surface); cross-checked against
                                # the codegen text_stats twin
    "eval_lang_confusion",      # classifier-eval confusion matrix over
                                # green lang_id_markers; ppm conservation
                                # unit-tested
    "dq_ks_drift",              # exact-integer two-sample KS via the
                                # banded distributed ECDF; sequential-
                                # sweep differential unit test
    "scan_orc_roundtrip",       # ORC write/read vs the parquet oracle;
                                # pushdown pinned (Avro jar absent —
                                # probe in the docstring)
    "graph_modularity_brand",   # exact-integer Newman modularity of the
                                # brand partition; 2m / range identities
                                # unit-tested
    "graph_random_walks",       # derandomized DeepWalk corpus (md5-mod
                                # neighbor picks); edge-membership of
                                # every hop unit-tested
    "maintenance_targeted_delete",  # GDPR-style delete rewriting only
                                    # files holding doomed keys (via
                                    # _metadata.file_path); byte-identity
                                    # of carried files unit-tested
    "eval_auc_rank",            # exact Mann-Whitney ROC-AUC at 2x-integer
                                # precision; tie handling via RANK + class
                                # size, truncating ppm division
    "eval_gains_deciles",       # gains/CAP table over a fully tie-broken
                                # NTILE; sibling of agg_decile_lift_table
    "eval_knn_label_noise",     # k-NN majority-vote label audit; reuses
                                # knn_cosine_topk's green exact-cosine path
    "eval_ndcg_label_match",    # NDCG@5 with precomputed integer log2
                                # discounts over the shared probe top-k
    "eval_calibration_bins",    # reliability diagram: fixed-width score
                                # bins, mean-score vs pos-rate gap
    "graph_clustering_coefficient",  # per-node triangle credit via
                                     # output-bounded intersection explode
    "scan_xml_roundtrip",       # Spark 4 built-in XML text source vs the
                                # parquet oracle; explicit-schema read
    "maintenance_snapshot_expire",  # retention VACUUM over the versioned
                                    # snapshot chain; audit counted from
                                    # the filesystem, not echoed literals
    "pipeline_mixture_cap_rebalance",  # water-filling token-budget split
                                       # across langs; one window pass,
                                       # conservation unit-tested
    "eval_pr_threshold_sweep",  # operating-point table over the bounded
                                # score-class rollup; integer F1 identity
    "event_attribution_time_decay",  # recency-weighted third member of
                                     # the attribution trio; integer-shift
                                     # weights, largest-remainder credits
    "ts_rolling_trend_28d",     # windowed twin of ts_linear_trend; RANGE
                                # frame on the day index, HUGEINT moments
    "sql_shared_grouping_sets",  # explicit-set GROUPING SETS + GROUPING()
                                 # flags; one text, two engines
    "sql_shared_lateral",       # LATERAL top-1-per-row; Catalyst
                                # decorrelation vs DuckDB lateral unnest
    "streaming_pyds_replay",    # Python Data Source STREAM reader:
                                # offsets + rate limit + partition splits
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
