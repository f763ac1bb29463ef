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
# Round-7 pin (mechanically derived by ``scripts/repin_window.py`` from the
# committed CORRECTNESS_r1..r6 artifacts): slots 1-30 drain the LAST of the
# never-checked backlog (the former ADJUDICATION_DEFERRED — after this round
# every registered query has a driver verdict); slots 31-38 are the round-7
# registrations (the real-codec quartet staged+oracle-validated in r6 per
# VERDICT r6 ask #3, plus the four mid-round additions: MaxSim, LPA, PII
# audit, k-center coreset); slot 39 re-checks
# ``scan_schema_evolution_union`` — the single r6 red, now hardened to
# integer-cents aggregation + fresh scratch (VERDICT r6 ask #1 says keep it
# in-window despite its verdict); slots 40-50 start the oldest-green
# re-adjudication rotation (VERDICT r4 ask #6 / r6 ask #5): the 11 oldest
# r1 verdicts, oldest round then name.  Queries not named here keep
# registration order after the pinned prefix — nothing is ever dropped, so
# verdicts union toward full coverage.
ADJUDICATION_PRIORITY: tuple[str, ...] = (
    # --- never-checked backlog (last 30) ---
    "dq_chisq_drift",
    "dedup_linkage_score_fs",
    "agg_collation_ci_groups",
    "fin_lifo_periodic_match",
    "dedup_chunk_rewrite",
    "text_bpe_apply_tokenize",
    "agg_time_decay_revenue",
    "sample_poisson_bootstrap",
    "udf_arrow_token_stats",
    "eval_lang_confusion",
    "dq_ks_drift",
    "scan_orc_roundtrip",
    "graph_modularity_brand",
    "graph_random_walks",
    "maintenance_targeted_delete",
    "eval_auc_rank",
    "eval_gains_deciles",
    "eval_knn_label_noise",
    "eval_ndcg_label_match",
    "eval_calibration_bins",
    "graph_clustering_coefficient",
    "scan_xml_roundtrip",
    "maintenance_snapshot_expire",
    "pipeline_mixture_cap_rebalance",
    "eval_pr_threshold_sweep",
    "event_attribution_time_decay",
    "ts_rolling_trend_28d",
    "sql_shared_grouping_sets",
    "sql_shared_lateral",
    "streaming_pyds_replay",
    # --- round-7 registrations: real-codec quartet (never-checked) ---
    "audio_decode_features",
    "image_decode_features",
    "video_probe_features",
    "zip_manifest_features",
    # --- round-7 mid-round registrations (never-checked) ---
    "knn_maxsim_multivector",
    "graph_label_propagation",
    "pipeline_pii_scrub",
    "sample_coreset_kcenter",
    # --- the r6 red, re-checked after the integer-cents hardening ---
    "scan_schema_evolution_union",
    # --- oldest-green rotation (11 oldest r1 verdicts) ---
    "agg_approx_quantiles",
    "agg_moments",
    "agg_salted_skew",
    "agg_unpivot",
    "fn_date_suite",
    "fn_string_suite",
    "profile_orders",
    "set_except_all_counts",
    "set_except_nations",
    "set_intersect_all_counts",
    "set_intersect_nations",
)

# Registered queries with NO driver verdict yet that deliberately sit
# OUTSIDE this round's 50-slot window.  The 80-query round-5 backlog
# drained over rounds 6-7 (50 + 30), and the first 8 round-7
# registrations (codec quartet + the mid-round four) fit the round-7
# window by trimming the oldest-green rotation from 15 to 11 slots.
# Entries below are LATE round-7 additions (the window was already
# full), all locally oracle-verified at sf0.001+sf0.01 — they front the
# round-8 window.
ADJUDICATION_DEFERRED: tuple[str, ...] = (
    "text_lm_surprise",  # bigram-LM surprise scoring (CCNet-style quality
                         # filter); integer floor-log2 via bin() length —
                         # no libm crosses the engine boundary
    "graph_harmonic_centrality",  # bounded-radius per-seed BFS harmonic
                                  # sums; integer ppm reciprocals
    "dedup_golden_record",  # ER survivorship: per-field rule windows with
                            # total tie-breaks over synthesized variants
    "join_temporal_scd2_fact",  # per-row event-time dimension lookup:
                                # equi-join on the key + validity-window
                                # residual; integer-cents revenue
    "sample_neyman_allocation",  # optimal stratified budget split
                                 # (N_h*S_h), largest-remainder integers,
                                 # windows over the 5-row strata rollup
    "ts_time_weighted_avg",  # TWAP over the irregular event stream: one
                             # user+day LEAD window, all-integer weighting
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
