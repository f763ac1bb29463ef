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
# Round-10 pin (scripts/repin_window.py over CORRECTNESS_r1..r9, then
# hand-adjusted per VERDICT r9 ask #1): slots 1-4 are the four r9
# ADJUDICATION_DEFERRED registrations (never-checked, so they outrank
# rotation); slots 5-6 reserve the two planned round-10 registrations
# (names pinned ahead of registration — ``ordered_queries`` skips any not
# yet registered); slots 7-23 drain the LAST 17 stale r3 verdicts; the
# remaining slots start the r4 rotation (oldest-by-name).  After this
# window goes green, every registered query has a verdict and none is
# older than r4.  Queries not named here keep registration order after
# the pinned prefix — nothing is ever dropped, so verdicts union toward
# full coverage.
ADJUDICATION_PRIORITY: tuple[str, ...] = (
    # --- r9 deferred registrations (never-checked) ---
    "dq_k_anonymity",
    "embedding_top_component",
    "ts_holt_linear",
    "scan_fixed_width_source",
    # --- round-10 registrations (never-checked; pinned ahead) plus the
    # one r9-green query whose code changed this round (reworked-code-
    # first priority: dedup_semantic_eval gained the multiprobe columns)
    "dedup_semantic_multiprobe",
    "ann_ivfadc_topk",
    "dedup_semantic_eval",
    # --- the last 17 stale r3 verdicts ---
    "join_range_banded",
    "lang_id_markers",
    "merge_upsert",
    "mm_decode_features",
    "mm_frame_sample",
    "pii_redact",
    "pmi_top_pairs",
    "quality_score",
    "scd2_customer_history",
    "sessionize_events",
    "set_union_schema_evolution",
    "text_stats",
    "tfidf_top_terms",
    "topk_terms",
    "udf_grouped_normalize",
    "udf_pandas_scalar",
    "vocab_coverage",
    # --- r4 rotation, oldest-by-name ---
    "agg_equidepth_histogram",
    "agg_mode_deterministic",
    "agg_string_concat_groups",
    "cohort_retention",
    "ctr_flagship",
    "dedup_clusters_twostar",
    "dq_anomaly_sigma",
    "dq_referential_integrity",
    "ewma_user_value",
    "existence_join",
    "fn_array_setops",
    "fn_array_suite",
    "fn_bitwise_suite",
    "fn_cast_suite",
    "fn_conditional_suite",
    "fn_explode_suite",
    "fn_fuzzy_suite",
    "fn_interval_suite",
    "fn_json_suite",
    "fn_map_suite",
    "fn_map_transform_suite",
    "fn_regex_suite",
    "fn_trycast_suite",
    "fn_variant_suite",
    "funnel_steps_per_user",
    "graph_bfs_distances",
)

# Registered queries with NO driver verdict yet that deliberately sit
# OUTSIDE this round's 50-slot window.  Mid-round registrations that do
# not fit the window land here and FRONT the next round's window
# (tests/test_parity.py enforces every never-checked query is in exactly
# one of the two lists).  The four r9 deferrals now front the r10 window;
# round-10 registrations beyond the two reserved slots above defer here
# rather than displace the VERDICT-r9-mandated rotation picks (the
# round-7 precedent).  Each entry below is locally oracle-verified at
# sf0.001+sf0.01 and test-pinned before landing.
ADJUDICATION_DEFERRED: tuple[str, ...] = (
    "sample_importance_dsir",
    "image_gif_lzw_decode",
    "streaming_join_left_outer_expiry",
    "agg_hll_portable_estimate",
    "ts_changepoint_cusum",
    "eval_rouge2_pairs",
    "graph_louvain_move_pass",
    "eval_matryoshka_truncation",
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
