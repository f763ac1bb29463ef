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
# Round-9 pin (derived from the committed CORRECTNESS_r1..r8 artifacts,
# hand-ordered per VERDICT r8 ask #1's reworked-code-first priority):
# slots 1-6 are the round-9 registrations (never-checked, so they outrank
# rotation; names pinned ahead of registration — ``ordered_queries`` skips
# any not yet registered); slots 7-12 are the streaming family whose r3
# verdicts predate the r6-r7 Arrow rework of the sources under them
# (VERDICT r7 ask #6 / r8 ask #1a); slots 13-16 the [REF] fidelity rows
# (r2 verdicts; ctr.py/textkv_source.py changed through the r8 CRLF
# contract); slots 17-27 the r3 dedup/similarity cohort; slots 28-41 the
# r2 remainder (TPC-H q2-q9/q17-q21 + recursive_date_spine); slots 42-50
# the oldest-r3-by-name fill.  After this window goes green, 61 stale
# verdicts drop to 17 (all r3) — the r10 rotation drains them.
# Queries not named here keep registration order after the pinned prefix —
# nothing is ever dropped, so verdicts union toward full coverage.
ADJUDICATION_PRIORITY: tuple[str, ...] = (
    # --- round-9 registrations (never-checked) ---
    "dedup_semantic_eval",
    "ann_pq_topk",
    "mm_audio_resample_nn",
    "image_tiff_exif_probe",
    "streaming_dedup_within_watermark",
    "ts_acf_lags",
    # --- streaming family: r3 verdicts, sources Arrow-reworked r6-r7 ---
    "streaming_windowed_counts",
    "streaming_sliding_counts",
    "streaming_session_windows",
    "streaming_distinct_users",
    "streaming_view_purchase_join",
    "streaming_stateful_user_totals",
    # --- [REF] fidelity rows: r2 verdicts, code moved through r8 ---
    "scan_jsonlines",
    "scan_textkv_source",
    "sink_textkv",
    "tag_by_schema_sniff",
    # --- r3 dedup/similarity cohort ---
    "minhash_lsh_dedup",
    "knn_cosine_topk",
    "exact_dedup",
    "exact_dedup_normalized",
    "embedding_near_dup",
    "ngram_jaccard_pairs",
    "dedup_clusters",
    "embedding_label_centroids",
    "embedding_quantize_int8",
    "ann_lsh_topk",
    "ann_ivf_topk",
    # --- r2 remainder: TPC-H suite + recursive date spine ---
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_predicates",
    "q20_part_promotion",
    "q21_suppliers_kept_waiting",
    "recursive_date_spine",
    # --- oldest-r3-by-name fill ---
    "agg_hll_sketch_union",
    "agg_median_exact",
    "contamination_check",
    "corpus_summary",
    "doc_chunk_windows",
    "doc_fingerprint",
    "doc_repetition_signals",
    "fn_math_suite",
    "join_asof_purchase_view",
)

# Registered queries with NO driver verdict yet that deliberately sit
# OUTSIDE this round's 50-slot window.  Mid-round round-9 registrations
# that did not fit the window land here and FRONT the round-10 window
# (tests/test_parity.py enforces every never-checked query is in exactly
# one of the two lists).  The first six r9 registrations took the window
# slots; these two arrived later and defer rather than displace the
# VERDICT-r8-mandated rotation picks (the round-7 precedent).
ADJUDICATION_DEFERRED: tuple[str, ...] = (
    "dq_k_anonymity",
    "embedding_top_component",
    "ts_holt_linear",
    "scan_fixed_width_source",
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
