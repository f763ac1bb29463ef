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
# coverage rotates across rounds instead of re-checking the same prefix:
# round 3 fronts every query that has never had a driver verdict (all [EXT]
# LLM-pipeline ops, streaming, UDFs, as-of/banded joins, MERGE/SCD2) plus the
# two round-1 hash-fail fixes that were never re-adjudicated
# (``sessionize_events``, ``fn_math_suite``).  Queries not named here keep
# registration order after the pinned prefix — nothing is ever dropped, so
# verdicts union toward full coverage across rounds.
ADJUDICATION_PRIORITY: tuple[str, ...] = (
    # unconfirmed round-1 hash-fail fixes (re-adjudicate)
    "sessionize_events",
    "fn_math_suite",
    # [EXT] text analysis (never checked)
    "text_stats",
    "topk_terms",
    "lang_id_markers",
    "quality_score",
    "token_count_bpe",
    "doc_fingerprint",
    "sample_stratified",
    "pack_token_budget",
    "vocab_coverage",
    "pii_redact",
    "doc_repetition_signals",
    "contamination_check",
    "tfidf_top_terms",
    "doc_chunk_windows",
    "corpus_summary",
    "pmi_top_pairs",
    # [EXT] deduplication (never checked)
    "exact_dedup",
    "exact_dedup_normalized",
    "ngram_jaccard_pairs",
    "minhash_lsh_dedup",
    "simhash_dedup",
    "embedding_near_dup",
    "dedup_clusters",
    # [EXT] similarity search (never checked)
    "knn_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_quantize_int8",
    "embedding_label_centroids",
    # [EXT] multimodal (never checked)
    "mm_payload_stats",
    "mm_decode_features",
    "mm_frame_sample",
    # streaming (never checked)
    "streaming_windowed_counts",
    "streaming_sliding_counts",
    "streaming_session_windows",
    "streaming_distinct_users",
    "streaming_view_purchase_join",
    "streaming_stateful_user_totals",
    # UDF/UDAF/UDTF (never checked)
    "udf_pandas_scalar",
    "udf_grouped_normalize",
    "udtf_bigram_expand",
    "udf_cogrouped_asof",
    # as-of / banded range joins (never checked)
    "join_asof_purchase_view",
    "join_range_banded",
    # MERGE / SCD2 (never checked)
    "merge_upsert",
    "scd2_customer_history",
    # never-checked extras to fill the 50-slot window
    "agg_median_exact",
    "agg_hll_sketch_union",
    "set_union_schema_evolution",
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
