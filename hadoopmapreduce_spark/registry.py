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
# Round 5 fronts: (a) the 29 round-5 operators that have never had a driver
# verdict, (b) the two queries promoted from rows-only to full oracles this
# round (``simhash_dedup`` via the engine-portable md5-prefix hash,
# ``agg_cms_heavy_hitters`` likewise), (c) operators registered late in
# round 5, and (d) a rotation of the oldest (round-1) greens so stale
# verdicts get re-confirmed against current code (VERDICT r4 ask #6 — the
# never-checked set takes precedence over a full 50-oldest sweep; the
# rotation continues next round).  Queries not named here keep registration
# order after the pinned prefix — nothing is ever dropped, so verdicts union
# toward full coverage across rounds.
ADJUDICATION_PRIORITY: tuple[str, ...] = (
    # round-5 operators, never driver-checked
    "scan_dirty_json_quarantine",
    "join_bloom_prefilter",
    "agg_percentile_disc",
    "agg_filter_clause",
    "dq_uniqueness_audit",
    "agg_bitmap_distinct",
    "agg_pareto_nation_n80",
    "agg_weighted_avg_exact",
    "ts_mom_revenue_change",
    "agg_cube_grouping_id",
    "window_distribution_suite",
    "event_attribution_last_touch",
    "window_gap_islands",
    "fn_struct_suite",
    "fn_array_hof_suite",
    "fn_binary_suite",
    "udaf_pandas_grouped_agg",
    "table_diff_reconcile",
    "scd2_asof_lookup",
    "topk_terms_per_lang",
    "dq_freshness_lag",
    "pipeline_training_data_prep",
    "dedup_fuzzy_blocking",
    "doc_containment_pairs",
    "knn_filtered_topk",
    "mm_chunk_manifest",
    "graph_degree_distribution",
    "graph_basket_lift_top",
    "streaming_sliding_topk",
    "dedup_substring_spans",
    "udaf_tdigest_quantiles",
    "streaming_late_data_audit",
    "streaming_dim_refresh_enrich",
    "join_bloom_multiprobe",
    "agg_weighted_quantile_exact",
    "join_interval_overlap",
    "mm_cdc_chunking",
    "scan_nested_struct_pruned",
    "join_partition_pruned_dynamic",
    "window_running_distinct",
    "sql_shared_revenue",
    "sql_shared_ctr",
    "mm_cdc_dedup_report",
    "graph_kcore_peel_trace",
    "sink_textkv_writer_roundtrip",
    "fn_xxhash64_suite",
    # promoted from rows-only to full oracle this round
    "simhash_dedup",
    "agg_cms_heavy_hitters",
    # round-1 greens, verdicts 4 rounds stale (rotation)
    "ctr_flagship",
    "existence_join",
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
