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
# round 4 fronts the last 21 queries that have never had a driver verdict
# (the 14 scalar-function suites, the aggregation tail, the window tail),
# the four round-3 hash fails whose oracle SQL is now BIGINT-cast
# (``token_count_bpe``, ``sample_stratified``, ``pack_token_budget``,
# ``mm_payload_stats``), ``q22_sales_opportunity`` (predicate loosened to be
# non-vacuous), and the two formerly-sampled UDF queries now running on full
# input (``udtf_bigram_expand``, ``udf_cogrouped_asof``).  Queries not named
# here keep registration order after the pinned prefix — nothing is ever
# dropped, so verdicts union toward full coverage across rounds.
ADJUDICATION_PRIORITY: tuple[str, ...] = (
    # scalar-function suites (never checked)
    "fn_array_suite",
    "fn_json_suite",
    "fn_conditional_suite",
    "fn_regex_suite",
    "fn_cast_suite",
    "fn_map_suite",
    "fn_explode_suite",
    "fn_fuzzy_suite",
    "fn_bitwise_suite",
    "fn_trycast_suite",
    "fn_array_setops",
    "fn_map_transform_suite",
    "fn_interval_suite",
    "fn_variant_suite",
    # aggregation tail (never checked)
    "agg_string_concat_groups",
    "agg_mode_deterministic",
    "agg_equidepth_histogram",
    "dq_referential_integrity",
    # window tail (never checked)
    "ewma_user_value",
    "funnel_steps_per_user",
    "cohort_retention",
    # round-3 hash fails, oracle SQL now BIGINT-cast (re-adjudicate)
    "token_count_bpe",
    "sample_stratified",
    "pack_token_budget",
    "mm_payload_stats",
    # previously-vacuous / previously-sampled queries (re-adjudicate)
    "q22_sales_opportunity",
    "udtf_bigram_expand",
    "udf_cogrouped_asof",
    # new this round (never checked)
    "dedup_clusters_twostar",
    "streaming_static_enrich",
    "join_bucketed_colocated",
    "ts_gapfill_locf",
    "ts_resample_ohlc",
    "graph_copurchase_triangles",
    "graph_pagerank_int",
    "layout_zorder_stats",
    "maintenance_compact_roundtrip",
    "scan_csv_source",
    "sink_partitioned_pruned",
    "incremental_agg_merge",
    "ts_interpolate_linear",
    "sample_split_train_val_test",
    "streaming_merge_upsert",
    "dq_anomaly_sigma",
    "agg_cms_heavy_hitters",
    "ts_rollup_time_hierarchy",
    "graph_bfs_distances",
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
