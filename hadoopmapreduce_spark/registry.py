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
