"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``hadoopmapreduce_spark`` package; this module
just exposes its registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoopmapreduce_spark import registry  # noqa: E402

registry.load_all()

_SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (CTR per view-date) on sf0.001; driver checks rows>0."""
    return registry.QUERIES["ctr_flagship"](spark, _SF_SMOKE).orderBy("view_date")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Iteration order is the adjudication-priority order (see
    ``registry.ADJUDICATION_PRIORITY``): the driver checks the first 50
    entries per round, so the prefix rotates to queries without a prior
    driver verdict.
    """
    return registry.ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL twin per query (omitted → rows-only check)."""
    return dict(registry.ORACLES)
