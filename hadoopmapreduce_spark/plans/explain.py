"""Physical-plan inspection helpers.

The optimizer work in this engine is deliberately *declarative* (SURVEY.md
§4.2: zero custom Catalyst rules) — correctness of the physical strategy is
therefore asserted, not implemented: these helpers let tests pin that the
plans Catalyst/AQE produce are the plans a 100 TB deployment needs
(broadcast where a side is small, filters pushed into the parquet scan,
pruned read schemas, bounded top-k, no accidental cartesian products).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_contains(df: DataFrame, *needles: str) -> None:
    plan = physical_plan(df)
    for needle in needles:
        assert needle in plan, f"plan missing {needle!r}:\n{plan}"


def assert_not_contains(df: DataFrame, *needles: str) -> None:
    plan = physical_plan(df)
    for needle in needles:
        assert needle not in plan, f"plan unexpectedly contains {needle!r}:\n{plan}"


def scan_read_schema(df: DataFrame) -> list[str]:
    """All ReadSchema column lists from parquet scans in the plan."""
    plan = physical_plan(df)
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)
