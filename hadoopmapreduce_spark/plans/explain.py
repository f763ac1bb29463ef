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
    """All ReadSchema column lists from parquet scans in the plan.

    Captures to end-of-line (a nested ReadSchema contains inner ``>``
    which the old first-``>`` capture chopped mid-struct), and widens
    ``spark.sql.maxMetadataStringLength`` for the duration — the default
    100-char explain truncation hides trailing leaf columns exactly when a
    test needs to see them."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.maxMetadataStringLength", None)
    spark.conf.set("spark.sql.maxMetadataStringLength", "4096")
    try:
        plan = physical_plan(df)
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    return re.findall(r"ReadSchema: struct<(.*)$", plan, re.MULTILINE)
