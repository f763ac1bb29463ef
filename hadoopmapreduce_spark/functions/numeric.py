"""Deterministic floating-point aggregation helpers.

Problem: ``SUM(double)`` depends on accumulation order.  Spark's partial
(map-side) + final aggregation over an arbitrary partitioning visits rows in a
different order than DuckDB's sequential scan, so the last few ulps of a
double sum — and therefore the driver's value-hash — can differ even when both
engines are "right".

Fix: route double sums through an exact decimal domain.  Casting each input
double to ``DECIMAL(18, s)`` is a per-row operation (identical on both
engines for any double that isn't astronomically close to a half-ulp rounding
boundary — measure-zero for real data), decimal addition is exact and
order-independent, and the final cast back to double is deterministic.

This costs nothing at scale: decimal sum is still a single partial+final
hash aggregate; no extra shuffle, no loss of whole-stage codegen.

The SQL twins live next to each query as e.g.
``CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)``.

Integer-valued doubles (counts, 0/1 flags) and min/max/count are exact in
IEEE arithmetic regardless of order — those use the plain builtins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent SUM over a double column (via exact decimal)."""
    return F.sum(_c(col).cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 6) -> Column:
    """Order-independent AVG over a double column.

    sum(decimal)/count — both operands deterministic, so the double division
    result is bit-stable.  SQL twin:
    ``CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(x)``.
    """
    c = _c(col)
    return (F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c))


def sql_dsum(expr: str, scale: int = 4) -> str:
    """DuckDB twin of :func:`dsum` for embedding in oracle SQL strings."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 6) -> str:
    """DuckDB twin of :func:`davg`."""
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT({expr}))"
