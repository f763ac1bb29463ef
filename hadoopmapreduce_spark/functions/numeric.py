"""Deterministic floating-point aggregation helpers.

Problem: ``SUM(double)`` depends on accumulation order.  Spark's partial
(map-side) + final aggregation over an arbitrary partitioning visits rows in a
different order than DuckDB's sequential scan, so the last few ulps of a
double sum — and therefore the driver's value-hash — can differ even when both
engines are "right".

Fix: route double sums through an exact decimal domain.  Casting each input
double to ``DECIMAL(18, s)`` is a per-row operation (identical on both
engines for any double that isn't astronomically close to a half-ulp rounding
boundary — measure-zero for DECIMAL-NATIVE data like generated prices, where
the cast merely reconstructs the intended decimal), decimal addition is exact
and order-independent, and the final cast back to double is deterministic.

CAUTION (round-5 finding): for BINARY-ARBITRARY doubles — float32 upcasts,
products of divisions — the boundary set is not effectively empty: scaling by
10^s is inexact in binary, and ``embedding_label_centroids`` diverged between
engines on one value in ~1e5 at sf0.1.  For such data quantize on a binary
grid instead: ``CAST(round(v * 2^k) AS BIGINT)`` — the power-of-two scaling
is exact and both engines round ties away from zero, so the integers agree
bit-for-bit (see that query for the worked pattern).

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


def lsum(col: Column | str, scale: int = 4, *, max_group_sum: float | None = None) -> Column:
    """Order-independent SUM over a double column — LONG-scaled fast path.

    Same per-row rounding as :func:`dsum` (the decimal(18,scale) cast
    defines the value), but the accumulation runs over scaled BIGINTs:
    Spark promotes ``sum(decimal(18,s))`` to ``decimal(28,s)``, which
    exceeds the 18-digit long-backed Decimal limit and falls back to
    BigDecimal adds — measured 1.6× slower than a codegen long sum on a
    600k-row group-by.

    Exactness bound: the final double conversion is exact only while
    ``|group sum| < 2^53 / 10^scale`` (9.0e11 at scale=4).  Beyond that the
    long→double cast rounds and can drift 1 ulp from the decimal path,
    breaking hash-stability nondeterministically as data grows.  Callers
    MUST therefore declare ``max_group_sum`` — a documented upper bound on
    ``|group sum|`` at the engine's design scale (100 TB ≈ TPC-H sf100k, not
    the local test SF) — and this function raises at plan-build time if the
    bound does not fit the exact window.  When it doesn't fit, use
    :func:`dsum`; the SQL twin (:func:`sql_dsum`) is IDENTICAL for both, so
    swapping is a one-word change per query.
    """
    if max_group_sum is None:
        raise ValueError(
            "lsum requires max_group_sum: a documented |group sum| bound at "
            "design scale; use dsum when no such bound is known"
        )
    if max_group_sum * (10 ** scale) >= 2.0 ** 53:
        raise ValueError(
            f"lsum(scale={scale}) is not exact for |group sum| up to "
            f"{max_group_sum:.3g} (needs < {2.0 ** 53 / 10 ** scale:.3g}); "
            "use dsum for this column"
        )
    c = _c(col)
    return (
        F.sum((c.cast(f"decimal(18,{scale})") * (10 ** scale)).cast("long"))
        .cast("double")
        / float(10 ** scale)
    )


def lavg(col: Column | str, scale: int = 6, *, max_group_sum: float | None = None) -> Column:
    """Order-independent AVG via the long-scaled sum (see :func:`lsum` for
    the mandatory ``max_group_sum`` bound); twin of :func:`sql_davg`."""
    return lsum(col, scale, max_group_sum=max_group_sum) / F.count(_c(col))
