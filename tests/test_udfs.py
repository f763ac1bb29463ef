"""UDF-tier semantics: the Arrow-vectorized path must agree bit-for-bit
with both the built-in expression and the (slow, anti-pattern) row-wise
Python UDF."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from hadoopmapreduce_spark.catalog import load_table


def test_pandas_udf_matches_builtin_and_row_udf(spark, sf_dir):
    from hadoopmapreduce_spark.operators.udfs import _charge_udf

    li = load_table(spark, sf_dir, "lineitem").limit(500)

    @F.udf(DoubleType())
    def row_charge(price, discount, tax):  # the slow path, for parity only
        return price * (1 - discount) * (1 + tax)

    builtin = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (
        1 + F.col("l_tax")
    )
    out = li.select(
        F.col("l_orderkey").alias("k"),
        F.col("l_linenumber").alias("ln"),
        builtin.alias("b"),
        _charge_udf("l_extendedprice", "l_discount", "l_tax").alias("p"),
        row_charge("l_extendedprice", "l_discount", "l_tax").alias("r"),
    ).collect()
    for row in out:
        assert row["b"] == row["p"] == row["r"]


def test_grouped_normalize_bounds(spark, sf_dir):
    from hadoopmapreduce_spark.operators.udfs import udf_grouped_normalize

    rows = udf_grouped_normalize(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["value_norm"] <= 1.0


def test_tdigest_rank_error_bound(spark, sf_dir):
    """Every estimated quantile must sit within the k0 rank-error envelope
    (~4·q(1-q)/δ of n, doubled for the two-level merge) of its exact rank."""
    from hadoopmapreduce_spark.operators.udfs import (
        TDIGEST_DELTA,
        udaf_tdigest_quantiles,
    )

    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        flag: sorted(
            r["v"]
            for r in li.select(
                F.col("l_returnflag").alias("f"),
                F.col("l_extendedprice").cast("double").alias("v"),
            )
            .filter(F.col("f") == flag)
            .collect()
        )
        for flag in ("A", "N", "R")
    }
    import bisect

    for r in udaf_tdigest_quantiles(spark, sf_dir).collect():
        vals = exact[r["flag"]]
        n = len(vals)
        rank = bisect.bisect_right(vals, r["est"])
        bound = max(3.0, 2.0 * 4.0 * r["q"] * (1 - r["q"]) * n / TDIGEST_DELTA)
        assert abs(rank - r["q"] * n) <= bound, (r["flag"], r["q"], rank, n)


def test_tdigest_deterministic_across_runs(spark, sf_dir):
    from hadoopmapreduce_spark.operators.udfs import udaf_tdigest_quantiles

    a = sorted(map(tuple, udaf_tdigest_quantiles(spark, sf_dir).collect()))
    b = sorted(map(tuple, udaf_tdigest_quantiles(spark, sf_dir).collect()))
    assert a == b


def test_tdigest_merge_consistent_with_direct():
    """Digesting 16 bucket-partials then merging must land within the same
    error envelope as one direct digest of all values."""
    from hadoopmapreduce_spark.operators.udfs import (
        TDIGEST_DELTA,
        _tdigest_compress,
        _tdigest_quantile,
    )

    # deterministic synthetic values, no RNG (mixed-congruential spread)
    vals = [((i * 2654435761) % 1000003) / 1000.0 for i in range(20000)]
    dm, dw = _tdigest_compress(vals, [1.0] * len(vals))
    means, weights = [], []
    for b in range(16):
        chunk = vals[b::16]
        m, w = _tdigest_compress(chunk, [1.0] * len(chunk))
        means.extend(m)
        weights.extend(w)
    mm, mw = _tdigest_compress(means, weights)
    assert sum(mw) == len(vals)
    svals = sorted(vals)
    import bisect

    n = len(vals)
    for q in (0.25, 0.5, 0.75, 0.9, 0.99):
        for est in (_tdigest_quantile(dm, dw, q), _tdigest_quantile(mm, mw, q)):
            rank = bisect.bisect_right(svals, est)
            bound = max(3.0, 2.0 * 4.0 * q * (1 - q) * n / TDIGEST_DELTA)
            assert abs(rank - q * n) <= bound, (q, est, rank)
