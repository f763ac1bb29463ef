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
