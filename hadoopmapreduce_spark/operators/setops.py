"""[GEN] Set operations.  The reference's only set-like op is the implicit
union of its two input directories into one mapper (``ClickThru.java:53-56``);
here the full family: UNION ALL, INTERSECT (distinct), EXCEPT, EXCEPT ALL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoopmapreduce_spark.catalog import load_table
from hadoopmapreduce_spark.registry import query


def _cust_nk(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    )


def _supp_nk(spark, sf_dir):
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    )


@query(
    "set_union_all_counts",
    oracle="""
    SELECT nationkey, COUNT(*) AS n FROM (
      SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
      UNION ALL
      SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier
    ) GROUP BY 1
    """,
)
def set_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union — no dedup shuffle) then aggregate.  The union
    itself is free at scale: partitions concatenate, only the groupBy
    shuffles."""
    return (
        _cust_nk(spark, sf_dir)
        .unionByName(_supp_nk(spark, sf_dir))
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "set_intersect_nations",
    oracle="""
    SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
    INTERSECT
    SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier
    """,
)
def set_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): nations having both customers and
    suppliers.  Planned as an aggregate + semi-join — same shuffle count as a
    manual distinct-and-join."""
    return _cust_nk(spark, sf_dir).intersect(_supp_nk(spark, sf_dir))


@query(
    "set_except_nations",
    oracle="""
    SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
    EXCEPT
    SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier
    """,
)
def set_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): nations with customers but no suppliers."""
    return _cust_nk(spark, sf_dir).subtract(_supp_nk(spark, sf_dir))


@query(
    "set_except_all_counts",
    oracle="""
    SELECT nationkey, COUNT(*) AS n FROM (
      SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
      EXCEPT ALL
      SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier
    ) GROUP BY 1
    """,
)
def set_except_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference — multiplicities subtract), aggregated to a
    stable per-key count."""
    return (
        _cust_nk(spark, sf_dir)
        .exceptAll(_supp_nk(spark, sf_dir))
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "set_intersect_all_counts",
    oracle="""
    SELECT nationkey, COUNT(*) AS n FROM (
      SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
      INTERSECT ALL
      SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier
    ) GROUP BY 1
    """,
)
def set_intersect_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag intersection — min of multiplicities), aggregated
    to stable per-key counts."""
    return (
        _cust_nk(spark, sf_dir)
        .intersectAll(_supp_nk(spark, sf_dir))
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "set_union_schema_evolution",
    oracle="""
    SELECT o_orderkey AS id, o_totalprice AS price,
           o_orderpriority AS priority, NULL AS segment
    FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT c_custkey AS id, c_acctbal AS price,
           NULL AS priority, c_mktsegment AS segment
    FROM customer WHERE c_acctbal > 9000
    """,
)
def set_union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two sources with overlapping-but-different
    columns combined by NAME with nulls for the gaps
    (``unionByName(allowMissingColumns=True)``) — the operation every
    multi-vintage data lake performs when v2 of a feed adds columns.
    Positional UNION would silently misalign; by-name union is the
    evolution-safe form, and Catalyst still pushes each side's filter to
    its own scan."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    left = o.select(
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderpriority").alias("priority"),
    )
    right = c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_acctbal").alias("price"),
        F.col("c_mktsegment").alias("segment"),
    )
    return left.unionByName(right, allowMissingColumns=True)
