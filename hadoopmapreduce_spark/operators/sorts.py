"""[GEN] Sort / limit / top-k (absent from the reference; its only ordering
is the framework-internal shuffle byte sort on Text keys).

Scale note: `orderBy(...).limit(k)` compiles to TakeOrderedAndProject —
per-partition bounded heaps merged on the driver, O(k) memory, no global
sort.  A full global orderBy materialization is only exposed via the sink
writers (repartitionByRange), never inside a query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoopmapreduce_spark.catalog import load_table
from hadoopmapreduce_spark.registry import query


@query(
    "sort_topk_orders",
    oracle="""
    SELECT o_orderkey AS orderkey, o_custkey AS custkey, o_totalprice AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def sort_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 orders by price (deterministic: orderkey tie-break)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_custkey").alias("custkey"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


@query(
    "sort_multi_key",
    oracle="""
    SELECT o_orderkey AS orderkey, o_orderpriority AS priority,
           CAST(o_orderdate AS DATE) AS orderdate
    FROM orders
    ORDER BY o_orderpriority ASC, o_orderdate DESC, o_orderkey ASC
    LIMIT 50
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-direction multi-key sort with limit."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(
            F.asc("o_orderpriority"), F.desc("o_orderdate"), F.asc("o_orderkey")
        )
        .limit(50)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("orderdate"),
        )
    )
