"""[EXT] As-of (temporal) join — an operator Spark lacks natively.

Implementation strategy (SURVEY.md §2.4 joins row): union-then-window.
Tag both event streams, union them, and run a single `last(..., ignorenulls)`
window ordered by (ts, side) per key — every right-side row then carries the
most recent left-side timestamp at-or-before it.  Cost: ONE shuffle on the
key + a per-key sort, identical to what a native as-of merge join would pay,
and strictly better than the naive approach (range join + groupBy max) which
shuffles twice and can explode on dense keys.  No Python, no
``pd.merge_asof`` — stays in whole-stage codegen.

Oracle: DuckDB's native ``ASOF LEFT JOIN``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from hadoopmapreduce_spark.catalog import load_table
from hadoopmapreduce_spark.registry import query


@query(
    "join_asof_purchase_view",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id  AS user_id,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts,
           CAST(v.ts AS TIMESTAMP) AS last_view_ts
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def join_asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the most recent at-or-before view by the same user
    (the classic attribution as-of join). Purchases with no prior view keep
    NULL — the reference would crash on such orphans (E4); we preserve them.
    """
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(None).cast("long").alias("event_id"), F.lit(0).alias("side")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(1).alias("side")
    )
    # side=0 sorts views before purchases at equal ts → ties are inclusive,
    # matching ASOF's p.ts >= v.ts
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tagged = views.unionByName(purchases).withColumn(
        "last_view_ts",
        F.last(F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True).over(w),
    )
    return tagged.filter(F.col("side") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "last_view_ts",
    )
