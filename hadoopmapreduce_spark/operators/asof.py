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


@query(
    "join_range_banded",
    oracle="""
    SELECT p.event_id AS purchase_id,
           COUNT(v.user_id) AS n_views_prior_hour
    FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
      ON v.ts > p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
    GROUP BY 1
    """,
)
def join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large range join via time banding: how many views (by anyone)
    landed in the hour before each purchase.

    Neither side is broadcastable at 100 TB, and a naive non-equi join
    between two large sides is a cross join in disguise.  The banded form:
    bucket both sides into 1-hour epochs, equi-join each purchase bucket to
    {bucket, bucket-1} on the view side (a 1-hour lookback can only span
    two buckets), then apply the exact range predicate.  The equi-join on
    the bucket key shuffles/partitions normally; per-bucket fan-out is
    bounded by events-per-hour, not table size.  This is the general
    recipe every 'within Δ' join (sensor alignment, sessionized
    attribution) compiles to."""
    ev = load_table(spark, sf_dir, "events")
    hour = 3600  # seconds per band
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.col("ts").alias("p_ts"),
        (F.unix_timestamp("ts") / hour).cast("bigint").alias("bucket"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        (F.unix_timestamp("ts") / hour).cast("bigint").alias("v_bucket"),
    )
    # each purchase probes its own band and the previous one; count matches
    # with an inner join, then re-attach zero-match purchases (an outer join
    # through the band+filter would drop a purchase whose bands have views
    # but none inside the exact range)
    probes = purchases.select(
        "event_id", "p_ts", F.explode(F.array(F.col("bucket"), F.col("bucket") - 1)).alias("v_bucket")
    )
    counts = (
        probes.join(views, "v_bucket")
        .filter(
            (F.col("v_ts") > F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("v_ts") <= F.col("p_ts"))
        )
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return purchases.select("event_id").join(counts, "event_id", "left").select(
        F.col("event_id").alias("purchase_id"),
        F.coalesce("n", F.lit(0)).alias("n_views_prior_hour"),
    )


@query(
    "join_asof_nearest_view",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS side
      FROM events WHERE event_type IN ('view', 'purchase')),
    win AS (
      SELECT *,
             last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
               OVER wprev AS prev_ts,
             first_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
               OVER wnext AS next_ts
      FROM tagged
      WINDOW wprev AS (PARTITION BY user_id ORDER BY ts, side
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wnext AS (PARTITION BY user_id ORDER BY ts, side
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT event_id AS purchase_id, user_id,
           CAST(ts AS TIMESTAMP) AS purchase_ts,
           CAST(CASE WHEN prev_ts IS NULL THEN next_ts
                     WHEN next_ts IS NULL THEN prev_ts
                     WHEN ts - prev_ts <= next_ts - ts THEN prev_ts
                     ELSE next_ts END AS TIMESTAMP) AS nearest_view_ts
    FROM win WHERE side = 1
    """,
)
def join_asof_nearest_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join: each purchase pairs with the view
    closest in time in EITHER direction (tie → the earlier one) — the
    third as-of direction (backward = join_asof_purchase_view, the
    range-banded variant = join_range_banded) that sensor/trade alignment
    needs when causality doesn't pin a side.

    Same union + one-ordered-pass shape as the backward as-of (1 shuffle
    on user_id, never a range join): carry the last view at-or-before
    (inclusive frame; views sort before purchases at equal ts) and the
    first view strictly-after (same ordering excludes equal-ts views from
    the following frame), then pick by exact microsecond distance."""
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "view", 0).otherwise(1).alias("side"),
    )
    base = W.partitionBy("user_id").orderBy("ts", "side")
    wprev = base.rowsBetween(W.unboundedPreceding, W.currentRow)
    wnext = base.rowsBetween(W.currentRow, W.unboundedFollowing)
    view_ts = F.when(F.col("side") == 0, F.col("ts"))
    carried = tagged.select(
        "*",
        F.last(view_ts, ignorenulls=True).over(wprev).alias("prev_ts"),
        F.first(view_ts, ignorenulls=True).over(wnext).alias("next_ts"),
    ).filter(F.col("side") == 1)
    us = F.unix_micros
    nearest = (
        F.when(F.col("prev_ts").isNull(), F.col("next_ts"))
        .when(F.col("next_ts").isNull(), F.col("prev_ts"))
        .when(
            us(F.col("ts")) - us(F.col("prev_ts"))
            <= us(F.col("next_ts")) - us(F.col("ts")),
            F.col("prev_ts"),
        )
        .otherwise(F.col("next_ts"))
    )
    return carried.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        nearest.alias("nearest_view_ts"),
    )
