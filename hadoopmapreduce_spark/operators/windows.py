"""[GEN] Window-function family (absent from the reference — SURVEY.md §2.4).

Determinism rule: every ORDER BY inside a window spec is a *total* order
(explicit tie-break columns), otherwise row_number/lag results depend on
partition-internal arrival order and the value-hash flips between engines.

Scale note: a window over PARTITION BY k is one shuffle on k plus a per-key
sort — same cost class as groupBy(k).  The anti-pattern is a window with no
PARTITION BY (single-partition global sort); the only global-order op we ship
is top-k, which uses TakeOrderedAndProject (per-partition heaps + driver
merge of k rows), not a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from hadoopmapreduce_spark.catalog import load_table
from hadoopmapreduce_spark.registry import query


@query(
    "window_topk_per_group",
    oracle="""
    SELECT custkey, orderkey, totalprice, rn FROM (
      SELECT o_custkey AS custkey, o_orderkey AS orderkey, o_totalprice AS totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: the canonical distributed top-k-per-group
    (one shuffle on the partition key; rank filter prunes before any further
    stage)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            "rn",
        )
    )


@query(
    "window_rank_parts",
    oracle="""
    SELECT p_partkey AS partkey,
           p_brand   AS brand,
           RANK()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_rank,
           DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_dense_rank,
           NTILE(4)     OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS quartile
    FROM part
    """,
)
def window_rank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile within brand.  rank ties share a value (so
    no tie-break needed for determinism); ntile requires the total order."""
    p = load_table(spark, sf_dir, "part")
    by_price = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    total = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.col("p_brand").alias("brand"),
        F.rank().over(by_price).alias("price_rank"),
        F.dense_rank().over(by_price).alias("price_dense_rank"),
        F.ntile(4).over(total).alias("quartile"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT l_suppkey AS suppkey, l_orderkey AS orderkey, l_linenumber AS linenumber,
           l_extendedprice AS price,
           LAG(l_extendedprice)  OVER w AS prev_price,
           LEAD(l_extendedprice) OVER w AS next_price
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over a per-supplier shipment timeline.

    Order-key note: the fixture generator reuses (orderkey, linenumber)
    pairs at larger scale factors, so the key also includes the price —
    rows still tied after that are identical in every output column, which
    makes the lag/lead *multiset* deterministic (tied rows are
    interchangeable)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    return li.select(
        F.col("l_suppkey").alias("suppkey"),
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.col("l_extendedprice").alias("price"),
        F.lag("l_extendedprice").over(w).alias("prev_price"),
        F.lead("l_extendedprice").over(w).alias("next_price"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           COUNT(*) OVER w AS order_seq,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running count + running spend per customer.  The running sum is over
    exact decimals so every prefix is order-independent-exact, then cast back
    to double (prefix sums of raw doubles would drift from the oracle in the
    last ulps)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.count(F.lit(1)).over(w).alias("order_seq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT l_suppkey AS suppkey, l_orderkey AS orderkey, l_linenumber AS linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                OVER (PARTITION BY l_suppkey
                      ORDER BY datediff('day', DATE '1990-01-01', CAST(l_shipdate AS DATE))
                      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS qty_trailing_7d
    FROM lineitem
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: trailing-7-day shipped quantity per supplier, ordered by
    an integer day index (RANGE frames need a numeric order key; the epoch-day
    index is the standard trick and is what a hypertable rollup would
    pre-compute)."""
    li = load_table(spark, sf_dir, "lineitem")
    day_idx = F.datediff(F.col("l_shipdate").cast("date"), F.lit("1990-01-01").cast("date"))
    w = (
        W.partitionBy("l_suppkey")
        .orderBy(day_idx)
        .rangeBetween(-6, W.currentRow)
    )
    return li.select(
        F.col("l_suppkey").alias("suppkey"),
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("qty_trailing_7d"),
    )


@query(
    "sessionize_events",
    oracle="""
    WITH ordered AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             LAG(CAST(ts AS TIMESTAMP)) OVER w AS prev_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    flagged AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR datediff('second', prev_ts, ts) > 1800
                     THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ),
    numbered AS (
      SELECT user_id, ts, event_id,
             -- DuckDB windowed SUM(int) is HUGEINT; Spark emits BIGINT — cast
             -- so the driver's value hash compares like types
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM flagged
    )
    SELECT user_id, session_no, MIN(ts) AS session_start,
           MAX(ts) AS session_end, COUNT(*) AS n_events
    FROM numbered GROUP BY 1, 2
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag-gap flag + running sum = session number,
    then per-session bounds.  Two window passes over ONE shuffle on user_id
    (both windows share the partitioning, so Catalyst reuses the exchange) —
    the batch twin of streaming's session_window."""
    from hadoopmapreduce_spark.catalog import load_table as _lt

    ev = _lt(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "window_value_functions",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_spend,
           LAST_VALUE(o_totalprice)  OVER w AS latest_spend,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_spend,
           CUME_DIST()    OVER w2 AS spend_cume,
           PERCENT_RANK() OVER w2 AS spend_pct_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
           w2 AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window value/distribution functions: first/last/nth value over a
    full-partition frame plus cume_dist/percent_rank.  cume_dist divides
    exact integer counts and percent_rank is (rank-1)/(n-1) — both
    deterministic doubles given the total order."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    w2 = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.first("o_totalprice").over(w).alias("first_spend"),
        F.last("o_totalprice").over(w).alias("latest_spend"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_spend"),
        F.cume_dist().over(w2).alias("spend_cume"),
        F.percent_rank().over(w2).alias("spend_pct_rank"),
    )


EWMA_ALPHA = 0.1


def ewma_fold(vals):
    """Sequential EWMA left fold over an array column — seeded with the
    first element, then acc·(1−α) + x·α per element.  Extracted so
    property tests can drive it on literal arrays against a Python model
    (tests/test_properties.py)."""
    return F.aggregate(
        F.slice(vals, 2, F.size(vals) - 1),
        F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(1 - EWMA_ALPHA) + x * F.lit(EWMA_ALPHA),
    )


@query(
    "ewma_user_value",
    oracle=f"""
    WITH o AS (
      SELECT user_id, list(value ORDER BY ts, event_id) AS vals
      FROM events GROUP BY 1)
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           list_reduce(vals, (acc, x) -> acc * {1 - EWMA_ALPHA} + x * {EWMA_ALPHA})
             AS ewma_value
    FROM o
    """,
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of event values — the
    classic online feature that SQL window frames cannot express (each step
    depends recursively on the previous).  Seeded with the first
    observation, then acc·(1−α) + x·α per event in (ts, event_id) order.

    Both engines run the IDENTICAL sequential left fold — Spark
    ``F.aggregate`` over the time-sorted array vs DuckDB ``list_reduce``
    over ``list(... ORDER BY)`` — so the recursion is bit-exact
    cross-engine, something no reordering-tolerant formulation could
    promise.  Plan: one shuffle (groupBy user), per-user arrays bounded by
    user activity; for unbounded keys the streaming twin
    (applyInPandasWithState, tests/test_stateful_streaming.py) carries the
    same recursion incrementally."""
    e = load_table(spark, sf_dir, "events")
    grouped = e.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("evs")
    )
    vals = F.transform(F.col("evs"), lambda s: s["value"])
    return grouped.select(
        "user_id",
        F.size(vals).cast("long").alias("n_events"),
        ewma_fold(vals).alias("ewma_value"),
    )


FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_fold(types):
    """Strict-subsequence funnel state machine as a sequential left fold
    over an array of event types (string-encoded stage counter).  Extracted
    for direct property testing (tests/test_properties.py)."""
    return F.aggregate(
        types,
        F.lit("0"),
        lambda acc, x: (
            F.when((acc == "0") & (x == FUNNEL_STEPS[0]), F.lit("1"))
            .when((acc == "1") & (x == FUNNEL_STEPS[1]), F.lit("2"))
            .when((acc == "2") & (x == FUNNEL_STEPS[2]), F.lit("3"))
            .otherwise(acc)
        ),
    )


@query(
    "funnel_steps_per_user",
    oracle=f"""
    WITH o AS (
      SELECT user_id, list(event_type ORDER BY ts, event_id) AS types
      FROM events GROUP BY 1)
    SELECT user_id,
           CAST(len(types) AS BIGINT) AS n_events,
           CAST(list_reduce(list_prepend('0', types), (acc, x) -> CASE
                  WHEN acc = '0' AND x = '{FUNNEL_STEPS[0]}' THEN '1'
                  WHEN acc = '1' AND x = '{FUNNEL_STEPS[1]}' THEN '2'
                  WHEN acc = '2' AND x = '{FUNNEL_STEPS[2]}' THEN '3'
                  ELSE acc END) AS INT) AS funnel_stage
    FROM o
    """,
)
def funnel_steps_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: how far each user progressed through
    view → click → purchase, where each step must occur AFTER the previous
    one (strict subsequence match, the semantics dashboards call
    "conversion funnel").  A window/aggregate can't express the recursion
    (the accepting state depends on everything before), so both engines
    run the same sequential left fold over the time-ordered event list —
    Spark ``F.aggregate`` vs DuckDB ``list_reduce`` — on a small
    string-encoded state machine.  Exact cross-engine by construction:
    no floats anywhere.

    One shuffle (groupBy user); per-user arrays bounded by activity.  The
    streaming twin of this state machine is applyInPandasWithState."""
    e = load_table(spark, sf_dir, "events")
    grouped = e.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))).alias(
            "evs"
        )
    )
    types = F.transform(F.col("evs"), lambda s: s["event_type"])
    return grouped.select(
        "user_id",
        F.size(types).cast("long").alias("n_events"),
        funnel_fold(types).cast("int").alias("funnel_stage"),
    )


@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS cohort_week
      FROM events GROUP BY 1),
    active AS (
      SELECT DISTINCT user_id,
             date_trunc('week', CAST(ts AS TIMESTAMP)) AS active_week
      FROM events)
    SELECT CAST(f.cohort_week AS DATE) AS cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) // 7 AS INT)
             AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM firsts f JOIN active a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by the week of their first
    event; for each cohort, how many are active k weeks later.  The
    product-analytics staple.

    Two aggregates over one events scan (first-event week, distinct active
    weeks) joined on user_id — all three shuffles key on user_id, so AQE
    reuses the exchange.  Week offsets divide a day-difference by 7; both
    operands are week-truncated so the division is exact integer math.
    Counts only — nothing float to drift."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        firsts.join(active, "user_id")
        .groupBy(
            F.col("cohort_week").cast("date").alias("cohort_week"),
            (
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            ).cast("int").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "window_distribution_suite",
    oracle="""
    SELECT o_orderkey AS orderkey,
           o_orderpriority AS priority,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST()    OVER w AS cume,
           NTILE(10)      OVER w AS decile
    FROM orders
    WHERE o_orderkey % 7 = 0
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_distribution_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist / ntile over
    the per-priority price order — the analytic trio behind score
    normalization and decile reporting.

    Engine parity is exact because all three are ratios of integers the
    engines agree on (rank-1)/(n-1), rank/n, bucket index): the only float
    arithmetic is one division of identical operands.  The ORDER BY is a
    total order (price, then key) so ranks are deterministic.  One shuffle
    on the partition key, same cost class as groupBy."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderpriority").alias("priority"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(10).over(w).alias("decile"),
    )


@query(
    "event_attribution_last_touch",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_type, value,
             CASE WHEN event_type IN ('view', 'click') THEN 0 ELSE 1 END AS kind
      FROM events
      WHERE event_type IN ('view', 'click', 'purchase')),
    carried AS (
      SELECT user_id, ts, event_type, value, kind,
             last_value(CASE WHEN kind = 0 THEN event_type END IGNORE NULLS)
               OVER w AS touch_type,
             last_value(CASE WHEN kind = 0 THEN ts END IGNORE NULLS)
               OVER w AS touch_ts
      FROM tagged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, kind, event_type
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    attributed AS (
      SELECT CASE WHEN touch_ts IS NOT NULL
                   AND ts - touch_ts <= INTERVAL 24 HOURS
                  THEN touch_type ELSE 'none' END AS touch_type,
             CAST(value AS DECIMAL(18,6)) AS v
      FROM carried WHERE kind = 1)
    SELECT touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(CAST(SUM(v) AS DECIMAL(28,6)) AS DOUBLE) AS total_value
    FROM attributed GROUP BY 1
    """,
)
def event_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the user's most
    recent view/click within a 24 h lookback (else 'none') — the marketing
    version of the as-of join, composed as union + one ordered window pass
    instead of a range join (1 shuffle on user_id vs 2).

    Ordering is total (ts, kind, event_type): a touch at the exact purchase
    timestamp sorts first and gets the credit, deterministically in both
    engines.  Value sums run in exact decimal and convert to double once."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    kind = F.when(F.col("event_type").isin("view", "click"), 0).otherwise(1)
    tagged = e.select("user_id", "ts", "event_type", "value", kind.alias("kind"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "kind", "event_type")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    touch_type = F.last(
        F.when(F.col("kind") == 0, F.col("event_type")), ignorenulls=True
    ).over(w)
    touch_ts = F.last(
        F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True
    ).over(w)
    carried = tagged.select(
        "*", touch_type.alias("touch_type"), touch_ts.alias("touch_ts")
    ).filter(F.col("kind") == 1)
    attributed = carried.select(
        F.when(
            F.col("touch_ts").isNotNull()
            & (
                F.col("ts").cast("long") - F.col("touch_ts").cast("long")
                <= 24 * 3600
            ),
            F.col("touch_type"),
        )
        .otherwise("none")
        .alias("touch_type"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    return attributed.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("v").cast("decimal(28,6)").cast("double").alias("total_value"),
    )


@query(
    "window_gap_islands",
    oracle="""
    WITH months AS (
      SELECT DISTINCT o_custkey AS custkey,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
               AS m
      FROM orders),
    grouped AS (
      SELECT custkey, m,
             m - ROW_NUMBER() OVER (PARTITION BY custkey ORDER BY m)
               AS island_key
      FROM months)
    SELECT custkey,
           CAST(MIN(m) AS BIGINT) AS start_month,
           CAST(MAX(m) AS BIGINT) AS end_month,
           CAST(COUNT(*) AS BIGINT) AS streak_months
    FROM grouped GROUP BY custkey, island_key
    """,
)
def window_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: for each customer, the maximal streaks of
    consecutive active months (months with >= 1 order) — the classic
    sessionization-by-index pattern (island key = value minus row_number,
    constant within a consecutive run).

    Everything is integer month indexes (y*12+m-1), so island keys and
    streak bounds are engine-exact; cost is one shuffle on custkey shared
    by the window and the island aggregate."""
    o = load_table(spark, sf_dir, "orders")
    months = o.select(
        F.col("o_custkey").alias("custkey"),
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
        ).cast("long").alias("m"),
    ).distinct()
    w = W.partitionBy("custkey").orderBy("m")
    grouped = months.select(
        "custkey", "m", (F.col("m") - F.row_number().over(w)).alias("island_key")
    )
    return grouped.groupBy("custkey", "island_key").agg(
        F.min("m").alias("start_month"),
        F.max("m").alias("end_month"),
        F.count(F.lit(1)).alias("streak_months"),
    ).drop("island_key")


@query(
    "window_running_distinct",
    oracle="""
    WITH flagged AS (
      SELECT event_id, user_id, ts, event_type,
             CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events)
    SELECT event_id, user_id,
           CAST(SUM(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS distinct_types_so_far
    FROM flagged
    """,
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over an ordered window — which no SQL engine
    supports directly (distinct aggregates are banned in window frames) —
    via the first-occurrence-flag identity: a value contributes to the
    running distinct count exactly at its first appearance, so
    ``row_number() per (key, value) == 1`` summed cumulatively IS the
    running distinct count.  Per user: how many distinct event types they
    had produced as of each event.

    Two window passes over the same user-keyed partitioning (the second
    sort subsumes the first's), tie-broken to a total order by
    (ts, event_id) since the fixture has same-timestamp events.  Scale:
    both windows partition by user_id — no global sort anywhere; state is
    one row per in-flight (user, type) at the first pass and a running
    scalar at the second."""
    e = load_table(spark, sf_dir, "events")
    first = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        e.withColumn(
            "first_seen",
            F.when(F.row_number().over(first) == 1, 1).otherwise(0),
        )
        .select(
            "event_id",
            "user_id",
            F.sum("first_seen").over(run).cast("long").alias("distinct_types_so_far"),
        )
    )


@query(
    "window_rolling_median_exact",
    oracle="""
    SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber, l_quantity,
           quantile_cont(l_quantity, 0.5) OVER (
             PARTITION BY l_partkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS roll_median
    FROM lineitem WHERE l_partkey % 50 = 0
    """,
)
def window_rolling_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-7-row median of order quantity per part — the rolling
    robust-statistic window Spark has no built-in for (``median``/
    ``percentile`` are aggregate-only; DuckDB windows ``quantile_cont``
    natively).  Composed as collect_list over the row frame → array_sort →
    arithmetic midpoint: for the ≤7-element frame the sort is O(1) per row
    and everything stays JVM-side.

    Determinism: quantities are small integers, so the even-count midpoint
    (a+b)/2 is IEEE-exact and equals DuckDB's ``lower + (upper-lower)*0.5``
    interpolation bit-for-bit.  The frame order is total on the emitted
    columns — (shipdate, orderkey, linenumber) alone is NOT unique in the
    fixture (the generator reuses orderkey/linenumber pairs at sf≥0.1), so
    l_quantity joins the sort key; rows tying on all four are
    interchangeable for both the output tuple and the window content.

    Scale: partitioned by part — shuffles once on l_partkey, frames never
    leave their partition, no global sort."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 50 == 0)
    w = (
        W.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(-6, 0)
    )
    arr = F.array_sort(F.collect_list(F.col("l_quantity")).over(w))
    n = F.size(arr)
    mid_hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    odd = F.element_at(arr, ((n + 1) / 2).cast("int"))
    even = (
        F.element_at(arr, (n / 2).cast("int")).cast("double")
        + F.element_at(arr, (n / 2 + 1).cast("int")).cast("double")
    ) / 2
    med = F.when(n % 2 == 1, odd.cast("double")).otherwise(even)
    return li.select(
        "l_partkey",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        med.alias("roll_median"),
    )


@query(
    "event_attribution_linear",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    touches AS (
      SELECT event_id, user_id, ts, event_type FROM events
      WHERE event_type IN ('view', 'click')),
    joined AS (
      SELECT p.event_id AS pid, t.event_type AS touch_type,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY t.ts, t.event_id) AS i,
             COUNT(*) OVER (PARTITION BY p.event_id) AS k
      FROM purchases p JOIN touches t
        ON p.user_id = t.user_id
       AND t.ts <= p.ts AND t.ts > p.ts - INTERVAL 24 HOURS),
    credited AS (
      SELECT touch_type,
             1000000 // k + CASE WHEN i <= 1000000 % k THEN 1 ELSE 0 END
               AS credit
      FROM joined
      UNION ALL
      SELECT 'none' AS touch_type, 1000000 AS credit
      FROM purchases p
      WHERE NOT EXISTS (SELECT 1 FROM joined j WHERE j.pid = p.event_id))
    SELECT touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_credits,
           CAST(SUM(credit) AS BIGINT) AS micro_credit
    FROM credited GROUP BY 1
    """,
)
def event_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase splits exactly
    1,000,000 micro-credits equally across every view/click in its 24 h
    lookback (largest-remainder rounding — the first ``1e6 mod k`` touches
    by time get the extra unit, so credit is integer-exact and sums to
    1e6 per purchase by construction); purchases with no touch credit
    'none'.  The fractional-credit version of event_attribution_last_touch
    — no floating-point division anywhere.

    Shape: purchase×touch pairs come from an equi-join on user_id with the
    24 h range as a residual filter (hash join, not a nested-loop range
    join); per-purchase rank/count are one window over pid.  At 100 TB
    you'd bucket both sides by (user_id, day) so the pair blow-up stays
    bounded by per-user-day activity."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("pts")
    )
    t = e.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("tid"),
        "user_id",
        F.col("ts").alias("tts"),
        F.col("event_type").alias("touch_type"),
    )
    joined = p.join(
        t,
        (p["user_id"] == t["user_id"])
        & (F.col("tts") <= F.col("pts"))
        & (
            F.col("tts").cast("long") > F.col("pts").cast("long") - 24 * 3600
        ),
    ).select("pid", "touch_type", "tts", "tid")
    w = W.partitionBy("pid")
    wo = w.orderBy("tts", "tid")
    credited = joined.select(
        "pid",
        "touch_type",
        F.row_number().over(wo).alias("i"),
        F.count(F.lit(1)).over(w).alias("k"),
    ).select(
        "touch_type",
        (
            F.expr("1000000 div k")
            + F.when(F.col("i") <= F.expr("1000000 % k"), 1).otherwise(0)
        ).alias("credit"),
    )
    untouched = p.join(
        joined.select("pid").distinct(), "pid", "left_anti"
    ).select(F.lit("none").alias("touch_type"), F.lit(1000000).alias("credit"))
    return (
        credited.unionByName(untouched)
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            F.sum("credit").cast("long").alias("micro_credit"),
        )
    )


@query(
    "window_max_drawdown",
    oracle="""
    WITH daily AS (
      SELECT o_custkey % 10 AS book, o_orderdate AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS flow_cents
      FROM orders GROUP BY 1, 2),
    eq AS (
      SELECT book, d,
             SUM(flow_cents) OVER (PARTITION BY book ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS equity
      FROM daily),
    curve AS (
      SELECT book, equity,
             MAX(equity) OVER (PARTITION BY book ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM eq)
    SELECT book,
           CAST(MAX(peak - equity) AS BIGINT) AS max_drawdown_cents,
           CAST(MAX(peak) AS BIGINT) AS peak_cents,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM curve GROUP BY 1
    """,
)
def window_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per book (customers hashed into 10 books): running
    equity = cumulative daily flow, running peak = cummax of equity,
    drawdown = peak − equity, reported as the per-book maximum — the
    standard risk window (financial sibling of the gap/island family).

    All integer cents; cumsum→cummax→max is three window/agg passes over
    ONE book-keyed shuffle (the two windows share partitioning and order,
    so Spark plans a single sort).  Here flows are all-positive so the
    equity curve is monotone and drawdown is 0 — the oracle pins the
    windowing semantics; tests/test_round5_session3.py drives a
    synthetic signed-flow curve through the same helper to prove a
    non-trivial drawdown."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        (F.col("o_custkey") % 10).alias("book"),
        F.col("o_orderdate").alias("d"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("flow_cents")
    )
    return max_drawdown(daily)


def max_drawdown(daily: DataFrame) -> DataFrame:
    """Core of :func:`window_max_drawdown` over (book, d, flow_cents) —
    factored out so the signed-flow behavioral test can drive it."""
    run = (
        W.partitionBy("book")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    curve = daily.select(
        "book",
        "d",
        F.sum("flow_cents").over(run).alias("equity"),
    ).select(
        "book",
        "equity",
        F.max("equity").over(
            W.partitionBy("book")
            .orderBy("d")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ).alias("peak"),
    )
    return curve.groupBy("book").agg(
        F.max(F.col("peak") - F.col("equity")).alias("max_drawdown_cents"),
        F.max("peak").alias("peak_cents"),
        F.count(F.lit(1)).alias("n_days"),
    )


@query(
    "event_markov_transitions",
    oracle="""
    WITH ordered AS (
      SELECT event_type AS src,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events),
    pairs AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
      FROM ordered WHERE dst IS NOT NULL GROUP BY 1, 2)
    SELECT src, dst, n,
           CAST(n * 1000000 //
                CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT)
                AS BIGINT) AS prob_ppm
    FROM pairs
    """,
)
def event_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    for each (event_type → next event_type) pair, the transition count and
    row-normalized probability in integer parts-per-million (``n·1e6 div
    row_total`` — exact integer division, no float partial-sum order
    dependence).  The behavioral model behind next-action prediction and
    funnel-anomaly detection.

    One lead() window per user (shuffle on user_id — the sessionize
    exchange shape), then a 25-row (|types|²-bounded) aggregate whose
    normalizing window is trivially small.  Counts ≤ |events| keep
    n·1e6 ≪ 2^63 at any conceivable scale."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return pairs.select(
        "src",
        "dst",
        "n",
        F.expr("n * 1000000 div sum(n) OVER (PARTITION BY src)")
        .cast("long")
        .alias("prob_ppm"),
    )


@query(
    "event_top_journeys",
    oracle="""
    WITH j AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM (
        SELECT user_id, ts, event_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events) s
      WHERE rn <= 8
      GROUP BY user_id)
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM j GROUP BY 1
    ORDER BY n_users DESC, path ASC
    LIMIT 10
    """,
)
def event_top_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: each user's first 8 events concatenated into an
    ordered path string ('view>click>purchase>…'), then the 10 most common
    paths — the product-analytics "what do users actually do" query
    (Sankey/flow charts are a visualization of exactly this table).

    The 8-step truncation bounds path length (and therefore key width)
    regardless of the heaviest user; one shuffle on user_id serves both
    the ordering window and the per-user fold, the path-frequency count is
    a wordcount, and the top-10 is a bounded TakeOrderedAndProject.
    Ordering is (ts, event_id) — fully deterministic, same fold order in
    both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    first8 = ev.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 8)
    paths = first8.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("path"))
        .limit(10)
    )


@query(
    "event_new_vs_returning",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY 1),
    daily AS (
      SELECT CAST(e.ts AS DATE) AS day, e.user_id,
             CAST(e.ts AS DATE) = f.first_day AS is_new
      FROM events e JOIN firsts f ON e.user_id = f.user_id)
    SELECT day,
           CAST(COUNT(DISTINCT CASE WHEN is_new THEN user_id END) AS BIGINT)
             AS new_users,
           CAST(COUNT(DISTINCT CASE WHEN NOT is_new THEN user_id END)
                AS BIGINT) AS returning_users
    FROM daily GROUP BY 1
    """,
)
def event_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning user split — the top-line growth metric on
    every product dashboard.  A user is NEW on their first active day
    (min activity date) and RETURNING on any later active day; the two
    distinct-counts per day are exact.

    First days come from a min() WINDOW over user_id — not an aggregate
    joined back, which would scan events twice (plan-pinned to one scan);
    the window's shuffle is the only exchange before the per-day
    conditional distinct count.  The count-distinct Expand doubles rows
    map-side (×2 for the two conditions), partial-agged before the
    shuffle; the approximate path at extreme scale is HLL per (day,
    cohort), already registered as agg_approx_count_distinct's pattern."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    daily = ev.withColumn(
        "is_new",
        F.col("day") == F.min("day").over(W.partitionBy("user_id")),
    )
    return daily.groupBy("day").agg(
        F.countDistinct(
            F.when(F.col("is_new"), F.col("user_id"))
        ).alias("new_users"),
        F.countDistinct(
            F.when(~F.col("is_new"), F.col("user_id"))
        ).alias("returning_users"),
    )


@query(
    "window_session_bounce",
    oracle="""
    WITH ordered AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             LAG(CAST(ts AS TIMESTAMP)) OVER w AS prev_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts,
             CAST(SUM(CASE WHEN prev_ts IS NULL
                             OR datediff('second', prev_ts, ts) > 1800
                           THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM ordered),
    sessions AS (
      SELECT user_id, session_no,
             CAST(MIN(ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM numbered GROUP BY 1, 2)
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS bounce_ppm
    FROM sessions GROUP BY 1
    """,
)
def window_session_bounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: share of sessions (30-minute inactivity gaps,
    sessionize_events' exact definition) containing a single event —
    the engagement-quality metric next to every traffic count.  Sessions
    are attributed to their START day.

    Same one-exchange sessionization as sessionize_events (lag-gap flag +
    running sum share the user_id shuffle), then a per-day fold of
    session-sized rows with the ratio in exact integer ppm."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    numbered = ev.withColumn(
        "new_session", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).withColumn(
        "session_no",
        F.sum("new_session").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    sessions = numbered.groupBy("user_id", "session_no").agg(
        F.min("ts").cast("date").alias("day"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return sessions.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("long")).alias("n_bounces"),
        F.expr(
            "CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000"
            " div count(1) AS BIGINT)"
        ).alias("bounce_ppm"),
    )


@query(
    "event_rolling_28d_actives",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ud),
    contrib AS (
      SELECT ud.user_id,
             CAST(unnest(generate_series(CAST(ud.day AS TIMESTAMP),
                                         CAST(LEAST(ud.day + INTERVAL 27 DAY,
                                                    (SELECT d1 FROM span))
                                              AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM ud)
    SELECT day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau_28d
    FROM contrib GROUP BY 1
    """,
)
def event_rolling_28d_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 28-day active users per day (the MAU curve next to every
    DAU chart): a user counts toward day D if active in [D−27, D].
    window_running_distinct gives the CUMULATIVE distinct count; this is
    the sliding-window variant, which no window frame expresses exactly
    (count-distinct over a moving range), so the plan is the scalable
    explode trick: distinct (user, day) activity → each row fans out to
    the ≤28 target days it contributes to (capped at the dataset's last
    day so trailing days aren't undercounted phantoms) → exact distinct
    per target day.

    Fan-out is a FIXED ×28 on the deduplicated user-day table (already
    ≪ raw events), partial-agged before the shuffle — linear at any
    scale, and the window width only changes the constant.  The HLL
    union of 28 daily sketches is the approximate big-window escape
    hatch."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    ud = ev.distinct()
    d1 = ud.agg(F.max("day")).first()[0]
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.least(F.date_add(F.col("day"), 27), F.lit(d1)),
            )
        ).alias("day"),
    )
    return contrib.groupBy("day").agg(
        F.countDistinct("user_id").alias("mau_28d")
    )


@query(
    "event_funnel_24h",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1),
    c AS (
      SELECT e.user_id, v.t1, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click'
        AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 24 HOUR
      GROUP BY 1, 2),
    p AS (
      SELECT e.user_id, c.t1, c.t2, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL 24 HOUR
      GROUP BY 1, 2, 3)
    SELECT user_id, t1, t2, t3 FROM p
    """,
)
def event_funnel_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained conversion funnel: users whose EARLIEST
    view → click → purchase chain completed with each transition inside a
    24-hour window (the "same-session conversion" metric; the unconstrained
    subsequence variant is funnel_steps_per_user).  Earliest-completion
    semantics make the result unique: t1 is the first view, t2 the first
    qualifying click after it, t3 the first qualifying purchase after that
    — a cascade of argmin stages, each one aggregate + one equi-join on
    user_id.

    Scale shape: three passes over a type-pruned event scan, all keyed on
    user_id — after the first shuffle the joins and aggregates reuse the
    same hash partitioning (no extra exchange under AQE), and each stage's
    state is one row per surviving user, monotonically shrinking down the
    funnel.  Timestamp arithmetic is exact microsecond integers in both
    engines; no floats anywhere."""
    e = load_table(spark, sf_dir, "events")
    day = F.expr("INTERVAL 24 HOURS")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + day))
        .groupBy("user_id", "t1")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + day))
        .groupBy("user_id", "t1", "t2")
        .agg(F.min("ts").alias("t3"))
    )
    return p.select("user_id", "t1", "t2", "t3")


@query(
    "event_attribution_time_decay",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    touches AS (
      SELECT event_id, user_id, ts, event_type FROM events
      WHERE event_type IN ('view', 'click')),
    joined AS (
      SELECT p.event_id AS pid, t.event_type AS touch_type,
             t.ts, t.event_id AS tid,
             8 >> CAST(date_diff('second', t.ts, p.ts) // 21600 AS INT) AS w
      FROM purchases p JOIN touches t
        ON p.user_id = t.user_id
       AND t.ts <= p.ts AND t.ts > p.ts - INTERVAL 24 HOURS),
    wsum AS (
      SELECT *, CAST(SUM(w) OVER (PARTITION BY pid) AS BIGINT) AS wt
      FROM joined),
    based AS (
      SELECT *, (1000000 * w) // wt AS base_credit,
                (1000000 * w) % wt AS frac
      FROM wsum),
    ranked AS (
      SELECT *,
             CAST(SUM(base_credit) OVER (PARTITION BY pid) AS BIGINT)
               AS base_sum,
             ROW_NUMBER() OVER (PARTITION BY pid
                                ORDER BY frac DESC, ts, tid) AS fr
      FROM based),
    credited AS (
      SELECT touch_type,
             base_credit + CASE WHEN fr <= 1000000 - base_sum
                                THEN 1 ELSE 0 END AS credit
      FROM ranked
      UNION ALL
      SELECT 'none' AS touch_type, 1000000 AS credit
      FROM purchases p
      WHERE NOT EXISTS (SELECT 1 FROM joined j WHERE j.pid = p.event_id))
    SELECT touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_credits,
           CAST(SUM(credit) AS BIGINT) AS micro_credit
    FROM credited GROUP BY 1
    """,
)
def event_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution — the third member of the
    attribution trio (last-touch: winner-take-all; linear: equal split;
    THIS: recency-weighted split).  Each purchase's 1,000,000
    micro-credits divide across its 24 h lookback touches proportionally
    to a half-life-6h decay — and because the decay base is 2 and age
    buckets are 6 h, the weight is an INTEGER SHIFT ``8 >> (age div 6h)``
    ∈ {8,4,2,1} (the agg_time_decay_revenue idiom), so credit allocation
    is exact largest-remainder integer arithmetic: floor shares
    ``(1e6·w) div Σw``, then the leftover units go to the touches with
    the largest remainders (ties by time, then event id).  Per-purchase
    credit sums to exactly 1e6 by construction (pinned in tests, with
    the cross-variant consistency check against the linear split).

    Shape: identical to event_attribution_linear — user-keyed equi-join
    with the 24 h residual, then three windows all partitioned on the
    purchase id; at 100 TB both sides bucket by (user_id, day)."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("pts")
    )
    t = e.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("tid"),
        "user_id",
        F.col("ts").alias("tts"),
        F.col("event_type").alias("touch_type"),
    )
    joined = p.join(
        t,
        (p["user_id"] == t["user_id"])
        & (F.col("tts") <= F.col("pts"))
        & (F.col("tts").cast("long") > F.col("pts").cast("long") - 24 * 3600),
    ).select(
        "pid",
        "touch_type",
        "tts",
        "tid",
        F.expr(
            "shiftright(8, cast((cast(pts as long) - cast(tts as long))"
            " div 21600 as int))"
        ).alias("w"),
    )
    wp = W.partitionBy("pid")
    based = joined.select(
        "*",
        F.sum("w").over(wp).alias("wt"),
    ).select(
        "*",
        F.expr("(1000000 * w) div wt").alias("base_credit"),
        F.expr("(1000000 * w) % wt").alias("frac"),
    )
    ranked = based.select(
        "*",
        F.sum("base_credit").over(wp).alias("base_sum"),
        F.row_number()
        .over(wp.orderBy(F.desc("frac"), F.asc("tts"), F.asc("tid")))
        .alias("fr"),
    )
    credited = ranked.select(
        "touch_type",
        (
            F.col("base_credit")
            + F.when(F.col("fr") <= F.lit(1000000) - F.col("base_sum"), 1)
            .otherwise(0)
        ).alias("credit"),
    )
    untouched = p.join(
        joined.select("pid").distinct(), "pid", "left_anti"
    ).select(F.lit("none").alias("touch_type"), F.lit(1000000).alias("credit"))
    return (
        credited.unionByName(untouched)
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            F.sum("credit").cast("long").alias("micro_credit"),
        )
    )


# --------------------------------------------------------------------------
# MATCH_RECOGNIZE-style pattern matching (CEP) over the event stream
# --------------------------------------------------------------------------


@query(
    "event_match_recognize_funnel",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    carried AS (
      SELECT user_id, event_type, rn,
             LAST_VALUE(CASE WHEN event_type <> 'click'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_nonclick_type,
             LAST_VALUE(CASE WHEN event_type <> 'click'
                             THEN rn END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_nonclick_rn
      FROM seq),
    matches AS (
      SELECT user_id,
             CAST(rn - prev_nonclick_rn - 1 AS BIGINT) AS n_clicks
      FROM carried
      WHERE event_type = 'purchase' AND prev_nonclick_type = 'view')
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_matches,
           CAST(MAX(n_clicks) AS BIGINT) AS max_clicks_in_match,
           CAST(SUM(n_clicks) AS BIGINT) AS total_clicks_matched
    FROM matches GROUP BY 1
    """,
)
def event_match_recognize_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style complex-event pattern matching — the CEP
    operator Spark SQL lacks (Flink/Snowflake ``MATCH_RECOGNIZE``,
    pattern ``V C* P``) — composed from window functions: find every
    CONTIGUOUS run ``view click* purchase`` in each user's event
    sequence (no other event type may interrupt the run).

    The trick that avoids a per-row state machine: carry, for every
    event, the type and position of the most recent NON-click event
    strictly before it (one ``last(..., ignorenulls=True)`` window).  A
    ``purchase`` whose carried type is ``view`` closes a match, and the
    click count of the match is the position gap minus one — clicks are
    the only thing that can sit between the carried view and the
    purchase, by construction.  This evaluates the Kleene star with ONE
    window pass instead of an iterative join, and generalizes to any
    pattern of the form ``A B* C`` by substituting the type predicates.

    Total order: (ts, event_id) — same tie-break discipline as
    sessionize.  Scale: one user-keyed exchange shared by the
    row_number and both carry windows; per-user state in the window
    frame is O(1) (last non-click seen).  Output is a per-user rollup,
    so nothing downstream touches raw events again."""
    return match_funnel_runs(load_table(spark, sf_dir, "events"))


def match_funnel_runs(events: DataFrame) -> DataFrame:
    """The ``A B* C`` matcher over any (user_id, event_type, ts, event_id)
    relation — see :func:`event_match_recognize_funnel` for the pattern
    semantics.  Property-tested against a brute-force Python state
    machine on hypothesis-generated sequences
    (tests/test_properties.py)."""
    seq = events.select(
        "user_id",
        "event_type",
        F.row_number()
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
    )
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    nonclick = F.when(F.col("event_type") != "click", F.col("event_type"))
    nonclick_rn = F.when(F.col("event_type") != "click", F.col("rn"))
    carried = seq.select(
        "user_id",
        "event_type",
        "rn",
        F.last(nonclick, ignorenulls=True).over(w_prev).alias("pt"),
        F.last(nonclick_rn, ignorenulls=True).over(w_prev).alias("pr"),
    )
    matches = carried.filter(
        (F.col("event_type") == "purchase") & (F.col("pt") == "view")
    ).select(
        "user_id",
        (F.col("rn") - F.col("pr") - 1).cast("long").alias("n_clicks"),
    )
    return matches.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.max("n_clicks").alias("max_clicks_in_match"),
        F.sum("n_clicks").alias("total_clicks_matched"),
    )
