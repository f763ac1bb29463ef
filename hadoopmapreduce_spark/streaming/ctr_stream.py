"""[EXT] Streaming CTR — the reference pipeline as an infinite-stream query.

Maps the batch CTR semantics (operators/ctr.py) onto Structured Streaming:

  * impressions/clicks arrive on one event stream, provenance by event_type
    (the streaming analogue of the reference's per-record schema sniff);
  * E2 click-dedup becomes ``dropDuplicatesWithinWatermark`` — a click id
    is deduplicated against state bounded by the watermark horizon instead
    of an unbounded DISTINCT (which no infinite stream can afford);
  * the grouped mean becomes a windowed aggregate with late-data handling.

Used by tests/test_streaming.py; not a driver query (its output depends on
watermark timing, which a batch SQL oracle cannot mirror row-for-row —
streaming_windowed_counts covers the oracle-checkable surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_ctr(events_stream: DataFrame, window: str = "1 day") -> DataFrame:
    """Windowed CTR per event-time window over a unified event stream.

    Stream-stream outer joins require an event-time range on the join
    condition (that's what bounds both sides' state): a click attributes to
    a view if it lands within 1 day at-or-after it — the explicit form of
    the attribution the batch reference leaves implicit.  Clicks are deduped
    per user within the watermark first (E2's streaming analogue), then the
    windowed flag-mean matches the batch CTR semantics.
    """
    # both sides derive from the same stream: alias them so the join
    # condition references distinct lineages (otherwise user_id == user_id
    # resolves trivially-true against one side)
    views = (
        events_stream.filter(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", "1 hour")
    )
    clicks = (
        events_stream.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "1 hour")
        .dropDuplicatesWithinWatermark(["c_user"])
    )
    cond = (
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 DAY"))
    )
    flagged = views.join(clicks, cond, "left_outer").select(
        F.col("v_user").alias("user_id"), "view_ts", "click_ts"
    )
    return (
        flagged.groupBy(F.window("view_ts", window).alias("w"))
        .agg(
            F.avg(
                F.when(F.col("click_ts").isNotNull(), 1.0).otherwise(0.0)
            ).alias("ctr"),
            F.count(F.lit(1)).alias("n_impressions"),
        )
        .select(F.col("w.start").alias("window_start"), "ctr", "n_impressions")
    )
