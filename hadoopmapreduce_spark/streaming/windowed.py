"""[EXT] Structured Streaming operators.

The reference is strictly batch (two blocking ``waitForCompletion`` calls,
``ClickThru.java:62,81``).  This module is the streaming expression of the
same pipeline family: file-source streams, event-time watermarks, tumbling/
sliding/session windows, and streaming dedup (the E2 click-dedup semantic as
``dropDuplicatesWithinWatermark``).

For verification, the streaming queries run against the parquet fixtures
with an ``availableNow`` trigger into a memory sink — the batch-equivalent
answer is then SQL-checkable.  ``streaming_windowed_counts`` is registered
as a driver query: it executes the stream to completion and returns the
materialized result, with a DuckDB twin over ``time_bucket``.

At scale the same plan runs against a Kafka/files stream with checkpointed
state: watermarks bound state size, windows partition naturally by
(window, keys), and sums stay in the exact decimal domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoopmapreduce_spark.catalog import load_table
from hadoopmapreduce_spark.registry import query


def windowed_event_counts(events_stream: DataFrame) -> DataFrame:
    """The streaming aggregation under test: 1-day tumbling windows per
    event_type with a 1-hour watermark; counts + exact-decimal value sums."""
    return (
        events_stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
    )


@query(
    "streaming_windowed_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the tumbling-window aggregation as a real streaming query (file
    source → watermark → window agg → memory sink, ``availableNow`` trigger),
    then return the materialized result.

    Output mode is ``complete`` so the final watermark doesn't suppress the
    trailing window (in ``append`` mode a window only emits once the
    watermark passes it — correct for infinite streams, wrong for a finite
    replay).  The result must equal the batch/oracle answer exactly: that
    equivalence (stream replay == batch) is the core Structured Streaming
    guarantee this query pins down.
    """
    # file streams need an explicit schema (no inference at stream start).
    # load_table is called for its session-conf side effects (UTC tz +
    # nanosAsLong) so the raw schema resolves ts as long
    load_table(spark, sf_dir, "events")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # FileStreamSource requires a directory: stream the fixture dir with a
    # filename filter so only the events table is picked up
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    agg = windowed_event_counts(stream)
    out = agg.select(
        F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
    )
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_windowed_counts_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = spark.table("stream_windowed_counts_sink")
    # materialize before the sink table is superseded by a later run
    return spark.createDataFrame(result.collect(), schema=result.schema)


@query(
    "streaming_sliding_counts",
    oracle="""
    WITH starts AS (
      SELECT event_type,
             unnest([time_bucket(INTERVAL '12 hours', CAST(ts AS TIMESTAMP)),
                     time_bucket(INTERVAL '12 hours', CAST(ts AS TIMESTAMP))
                       - INTERVAL '12 hours']) AS window_start
      FROM events
    )
    SELECT window_start, event_type, COUNT(*) AS n
    FROM starts GROUP BY 1, 2
    """,
)
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 day long, sliding every 12 h): each event lands in
    two overlapping windows.  Same availableNow→memory-sink execution as the
    tumbling variant; the oracle enumerates both window starts per event
    explicitly (window length / slide = 2 memberships)."""
    load_table(spark, sf_dir, "events")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day", "12 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = agg.select(F.col("w.start").alias("window_start"), "event_type", "n")
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_sliding_counts_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = spark.table("stream_sliding_counts_sink")
    return spark.createDataFrame(result.collect(), schema=result.schema)
