"""Structured Streaming semantics: finite-replay equivalence, watermark
late-data dropping, streaming dedup (E2's streaming analogue), session
windows."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _run_stream(spark, df, name, mode="append"):
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@pytest.fixture()
def event_stream_dir(spark, tmp_path):
    rows = [
        # (event_id, ts, user_id, event_type)
        (1, "2024-01-01 00:05:00", 1, "view"),
        (2, "2024-01-01 00:10:00", 1, "click"),
        (3, "2024-01-01 00:11:00", 1, "click"),   # duplicate click (E2)
        (4, "2024-01-01 01:05:00", 2, "view"),
        (5, "2024-01-02 09:00:00", 3, "view"),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    path = str(tmp_path / "events")
    spark.createDataFrame(pdf).write.parquet(path)
    return path


def _read_stream(spark, path):
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def test_streaming_batch_equivalence(spark, sf_dir):
    """Finite replay of the windowed agg equals the batch answer."""
    from hadoopmapreduce_spark.catalog import load_table
    from hadoopmapreduce_spark.streaming.windowed import streaming_windowed_counts

    stream_result = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in streaming_windowed_counts(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("v"),
        )
        .select(F.col("w.start").alias("ws"), "event_type", "n", "v")
    )
    batch_result = {
        (r["ws"], r["event_type"]): (r["n"], r["v"]) for r in batch.collect()
    }
    assert stream_result == batch_result


def test_streaming_ctr_dedups_clicks(spark, tmp_path):
    """The stateful cascade (dedup → stream-stream join → windowed agg)
    needs one micro-batch per stateful operator for the watermark to
    propagate and flush append-mode results — drive it with explicit
    batches, the way a live stream would."""
    from hadoopmapreduce_spark.streaming.ctr_stream import streaming_ctr

    path = str(tmp_path / "ctr_events")
    schema = "event_id long, ts timestamp, user_id long, event_type string"

    def write_batch(rows):
        pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf, schema=schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    write_batch(
        [
            (1, "2024-01-01 00:05:00", 1, "view"),
            (2, "2024-01-01 00:10:00", 1, "click"),
            (3, "2024-01-01 00:11:00", 1, "click"),  # duplicate click (E2)
            (4, "2024-01-01 01:05:00", 2, "view"),
        ]
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(path).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )
    q = (
        streaming_ctr(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_ctr_stream")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
        # advance BOTH sides' watermarks far past day 1 (the global watermark
        # is the min across the view and click watermark nodes), then pump
        # extra batches so it propagates through all three stateful operators
        for i, day in enumerate(("2024-01-05", "2024-01-06", "2024-01-07")):
            write_batch(
                [
                    (100 + i, f"{day} 00:00:00", 99, "view"),
                    (200 + i, f"{day} 00:00:00", 98, "click"),
                ]
            )
            q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table("t_ctr_stream").collect()
    by_window = {r["window_start"].isoformat(): r for r in out}
    d1 = by_window["2024-01-01T00:00:00"]
    # 2 views on day 1; user 1 clicked (twice → once), user 2 didn't → ctr 0.5
    assert d1["n_impressions"] == 2 and d1["ctr"] == 0.5


def test_drop_duplicates_within_watermark(spark, event_stream_dir):
    stream = _read_stream(spark, event_stream_dir)
    deduped = (
        stream.filter(F.col("event_type") == "click")
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id"])
    )
    out = _run_stream(spark, deduped, "t_dedup_stream").collect()
    assert len(out) == 1 and out[0]["user_id"] == 1


def test_session_window(spark, event_stream_dir):
    """Session windows with a 30-min gap: user 1's three events form one
    session; users 2 and 3 one each."""
    stream = _read_stream(spark, event_stream_dir)
    sessions = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = _run_stream(spark, sessions, "t_session_stream").collect()
    per_user = {r["user_id"]: r["n_events"] for r in out}
    # user 3's event is the stream's max ts: its session can never close
    # under the final watermark, so append mode correctly withholds it
    assert per_user == {1: 3, 2: 1}


def test_late_data_dropped(spark, tmp_path):
    """Two micro-batches: batch 2 contains an event older than the advanced
    watermark → it must be excluded from its (already finalized) window."""
    import time

    path = str(tmp_path / "late_events")
    schema = "event_id long, ts timestamp, user_id long, event_type string"

    def write_batch(rows):
        pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        # one file per batch → deterministic micro-batch boundaries
        spark.createDataFrame(pdf, schema=schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    write_batch([(1, "2024-01-01 00:10:00", 1, "view")])
    stream = spark.readStream.schema(
        spark.read.parquet(path).schema
    ).option("maxFilesPerTrigger", "1").parquet(path)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late_sink")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a fresh event far ahead — after it, watermark = 05:50
        write_batch([(2, "2024-01-01 06:00:00", 2, "view")])
        q.processAllAvailable()
        # batch 3: a LATE event for hour 0 (watermark already past) — must be
        # dropped; its batch also finalizes+emits the hour-0 window
        write_batch([(3, "2024-01-01 00:20:00", 3, "view")])
        q.processAllAvailable()
        # one more advance so anything pending flushes
        write_batch([(4, "2024-01-01 07:00:00", 4, "view")])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["ws"].isoformat(): r["n"] for r in spark.table("t_late_sink").collect()}
    # hour-0 window: only the on-time event; the late arrival (id=3) dropped
    assert rows.get("2024-01-01T00:00:00") == 1


def test_late_audit_metric_counts_state_groups(spark, tmp_path):
    """Pin the discovered granularity of ``numRowsDroppedByWatermark``: it
    counts rows entering the state store — i.e. post-partial-aggregation
    (window, type) groups — not raw late rows.  Controlled replay: one
    on-time batch, one heartbeat, one late batch of 4 raw rows spanning 2
    distinct closed windows in a single input partition → metric must be 2,
    while the audit row reports all 4."""
    import glob
    import os
    import shutil

    def slice_file(rows, i):
        df = spark.createDataFrame(
            rows, "event_id long, s string, event_type string"
        ).select("event_id", F.col("s").cast("timestamp").alias("ts"), "event_type")
        tmp = str(tmp_path / f"s{i}")
        df.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = str(tmp_path / "replay" / f"batch_{i:03d}.parquet")
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.move(part, dst)
        os.utime(dst, (1_700_000_000 + 100 * i,) * 2)

    # on-time batch: max ts 2024-01-03 00:00 → wm = Jan 2 00:00 after 24h
    slice_file([(1, "2024-01-03 00:00:00", "view")], 0)
    # heartbeat (min ts of the on-time data in the real operator; here any
    # row that does not raise the max)
    slice_file([(2, "2024-01-02 12:00:00", "view")], 1)
    # late: 4 raw rows, 2 distinct closed hour-windows (ends Jan 1 01:00 /
    # 02:00, both <= wm Jan 2 00:00)
    slice_file(
        [
            (3, "2024-01-01 00:10:00", "view"),
            (4, "2024-01-01 00:20:00", "view"),
            (5, "2024-01-01 01:10:00", "view"),
            (6, "2024-01-01 01:20:00", "view"),
        ],
        2,
    )
    replay = str(tmp_path / "replay")
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    agg = (
        stream.withWatermark("ts", "24 hours")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .count()
    )
    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(lambda b, e: b.count())
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drops = [
        so["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        for so in p["stateOperators"]
    ]
    assert sum(drops) == 2, drops  # groups, not the 4 raw rows


def test_late_audit_sentinel_nonvacuous(spark, sf_dir):
    """The fixture replay must actually drop rows (otherwise the audit query
    proves nothing) and kept + dropped must reconstruct the full table."""
    from hadoopmapreduce_spark.streaming.windowed import streaming_late_data_audit
    from hadoopmapreduce_spark.catalog import load_table

    rows = streaming_late_data_audit(spark, sf_dir).collect()
    dropped = [r for r in rows if r["event_type"] == "__late_dropped__"]
    assert len(dropped) == 1 and dropped[0]["n_events"] > 0
    total = sum(r["n_events"] for r in rows)
    assert total == load_table(spark, sf_dir, "events").count()


def test_dim_refresh_sees_both_versions(spark, sf_dir):
    """Epoch 0 must enrich via dim v1 (no _MIGRATED suffix) and later epochs
    via v2 — so the output contains migrated segments, and only migrated
    rows from the non-first slices (the oracle pins exact counts; this pins
    non-vacuity of the version switch)."""
    from hadoopmapreduce_spark.streaming.windowed import (
        streaming_dim_refresh_enrich,
    )

    rows = streaming_dim_refresh_enrich(spark, sf_dir).collect()
    segs = {r["segment"] for r in rows}
    assert any(s.endswith("_MIGRATED") for s in segs)
    assert any(not s.endswith("_MIGRATED") for s in segs)
