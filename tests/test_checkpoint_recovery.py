"""Streaming fault tolerance: a checkpointed query restarted after a stop
resumes from its offsets — already-processed input is not recounted
(exactly-once state), new input is."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def test_checkpoint_restart_exactly_once(spark, tmp_path):
    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, ts timestamp, user_id long"

    def write_batch(rows):
        pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf, schema=schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def start_query(name):
        stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        counts = stream.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        return (
            counts.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    write_batch([(1, "2024-01-01 00:00:00", 1), (2, "2024-01-01 00:01:00", 1)])
    q = start_query("t_ckpt_run1")
    q.awaitTermination()
    first = {r["user_id"]: r["n"] for r in spark.table("t_ckpt_run1").collect()}
    assert first == {1: 2}

    # new data arrives while the query is DOWN; the restart must pick up
    # only from the recorded offsets and still produce correct totals
    write_batch([(3, "2024-01-01 00:02:00", 1), (4, "2024-01-01 00:03:00", 2)])
    q2 = start_query("t_ckpt_run2")
    q2.awaitTermination()
    second = {r["user_id"]: r["n"] for r in spark.table("t_ckpt_run2").collect()}
    assert second == {1: 3, 2: 1}

    # a third restart with NO new data runs no batch at all — its sink stays
    # empty, which is exactly-once in action (nothing is reprocessed or
    # re-emitted; the recorded offsets already cover the whole source)
    q3 = start_query("t_ckpt_run3")
    q3.awaitTermination()
    assert spark.table("t_ckpt_run3").count() == 0
