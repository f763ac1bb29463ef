"""Round-9 regression tests: the VERDICT r8 / ADVICE r8 fixes stay fixed.

* bench.py refuses to run under ``--strict`` when the 1-min loadavg
  exceeds the gate (VERDICT r8 ask #5) — a committed sidecar can never
  silently carry contaminated numbers.
* the SemDeDup assignment stage is plan-pinned shuffle-free in
  tests/test_plans.py::test_semdedup_assignment_is_shuffle_free.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_strict_refuses_on_load():
    """With the gate forced to 0, any real machine is 'loaded', so
    --strict must exit 2 BEFORE starting a JVM or touching fixtures."""
    env = dict(os.environ, SPARK_GRAFT_BENCH_LOAD_MAX="0")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--strict"],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
    )
    assert proc.returncode == 2, (proc.returncode, proc.stderr[-500:])
    assert "refusing under --strict" in proc.stderr


def test_bench_gate_constant_from_env():
    """LOAD_GATE_MAX is env-overridable (CI boxes have different idle
    floors) and defaults to 2.0."""
    import bench

    assert bench.LOAD_GATE_MAX == float(
        os.environ.get("SPARK_GRAFT_BENCH_LOAD_MAX", "2.0")
    )


def test_tiff_probe_rejects_malformed_blobs():
    """The TIFF walk must fail loudly on structural violations (the
    codec-family contract): bad byte-order mark, bad magic, truncated
    IFD, non-ascending tags, strip accounting mismatch."""
    import struct

    import pytest

    from hadoopmapreduce_spark.operators.multimodal import (
        parse_tiff_features,
        synthesize_tiff,
    )

    good = synthesize_tiff(6, 5, 42, True, 7)
    parse_tiff_features(good)  # sanity: the pristine blob parses

    with pytest.raises(ValueError):
        parse_tiff_features(b"XX" + good[2:])  # bad BOM
    with pytest.raises(ValueError):
        parse_tiff_features(good[:2] + struct.pack("<H", 43) + good[4:])
    with pytest.raises(ValueError):
        parse_tiff_features(good[:40])  # truncated mid-strip/IFD
    # swap the first two IFD entries -> tags not ascending
    ifd_off = struct.unpack_from("<I", good, 4)[0]
    e0 = ifd_off + 2
    swapped = (
        good[:e0]
        + good[e0 + 12 : e0 + 24]
        + good[e0 : e0 + 12]
        + good[e0 + 24 :]
    )
    with pytest.raises(ValueError):
        parse_tiff_features(swapped)
    # corrupt StripByteCounts (tag 279, entry index 8): value != w*h
    e8 = ifd_off + 2 + 8 * 12
    bad_cnt = good[: e8 + 8] + struct.pack("<I", 999) + good[e8 + 12 :]
    with pytest.raises(ValueError):
        parse_tiff_features(bad_cnt)


def test_tiff_endianness_is_honored():
    """The SAME logical image serialized II and MM must parse to identical
    features except the is_le flag — the byte-order gotcha (inline SHORT
    values occupy the FIRST two bytes in file order) pinned directly."""
    from hadoopmapreduce_spark.operators.multimodal import (
        parse_tiff_features,
        synthesize_tiff,
    )

    le = parse_tiff_features(synthesize_tiff(9, 4, 17, True, 5))
    be = parse_tiff_features(synthesize_tiff(9, 4, 17, False, 5))
    assert le.pop("is_le") == 1 and be.pop("is_le") == 0
    assert le == be


def test_dedup_within_watermark_cross_batch(spark, tmp_path):
    """Pins the BOUNDED-state semantics of dropDuplicatesWithinWatermark
    across micro-batches, which the registered query's fixture replay
    (one availableNow batch, horizon >= span) deliberately never hits:
    a duplicate inside the horizon is dropped, but once the watermark
    evicts the key's state, the same key is emitted AGAIN — the exact
    trade that makes infinite-stream dedup affordable."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "ev")

    def write_batch(rows):
        spark.createDataFrame(rows, "user_id long, ts string").select(
            "user_id", F.col("ts").cast("timestamp").alias("ts")
        ).coalesce(1).write.mode("append").parquet(path)

    write_batch([(1, "2024-01-01 00:00:00")])  # first arrival -> emit
    write_batch([(1, "2024-01-01 00:30:00")])  # dup inside 1h horizon -> drop
    write_batch([(9, "2024-01-03 00:00:00")])  # jumps the watermark
    # the watermark computed from a batch takes effect in the NEXT batch,
    # so a spacer batch lets the jump evict key 1's state...
    write_batch([(8, "2024-01-03 00:01:00")])
    # ...and the re-arrival after eviction is emitted AGAIN
    write_batch([(1, "2024-01-03 00:02:00")])

    stream = (
        spark.readStream.schema(spark.read.parquet(path).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    dedup = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id"])
        .select("user_id")
    )
    q = (
        dedup.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_ddww_cross_batch")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        r["user_id"]
        for r in spark.sql("SELECT * FROM t_ddww_cross_batch").collect()
    )
    assert got == [1, 1, 8, 9], got
