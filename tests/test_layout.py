"""Layout/maintenance semantics: Morton key math vs a pure-Python oracle,
compaction file-count contraction, and the partition-pruning plan assert."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _py_morton(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python(spark):
    from hadoopmapreduce_spark.operators.layout import _z_spark

    probes = [(0, 0), (1, 0), (0, 1), (5, 9), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(probes, "x long, y long").withColumn(
        "z", F.expr(_z_spark("x", "y"))
    )
    for r in df.collect():
        assert r.z == _py_morton(r.x, r.y), (r.x, r.y)


def test_zorder_locality(spark):
    """Points close in (x, y) share high z-bits: the 2x2 block (0,0)-(1,1)
    must occupy z 0..3 — the property file skipping relies on."""
    from hadoopmapreduce_spark.operators.layout import _z_spark

    df = spark.createDataFrame(
        [(x, y) for x in range(2) for y in range(2)], "x long, y long"
    ).withColumn("z", F.expr(_z_spark("x", "y")))
    assert sorted(r.z for r in df.collect()) == [0, 1, 2, 3]


def test_compaction_shrinks_files_and_preserves_rows(spark, tmp_path):
    from hadoopmapreduce_spark.operators.layout import compact_parquet_dir

    frag = str(tmp_path / "frag")
    packed = str(tmp_path / "packed")
    df = spark.range(10_000).withColumn("k", F.col("id") % 7)
    df.repartition(32).write.parquet(frag)
    n_in = sum(1 for f in os.listdir(frag) if f.endswith(".parquet"))
    n_out = compact_parquet_dir(spark, frag, packed, target_bytes=64 << 20)
    assert n_in == 32 and n_out < n_in
    back = spark.read.parquet(packed)
    assert back.count() == 10_000
    assert back.agg(F.sum("id")).collect()[0][0] == 10_000 * 9_999 // 2


def test_partitioned_sink_prunes(spark, tmp_path):
    """The filtered read-back of a hive-partitioned write must prune at the
    partition level (PartitionFilters in the scan), not post-filter rows."""
    out = str(tmp_path / "byk")
    spark.range(1_000).withColumn(
        "k", (F.col("id") % 4).cast("string")
    ).write.partitionBy("k").parquet(out)
    scan = spark.read.parquet(out).filter(F.col("k") == "2")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(k" in plan, plan[:800]
    assert scan.count() == 250
