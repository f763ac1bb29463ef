"""Lakehouse table-format connectors (Delta Lake / Iceberg / Hudi) — STUBS.

The format jars are not on this build's classpath (no network installs in
the v1 image), so these raise with a clear message instead of failing deep
inside py4j.  The call shapes are the real ones: when the jar is present the
bodies become one-liners and nothing else in the engine changes (they are
ordinary DataFrame sources/sinks to every operator here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_INSTALL_HINT = (
    "requires the {fmt} runtime jar on the Spark classpath "
    "(spark.jars.packages={pkg}); not available in this build"
)


def _jar_available(spark: SparkSession, cls: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(cls)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.format("delta").load(path)`` once delta-spark is on the
    classpath; ACID reads + time travel via .option("versionAsOf", n)."""
    if not _jar_available(spark, "org.apache.spark.sql.delta.DeltaLog"):
        raise NotImplementedError(
            _INSTALL_HINT.format(fmt="Delta Lake", pkg="io.delta:delta-spark_2.13")
        )
    return spark.read.format("delta").load(path)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """``spark.table("catalog.db.tbl")`` through an Iceberg catalog; hidden
    partitioning means partition pruning needs no partition columns in
    queries."""
    if not _jar_available(spark, "org.apache.iceberg.Table"):
        raise NotImplementedError(
            _INSTALL_HINT.format(
                fmt="Apache Iceberg", pkg="org.apache.iceberg:iceberg-spark-runtime"
            )
        )
    return spark.table(table)


def merge_upsert_delta(
    spark: SparkSession, target_path: str, updates: DataFrame, key: str
) -> None:
    """MERGE INTO (CDC/SCD upsert).  Without Delta, the batch-parquet
    emulation is: anti-join target on key → union updates → rewrite —
    implemented in tests/test_sources_sinks.py's merge emulation if needed."""
    raise NotImplementedError(
        _INSTALL_HINT.format(fmt="Delta Lake", pkg="io.delta:delta-spark_2.13")
    )
