"""[GEN] MERGE INTO / SCD2 — lakehouse upsert semantics on plain parquet.

The reference has no mutation surface at all (append-only text sinks,
``ClickThru.java:57,76``); MERGE is mandated by the lakehouse category of
the build plan.  The Delta/Iceberg jars are not in this build, so the
registered queries drive the parquet emulation in
``sources.lakehouse.merge_upsert_parquet`` — semantics identical to
``MERGE WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT``, minus the
transaction log (snapshot-swap instead).

Both queries derive their update set deterministically from the fixtures
(key-modulus selections), so they are fully SQL-expressible and
oracle-checked — unlike round 1 where MERGE lived only in tests.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoopmapreduce_spark.catalog import load_table
from hadoopmapreduce_spark.registry import query

NEW_KEY_OFFSET = 1_000_000  # inserted keys live above any fixture custkey


def _customer_slim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.col("c_acctbal").alias("acctbal"),
    )


@query(
    "merge_upsert",
    oracle=f"""
    WITH target AS (
      SELECT c_custkey AS custkey, c_mktsegment AS mktsegment, c_acctbal AS acctbal
      FROM customer),
    updates AS (
      SELECT custkey, 'UPDATED' AS mktsegment, acctbal + 1000 AS acctbal
      FROM target WHERE custkey % 10 = 0
      UNION ALL
      SELECT custkey + {NEW_KEY_OFFSET} AS custkey, 'INSERTED' AS mktsegment,
             0.0 AS acctbal
      FROM target WHERE custkey % 97 = 0)
    SELECT custkey, mktsegment, acctbal FROM target
    WHERE custkey NOT IN (SELECT custkey FROM updates)
    UNION ALL
    SELECT custkey, mktsegment, acctbal FROM updates
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO on the customer table: every 10th key is updated in place
    (segment overwritten, balance bumped), every 97th key spawns an insert
    under a fresh key.  Runs the REAL parquet path — target snapshot written
    to disk, merged via anti-join + union, new snapshot version written and
    read back — not just an in-memory DataFrame expression."""
    from hadoopmapreduce_spark.sources.lakehouse import merge_upsert_parquet

    target = _customer_slim(spark, sf_dir)
    updates = target.filter(F.col("custkey") % 10 == 0).select(
        "custkey",
        F.lit("UPDATED").alias("mktsegment"),
        (F.col("acctbal") + 1000).alias("acctbal"),
    ).unionByName(
        target.filter(F.col("custkey") % 97 == 0).select(
            (F.col("custkey") + NEW_KEY_OFFSET).alias("custkey"),
            F.lit("INSERTED").alias("mktsegment"),
            F.lit(0.0).alias("acctbal"),
        )
    )
    tmp = tempfile.mkdtemp(prefix="hmr_merge_")
    target_path = os.path.join(tmp, "target")
    target.write.mode("overwrite").parquet(target_path)
    return merge_upsert_parquet(spark, target_path, updates, "custkey")


SCD2_INITIAL_DATE = "2024-01-01"
SCD2_AS_OF = "2024-06-01"


@query(
    "scd2_customer_history",
    oracle=f"""
    WITH dim AS (
      SELECT c_custkey AS custkey, c_name AS name,
             '{SCD2_INITIAL_DATE}' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to
      FROM customer),
    changes AS (
      SELECT custkey, name || '_v2' AS name FROM dim WHERE custkey % 7 = 0)
    SELECT custkey, name, valid_from, valid_to FROM dim
    WHERE custkey NOT IN (SELECT custkey FROM changes)
    UNION ALL
    SELECT custkey, name, valid_from, '{SCD2_AS_OF}' AS valid_to FROM dim
    WHERE custkey IN (SELECT custkey FROM changes)
    UNION ALL
    SELECT custkey, name, '{SCD2_AS_OF}' AS valid_from,
           CAST(NULL AS VARCHAR) AS valid_to
    FROM changes
    """,
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: changed rows are closed out
    (valid_to stamped) and a new open version appended; untouched rows carry
    over.  Three branches — anti-join (untouched), semi-join (closed),
    projected changes (new versions) — all equi-joins on the dimension key;
    at scale the dimension is broadcast-sized by definition."""
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.lit(SCD2_INITIAL_DATE).alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
    )
    changes = dim.filter(F.col("custkey") % 7 == 0).select(
        "custkey", F.concat(F.col("name"), F.lit("_v2")).alias("name")
    )
    change_keys = changes.select("custkey")
    untouched = dim.join(change_keys, "custkey", "left_anti")
    closed = dim.join(change_keys, "custkey", "left_semi").withColumn(
        "valid_to", F.lit(SCD2_AS_OF)
    )
    new_versions = changes.select(
        "custkey",
        "name",
        F.lit(SCD2_AS_OF).alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
    )
    return untouched.unionByName(closed).unionByName(new_versions)
