"""Table catalog over the driver-generated parquet fixtures.

Datasets are directories-of-files in the reference's world
(``ClickThru.java:53-56`` binds input dirs of JSON-lines text); here a dataset
is a parquet table loaded through the vectorized reader, so column pruning and
predicate pushdown reach the scan for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_session_confs(spark: SparkSession) -> None:
    """Runtime-settable confs every query depends on, set defensively so
    results don't depend on how the calling session was built:

    * UTC session timezone — DuckDB timestamps are UTC-naive; any other TZ
      shifts ``to_date``/``date_trunc`` results.
    * ``nanosAsLong`` — Spark 4 refuses INT64 TIMESTAMP(NANOS) parquet
      columns (``events.ts``); read as long and convert explicitly.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Plain parquet scan — kept lazy so Catalyst can
    prune columns/row-groups per consuming query.

    ``events.ts`` is nanosecond-precision parquet; it is surfaced as a
    microsecond ``timestamp`` via integer division (truncation — exactly what
    DuckDB does when it reads the same column, so oracle parity holds).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    _ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for the SQL-API paths)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
