"""Table catalog over the driver-generated parquet fixtures.

Datasets are directories-of-files in the reference's world
(``ClickThru.java:53-56`` binds input dirs of JSON-lines text); here a dataset
is a parquet table loaded through the vectorized reader, so column pruning and
predicate pushdown reach the scan for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

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

    ``events.ts`` has shipped in two fixture generations: INT64
    TIMESTAMP(NANOS) (surfaced as ``long`` via ``nanosAsLong``, converted to a
    microsecond ``timestamp`` by integer division — the same truncation DuckDB
    applies, so oracle parity holds) and, since round 4, plain
    TIMESTAMP(MICROS) (no conversion needed).  Branch on the type actually
    read so both generations load identically.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    _ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            # New fixtures store TIMESTAMP_NTZ; surface as TIMESTAMP (LTZ,
            # session tz pinned UTC above) so downstream epoch math
            # (``ts.cast("bigint")`` etc.) keeps working — NTZ forbids it.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def work_dir(name: str, sf_dir: str, fresh: bool = False) -> str:
    """Deterministic scratch directory per (operator, fixture dir).

    Operators that materialize intermediate files (compaction, CSV round
    trip, partitioned sinks, streaming snapshots) write here instead of a
    fresh ``mkdtemp`` per call, so repeat invocations (bench best-of-N,
    repeated adjudication) overwrite one bounded directory rather than
    accumulating dataset-sized copies in /tmp.  ``fresh=True`` clears the
    directory first — required by operators that append versioned state or
    streaming checkpoints (stale checkpoints would mark the replay as
    already processed).  Concurrent sessions driving the same operator on
    the same fixture would share (and race on) this path; the harness runs
    one driver at a time."""
    import hashlib
    import shutil
    import tempfile

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"hmr_{name}_{key}")
    if fresh and os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    return path


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for the SQL-API paths)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
