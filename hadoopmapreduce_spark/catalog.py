"""Table catalog over the driver-generated parquet fixtures.

Datasets are directories-of-files in the reference's world
(``ClickThru.java:53-56`` binds input dirs of JSON-lines text); here a dataset
is a parquet table loaded through the vectorized reader, so column pruning and
predicate pushdown reach the scan for free.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructType

# (abspath(sf_dir), table) -> StructType; see load_table
_SCHEMA_CACHE: dict[tuple[str, str], StructType] = {}

# sessions _ensure_session_confs already configured (weak: a stopped
# session's entry dies with it, and id-reuse can't false-positive)
_CONFIGURED_SESSIONS: weakref.WeakSet = weakref.WeakSet()

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
    # one py4j round trip per conf.set; skip once this session is known
    # to be configured (queries never unset these)
    if spark in _CONFIGURED_SESSIONS:
        return
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _CONFIGURED_SESSIONS.add(spark)


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
    path = f"{sf_dir}/{name}.parquet"
    # Schema cache — the metastore role: spark.read.parquet() infers the
    # schema EAGERLY (a footer-read JVM round trip per call, ~40-170 ms),
    # and every query pays it 1-4× per build.  The fixture files are
    # immutable per (dir, table) within a session, so the DDL is cached
    # and passed explicitly; scan-time footer reads (row groups, stats,
    # pushdown) are unaffected.  Metadata only — never row data.
    key = (os.path.abspath(sf_dir), name)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    if name == "events":
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            # New fixtures store TIMESTAMP_NTZ; surface as TIMESTAMP (LTZ,
            # session tz pinned UTC above) so downstream epoch math
            # (``ts.cast("bigint")`` etc.) keeps working — NTZ forbids it.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _size_bytes(conf_value: str) -> int:
    """Parse a Spark byte-size conf string ("128m", "1g", "134217728b")."""
    s = conf_value.strip().lower()
    mult = 1
    for suffix, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("b", 1)):
        if s.endswith(suffix):
            s = s[: -len(suffix)]
            mult = m
            break
    return int(float(s)) * mult


def spread_for_expansion(
    df: DataFrame, spark: SparkSession, sf_dir: str, *names: str
) -> DataFrame:
    """Round-robin repartition ``df`` to the session parallelism IFF the
    scan of ``names`` under ``sf_dir`` produces fewer input splits than
    there are cores — i.e. only when the scan cannot spread the downstream
    work by itself.

    Why: a per-row EXPANSION stage (n-gram explode, blob decode, a
    broadcast-join probe scan) does orders of magnitude more work per
    input byte than the scan, and Spark parallelizes it at the scan's
    split granularity.  A small input (few files / few row groups — the
    fixture tables are single-row-group files, so exactly ONE task) runs
    the whole expansion on one core: the measured chrF gram explode+count
    was 17.2s single-task vs 2.8s after spreading at sf0.1/32 cores.

    Scale posture: the split estimate is bytes / maxPartitionBytes, so at
    production scale (thousands of splits) this is a NO-OP — the guard
    makes the repartition input-size-derived rather than a local[32] tune,
    and the shuffle it inserts only ever moves an input that is smaller
    than cores × maxPartitionBytes.  Round-robin repartition is
    deterministic under retries (sortBeforeRepartition is on by default)
    and never changes keyed-aggregation/join results — apply it only
    upstream of order-insensitive logic (everything oracle-checked here
    is)."""
    if os.environ.get("SPARK_GRAFT_NO_SPREAD") == "1":  # measurement A/B
        return df
    try:
        max_split = _size_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")
        )
    except Exception:
        max_split = 128 << 20
    total = 0
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.isdir(path):
            for root, _dirs, files in os.walk(path):
                total += sum(
                    os.path.getsize(os.path.join(root, f)) for f in files
                )
        elif os.path.exists(path):
            total += os.path.getsize(path)
    par = spark.sparkContext.defaultParallelism
    if total == 0 or (total + max_split - 1) // max_split >= par:
        return df
    return df.repartition(par)


def load_spread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``load_table`` + ``spread_for_expansion`` in one call — the loader
    for sites whose next stage does heavy per-row expansion work (n-gram
    explodes, blob synth/decode, broadcast-join probe scoring)."""
    return spread_for_expansion(
        load_table(spark, sf_dir, name), spark, sf_dir, name
    )


def scratch_base() -> str:
    """Fastest writable local scratch for checkpoints, streaming state and
    sink round-trips: ``$SPARK_GRAFT_SCRATCH`` if set, else ``/dev/shm``
    when writable (RAM-backed tmpfs — this host's fast local storage; the
    cluster-scale analogue is the executor-local NVMe every production
    deployment points state/shuffle scratch at), else the system tempdir.
    Measured on the stream-stream outer join at sf0.1: the per-partition
    HDFSBackedStateStore delta-file commits are fsync-bound on ext4 /tmp —
    4.8 s → 2.4 s end-to-end with the checkpoint+sink on tmpfs."""
    import tempfile

    base = os.environ.get("SPARK_GRAFT_SCRATCH")
    if base:
        return base
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        return shm
    return tempfile.gettempdir()


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
    path = os.path.join(scratch_base(), f"hmr_{name}_{key}")
    if fresh and os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    return path


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for the SQL-API paths)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
