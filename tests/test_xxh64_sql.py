"""The DuckDB XXH64 port (functions/xxh64_sql.py) must agree with Spark's
``xxhash64`` bit-for-bit on every code path: the BIGINT fast path, each
string-length branch (empty / byte tail / 4-byte tail / 8-byte chunks /
exact and off-by-one stripe boundaries), multibyte UTF-8, and multi-column
seed chaining."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from hadoopmapreduce_spark.functions import xxh64_sql as X

EDGE_STRINGS = [
    "",                # zero-length: skips every loop
    "a",               # 1-byte tail only
    "abc",             # 3-byte tail
    "abcd",            # exactly the 4-byte chunk
    "abcdefg",         # 4-byte chunk + 3-byte tail
    "abcdefgh",        # exactly one 8-byte chunk
    "abcdefghijklmnop",  # two 8-byte chunks
    "0123456789012345678901234567890",   # 31B: max tail-only
    "01234567890123456789012345678901",  # 32B: exactly one stripe
    "x" * 33,          # stripe + 1-byte tail
    "y" * 64,          # two stripes exactly
    "z" * 100,         # stripes + 4B chunk + bytes
    "héllo wörld ünïcode",  # multibyte UTF-8 (hashes bytes, not chars)
]
EDGE_LONGS = [0, 1, -1, 42, 2**62, -(2**62), -9223372036854775808]


def test_duckdb_long_path_matches_spark(spark):
    expected = {
        r.v: r.h
        for r in spark.createDataFrame([(v,) for v in EDGE_LONGS], "v long")
        .select("v", F.xxhash64("v").alias("h"))
        .collect()
    }
    steps: list[tuple[str, str]] = []
    out = X.hash_long_steps(steps, "v", "42::HUGEINT", "L")
    vals = ",".join(f"(CAST({v} AS BIGINT))" for v in EDGE_LONGS)
    sql = X.steps_to_sql(
        f"SELECT * FROM (VALUES {vals}) t(v)",
        steps,
        f"SELECT v, {X.signed_col(out)} AS h FROM __LAST__",
    )
    for v, h in duckdb.connect().execute(sql).fetchall():
        assert h == expected[v], (v, h, expected[v])


def test_duckdb_string_path_matches_spark(spark):
    expected = {
        r.s: r.h
        for r in spark.createDataFrame(
            [(s,) for s in EDGE_STRINGS], "s string"
        )
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    }
    steps: list[tuple[str, str]] = []
    out = X.hash_string_steps(steps, "s", "42::HUGEINT", "S")
    vals = ",".join("('" + s.replace("'", "''") + "')" for s in EDGE_STRINGS)
    sql = X.steps_to_sql(
        f"SELECT * FROM (VALUES {vals}) t(s)",
        steps,
        f"SELECT s, {X.signed_col(out)} AS h FROM __LAST__",
    )
    for s, h in duckdb.connect().execute(sql).fetchall():
        assert h == expected[s], (repr(s), h, expected[s])


def test_duckdb_chained_seed_matches_spark(spark):
    rows = [(k, s) for k, s in zip(EDGE_LONGS, EDGE_STRINGS)]
    expected = {
        r.k: r.h
        for r in spark.createDataFrame(rows, "k long, s string")
        .select("k", F.xxhash64("k", "s").alias("h"))
        .collect()
    }
    steps: list[tuple[str, str]] = []
    h1 = X.hash_long_steps(steps, "k", "42::HUGEINT", "C1")
    out = X.hash_string_steps(steps, "s", h1, "C2")
    vals = ",".join(
        f"(CAST({k} AS BIGINT), '" + s.replace("'", "''") + "')" for k, s in rows
    )
    sql = X.steps_to_sql(
        f"SELECT * FROM (VALUES {vals}) t(k, s)",
        steps,
        f"SELECT k, {X.signed_col(out)} AS h FROM __LAST__",
    )
    for k, h in duckdb.connect().execute(sql).fetchall():
        assert h == expected[k], (k, h, expected[k])
