#!/usr/bin/env python
"""Run the DuckDB differential oracle for selected queries (or all).

Usage: python scripts/oracle_sweep.py <sf_dir> [query ...]

Prints one line per query: OK/FAIL (rows-only queries are skipped with a
note).  Exit code 1 if anything failed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoopmapreduce_spark import registry  # noqa: E402
from hadoopmapreduce_spark.oracle import compare, duckdb_connect  # noqa: E402
from hadoopmapreduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    registry.load_all()
    names = sys.argv[2:] or sorted(registry.QUERIES)
    spark = get_spark("hmr-oracle-sweep")
    con = duckdb_connect(sf_dir)
    bad = 0
    for name in names:
        sql = registry.ORACLES.get(name)
        if sql is None:
            print(f"{name}: rows-only (no oracle)")
            continue
        try:
            rep = compare(name, registry.QUERIES[name](spark, sf_dir), con, sql)
        except Exception as e:
            print(f"{name}: ERROR {e}")
            bad += 1
            continue
        if rep.ok:
            print(f"{name}: OK")
        else:
            print(f"{name}: FAIL {rep.detail[:300]}")
            bad += 1
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
