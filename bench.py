#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed to completion via a count-style action (the driver
never sees the rows; we still force full materialization of the result).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoopmapreduce_spark import registry  # noqa: E402
from hadoopmapreduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    registry.load_all()
    spark = get_spark("hadoopmapreduce-spark-bench")

    timings: dict[str, float] = {}
    # warm the JVM + parquet footer caches once so per-query numbers measure
    # the query, not session startup
    try:
        registry.QUERIES["ctr_flagship"](spark, sf_dir).count()
    except Exception as e:
        print(f"bench: warm-up failed ({e}); continuing", file=sys.stderr)

    for name in sorted(registry.QUERIES):
        fn = registry.QUERIES[name]
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as e:  # record failures, don't kill the whole bench
            timings[name] = -1.0
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)
            continue
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
