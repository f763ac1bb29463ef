#!/usr/bin/env python
"""Dump `.explain("formatted")` for one or more queries to plans/<dir>/.

Usage: python scripts/explain_dump.py <suffix> <query> [<query> ...]

Writes plans/r13/<query>_<suffix>.txt for each query (suffix is typically
"before" or "after").  Planning only — nothing is executed, so this is safe
to run while other Spark work is in flight (plans are load-independent).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoopmapreduce_spark import registry  # noqa: E402
from hadoopmapreduce_spark.session import get_spark  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"),
)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("hadoopmapreduce-spark-explain")
    for name in names:
        fn = registry.QUERIES[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
