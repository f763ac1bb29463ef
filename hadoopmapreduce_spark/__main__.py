"""Drop-in CLI for the reference pipeline.

The reference is invoked as
``hadoop jar ClickThru.jar ClickThru <impressions> <clicks> <combined> <output>``
(arity checked at ``ClickThru.java:35-39``, exit 1 on misuse; ``combined`` is
the intermediate directory job 1 materializes and job 2 re-reads).

This module is the same contract:

    python -m hadoopmapreduce_spark <impressions> <clicks> <combined> <output>

* ``<impressions>``/``<clicks>``: dirs of (junk-prefix-tolerant) JSON-lines.
* ``<combined>``: written in the reference's job-1 byte format
  (``0\\t{referrer/x1fadId/x1e<flag>`` lines) for interoperability with
  tooling that consumed the reference's intermediate — the engine itself
  does NOT read it back (one DAG, no materialization barrier).
* ``<output>``: the reference's job-2 text shape ``[url, adID]\\t<ctr>``,
  with the CTR rendered through float32 shortest-roundtrip formatting to
  match Java's ``Float.toString`` (the reference computes CTR in 32-bit
  float, ``ClickThru.java:179-186``).
"""

from __future__ import annotations

import sys

_SUBCOMMAND_USAGE = """\
usage: python -m hadoopmapreduce_spark <impressions> <clicks> <combined> <out>
       python -m hadoopmapreduce_spark list
       python -m hadoopmapreduce_spark run <query_id> <sf_dir> [limit]
       python -m hadoopmapreduce_spark explain <query_id> <sf_dir>"""


def _registry_main(argv: list[str]) -> int:
    """Registry subcommands: list / run / explain over the 180+ registered
    queries — the engine as a standalone tool, beyond the reference's
    4-arg CTR contract (which stays byte-compatible below)."""
    from hadoopmapreduce_spark import registry

    registry.load_all()
    cmd = argv[0]
    if cmd == "list":
        from hadoopmapreduce_spark.registry import ORACLES, QUERIES

        for name in sorted(QUERIES):
            kind = "oracle" if name in ORACLES else "rows-only"
            print(f"{name}\t{kind}")
        return 0
    if cmd in ("run", "explain"):
        if len(argv) < 3:
            print(_SUBCOMMAND_USAGE, file=sys.stderr)
            return 1
        name, sf_dir = argv[1], argv[2]
        from hadoopmapreduce_spark.registry import QUERIES

        if name not in QUERIES:
            print(f"unknown query id {name!r} (see `list`)", file=sys.stderr)
            return 1
        from hadoopmapreduce_spark.session import get_spark

        spark = get_spark("hmr-cli")
        df = QUERIES[name](spark, sf_dir)
        if cmd == "explain":
            from hadoopmapreduce_spark.plans import physical_plan

            print(physical_plan(df))
        else:
            limit = int(argv[3]) if len(argv) > 3 else 20
            df.show(limit, truncate=False)
        return 0
    print(_SUBCOMMAND_USAGE, file=sys.stderr)
    return 1


def main(argv: list[str]) -> int:
    if argv and argv[0] in ("list", "run", "explain"):
        return _registry_main(argv)
    if len(argv) != 4:
        print(_SUBCOMMAND_USAGE, file=sys.stderr)
        return 1
    impressions, clicks, combined, output = argv

    from pyspark.sql import functions as F

    from hadoopmapreduce_spark.functions.javafmt import java_f32_str

    from hadoopmapreduce_spark.operators.clickthru import (
        IMPRESSION_SCHEMA,
        run_clickthru,
    )
    from hadoopmapreduce_spark.session import get_spark
    from hadoopmapreduce_spark.sources.jsonlines import read_jsonlines_tolerant

    spark = get_spark("clickthru-cli")

    # intermediate dir in the reference's job-1 byte format (compat artifact
    # only — the CTR below is computed from one lazy DAG, not from this file)
    rows = read_jsonlines_tolerant(spark, impressions, IMPRESSION_SCHEMA).unionByName(
        read_jsonlines_tolerant(spark, clicks, IMPRESSION_SCHEMA)
    ).filter(F.col("impressionId").isNotNull())
    impr = rows.filter(F.col("referrer").isNotNull())
    clk = rows.filter(F.col("referrer").isNull()).select("impressionId").distinct()
    flagged = impr.join(
        clk.withColumn("_c", F.lit(1)), "impressionId", "left"
    ).select(
        F.concat(
            F.lit("0\t{"),
            F.col("referrer"),
            F.lit("/x1f"),
            F.col("adId"),
            F.lit("/x1e"),
            F.when(F.col("_c").isNotNull(), F.lit("1")).otherwise(F.lit("0")),
        ).alias("value")
    )
    flagged.write.mode("overwrite").text(combined)

    result = run_clickthru(spark, impressions, clicks)

    lines = result.select(
        F.concat(
            F.lit("["),
            F.col("referrer"),
            F.lit(", "),
            F.col("ad_id"),
            F.lit("]\t"),
            java_f32_str(F.col("ctr")),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(output)
    print(f"CTR written to {output} ({result.count()} groups)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
