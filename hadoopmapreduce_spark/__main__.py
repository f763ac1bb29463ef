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


def main(argv: list[str]) -> int:
    if len(argv) != 4:
        print(
            "usage: python -m hadoopmapreduce_spark "
            "<impressions_dir> <clicks_dir> <combined_dir> <output_dir>",
            file=sys.stderr,
        )
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
