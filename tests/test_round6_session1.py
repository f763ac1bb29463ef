"""Round-6 session tests: edges of the pmi_top_pairs rewrite (the round's
one production-code change — VERDICT r5 ask #2)."""

from __future__ import annotations


def test_pmi_rank_empty_input_keeps_schema(spark, sf_dir):
    """An empty top slice (e.g. min-count prunes everything at a tiny SF)
    must still return the full 5-column schema so the driver's schema
    check cannot flip on degenerate inputs."""
    from hadoopmapreduce_spark.operators.textops import _pmi_rank, _pmi_scored_top

    top = _pmi_scored_top(spark, sf_dir)
    empty = _pmi_rank(spark, top.limit(0))
    assert empty.columns == ["w1", "w2", "c_xy", "assoc", "rk"]
    assert empty.count() == 0
    assert [f.dataType.simpleString() for f in empty.schema.fields] == [
        "string", "string", "bigint", "double", "int"
    ]


def test_pmi_rank_matches_legacy_window_semantics(spark, sf_dir):
    """The orderBy+limit+enumerate rewrite must reproduce the original
    row_number()-over-global-Window results exactly (same rows, same
    ranks, bit-identical assoc doubles)."""
    from pyspark.sql import Window, functions as F

    from hadoopmapreduce_spark.operators.textops import (
        PMI_TOP_N,
        _pmi_scored_top,
        pmi_top_pairs,
    )

    new = pmi_top_pairs(spark, sf_dir).collect()
    # legacy plan, reconstructed from the pre-rewrite implementation
    scored = _pmi_scored_top(spark, sf_dir)  # already limited; undo nothing —
    # the scored set below the cut is what both plans rank identically
    w = Window.orderBy(F.desc("assoc"), F.asc("w1"), F.asc("w2"))
    legacy = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= PMI_TOP_N)
        .collect()
    )
    assert [tuple(r) for r in new] == [tuple(r) for r in legacy]
