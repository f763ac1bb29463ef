"""Behavioral invariants for the seventh round-5 session's operators —
the classifier/dataset-eval family (evals.py).  Properties the
differential oracle cannot express: the Mann-Whitney pairwise identity,
gains-table conservation, probe-panel membership."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_auc_matches_pairwise_definition(spark, sf_dir):
    """The rank-identity AUC must equal the textbook pairwise count:
    2U = 2*#{(p,n): s_p > s_n} + #{(p,n): s_p = s_n}.  Quadratic cross
    join — the differential referee, run only at sf0.001 corpus size."""
    from hadoopmapreduce_spark.operators.evals import (
        _scored_docs,
        eval_auc_rank,
    )

    row = eval_auc_rank(spark, sf_dir).collect()[0]
    scored = _scored_docs(spark, sf_dir)
    pos = scored.filter("pos = 1").select(F.col("score_ppm").alias("sp"))
    neg = scored.filter("pos = 0").select(F.col("score_ppm").alias("sn"))
    pair = pos.crossJoin(neg).agg(
        F.sum(F.when(F.col("sp") > F.col("sn"), 2)
              .when(F.col("sp") == F.col("sn"), 1)
              .otherwise(0)).alias("u2"),
        F.count(F.lit(1)).alias("n_pairs"),
    ).collect()[0]
    assert row["n_pos"] * row["n_neg"] == pair["n_pairs"]
    assert row["u2"] == pair["u2"], (
        f"rank-identity 2U={row['u2']} != pairwise 2U={pair['u2']}"
    )
    assert 0 <= row["auc_ppm"] <= 1_000_000


def test_gains_table_conserves_and_accumulates(spark, sf_dir):
    """Decile positives must sum to the corpus total, docs split evenly
    (NTILE: sizes differ by at most 1), capture is nondecreasing and ends
    at exactly 1e6 ppm."""
    from hadoopmapreduce_spark.operators.evals import (
        _scored_docs,
        eval_gains_deciles,
    )

    rows = sorted(
        eval_gains_deciles(spark, sf_dir).collect(), key=lambda r: r["bin"]
    )
    assert [r["bin"] for r in rows] == list(range(1, 11))
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    totals = _scored_docs(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").alias("p")
    ).collect()[0]
    assert sum(sizes) == totals["n"]
    assert sum(r["n_pos"] for r in rows) == totals["p"]
    caps = [r["cum_capture_ppm"] for r in rows]
    assert caps == sorted(caps)
    assert caps[-1] == 1_000_000


def test_knn_noise_audit_covers_exactly_the_probe_panel(spark, sf_dir):
    """One verdict per panel member (vec_id % PROBE_MOD == 1), vote counts
    within [1, k], and the suspect flag consistent with the label pair."""
    from hadoopmapreduce_spark.catalog import load_table
    from hadoopmapreduce_spark.operators.evals import (
        NOISE_K,
        PROBE_MOD,
        eval_knn_label_noise,
    )

    out = eval_knn_label_noise(spark, sf_dir).collect()
    panel = {
        r["vec_id"]
        for r in load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % PROBE_MOD == 1)
        .select("vec_id")
        .collect()
    }
    assert {r["probe_id"] for r in out} == panel
    assert len(out) == len(panel)
    for r in out:
        assert 1 <= r["n_votes"] <= NOISE_K
        assert r["is_suspect"] == int(r["knn_label"] != r["own_label"])
