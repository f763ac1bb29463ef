"""[EXT] Classifier- and dataset-evaluation operators.

The reference (ClickThru.java) computes one fixed metric; a training-data
engine additionally needs the EVAL loop around every heuristic it ships:
threshold-free ranking quality (AUC), ranked-capture tables (gains/CAP),
and label-noise audits against the embedding space.  These join
``eval_lang_confusion`` (textops.py) as first-class corpus queries.

Determinism discipline (registry contract): every metric is exact-integer
(ppm via truncating BIGINT division — Spark ``div`` / DuckDB ``//`` both
truncate toward zero on the non-negative quantities used here); ranking
ties are either shared (RANK over the raw score, the Mann-Whitney
definition) or fully broken (``doc_id`` / ``neighbor_id`` / ``label``
tie-breaks), so both engines select identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from hadoopmapreduce_spark.catalog import load_spread, load_table
from hadoopmapreduce_spark.operators.similarity import _dot, _embeddings
from hadoopmapreduce_spark.registry import query

# Shared scorer for the binary-classifier evals: vowel density in ppm as a
# cheap "English-ness" score, judged against the labeled lang column.  The
# score itself is deliberately weak — the OPERATORS are the deliverable;
# a production pipeline plugs its quality/toxicity model score in here.
_SCORE_ORACLE = """
  SELECT doc_id,
         (1000000 * (length(text)
                     - length(regexp_replace(text, '[aeiou]', '', 'g'))))
           // greatest(length(text), 1) AS score_ppm,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
"""


def _scored_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_spread(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr(
            "(1000000 * (length(text)"
            " - length(regexp_replace(text, '[aeiou]', ''))))"
            " div greatest(length(text), 1)"
        ).alias("score_ppm"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )


@query(
    "eval_auc_rank",
    oracle=f"""
    WITH scored AS ({_SCORE_ORACLE}),
    ranked AS (
      SELECT pos,
             RANK() OVER (ORDER BY score_ppm) AS r,
             COUNT(*) OVER (PARTITION BY score_ppm) AS c
      FROM scored),
    s AS (
      SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
             CAST(SUM(1 - pos) AS BIGINT) AS n_neg,
             CAST(SUM(pos * (2 * r + c - 1)) AS BIGINT) AS sum2r
      FROM ranked)
    SELECT n_pos, n_neg,
           sum2r - n_pos * (n_pos + 1) AS u2,
           (1000000 * (sum2r - n_pos * (n_pos + 1)))
             // NULLIF(2 * n_pos * n_neg, 0) AS auc_ppm
    FROM s
    """,
)
def eval_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC-AUC via the Mann-Whitney rank identity — the
    threshold-free quality number every data-pipeline classifier (quality,
    language, toxicity) is judged by, computed without a single float:

        AUC = U / (n_pos * n_neg),   U = sum(ranks of positives) - n_pos(n_pos+1)/2

    Ties get the textbook average rank; to stay integral the whole
    derivation is carried at 2x (``2r + c - 1`` is twice the average rank
    of a tie class of size ``c`` starting at RANK() ``r``), and the final
    truncating division lands in ppm.  ``u2`` (= 2U, exact) ships alongside
    so the hash pins the full-precision statistic, not just the ppm.

    Integer bounds: ``1e6 * u2 <= 1e6 * 2 * n_docs^2`` stays under 2^63 to
    ~2.1e6 docs; past that, widen the two products to DECIMAL(38,0) /
    HUGEINT (the agg_moments pattern) — the shape is unchanged.

    Scale shape — NO per-row global window: because all positives in one
    tie class share one average rank, AUC needs only per-SCORE-CLASS
    aggregates, and ``score_ppm`` lives in a bounded domain ([0, 1e6]), so
    the class table is metadata-sized no matter the corpus.  One partial+
    final groupBy(score) collapses 100 TB to <=1e6 rows; the rank prefix
    sum runs as a window over THAT table (the dq_ks_drift band-offset
    pattern); a 3-scalar aggregate finishes.  The class contribution
    ``p_s * (2r + n_s - 1)`` is the tie-averaged 2x rank sum of the
    class's positives.  NULL auc_ppm (not a crash) when a class is empty,
    in both engines."""
    scored = _scored_docs(spark, sf_dir)
    per = scored.groupBy("score_ppm").agg(
        F.count(F.lit(1)).alias("n_s"),
        F.sum("pos").alias("p_s"),
    )
    w = W.orderBy("score_ppm").rowsBetween(W.unboundedPreceding, -1)
    classes = per.select(
        "n_s",
        "p_s",
        (F.lit(1) + F.coalesce(F.sum("n_s").over(w), F.lit(0))).alias("r"),
    )
    s = classes.agg(
        F.sum("p_s").alias("n_pos"),
        F.sum(F.col("n_s") - F.col("p_s")).alias("n_neg"),
        F.sum(F.col("p_s") * (2 * F.col("r") + F.col("n_s") - 1)).alias("sum2r"),
    )
    return s.select(
        "n_pos",
        "n_neg",
        (F.col("sum2r") - F.col("n_pos") * (F.col("n_pos") + 1)).alias("u2"),
        F.expr(
            "(1000000 * (sum2r - n_pos * (n_pos + 1)))"
            " div nullif(2 * n_pos * n_neg, 0)"
        ).alias("auc_ppm"),
    )


@query(
    "eval_gains_deciles",
    oracle=f"""
    WITH scored AS ({_SCORE_ORACLE}),
    binned AS (
      SELECT pos,
             NTILE(10) OVER (ORDER BY score_ppm DESC, doc_id) AS bin
      FROM scored),
    per AS (
      SELECT bin,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(pos) AS BIGINT) AS n_pos
      FROM binned GROUP BY 1)
    SELECT bin, n_docs, n_pos,
           (1000000 * n_pos) // n_docs AS pos_rate_ppm,
           (1000000 * CAST(SUM(n_pos) OVER (ORDER BY bin) AS BIGINT))
             // NULLIF(CAST(SUM(n_pos) OVER () AS BIGINT), 0)
             AS cum_capture_ppm
    FROM per
    """,
)
def eval_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gains / CAP table: rank the corpus by classifier score (best first),
    cut into deciles, and report each decile's positive rate plus the
    cumulative share of ALL positives captured so far — the "review the
    top-k%" curve that decides audit budgets and score thresholds.

    Determinism: NTILE over a FULLY tie-broken order (score DESC, doc_id)
    assigns identical bins in both engines (standard SQL NTILE: the first
    ``n mod 10`` bins take the extra row); every metric is a truncating
    integer ppm.  A perfect scorer captures 1e6 ppm within the positive
    deciles; a random one tracks the diagonal.

    Scale shape — NO single-partition NTILE window (the
    agg_decile_lift_table rule), and here not even a range repartition:
    ``score_ppm`` is domain-bounded ([0, 1e6]), so per-class counts give a
    broadcastable offset table, the global rank is
    ``offset(class) + row_number() within class (by doc_id)`` — a window
    DISTRIBUTED on the score key — and the bin falls out of NTILE's
    first-``n mod k``-tiles-get-one-extra arithmetic exactly as in
    agg_decile_lift_table.  Skew bound: one tie class = one partition,
    acceptable for a real-valued score; the lift-table's range-repartition
    machinery is the fallback for degenerate scorers."""
    scored = _scored_docs(spark, sf_dir)
    per_s = scored.groupBy("score_ppm").agg(
        F.count(F.lit(1)).alias("n_s")
    ).localCheckpoint(eager=True)  # one materialization, two readers
    n_total = int(per_s.agg(F.sum("n_s")).collect()[0][0])
    wd = W.orderBy(F.desc("score_ppm")).rowsBetween(W.unboundedPreceding, -1)
    off = per_s.select(
        "score_ppm",
        F.coalesce(F.sum("n_s").over(wd), F.lit(0)).alias("off"),
    )
    lw = W.partitionBy("score_ppm").orderBy("doc_id")
    ranked = scored.join(F.broadcast(off), "score_ppm").select(
        "pos", (F.col("off") + F.row_number().over(lw)).alias("rank")
    )
    q, m = n_total // 10, n_total % 10
    cutover = m * (q + 1)
    bin_col = (
        F.when(F.col("rank") <= cutover, F.expr(f"(rank - 1) div {q + 1}"))
        .otherwise(
            F.lit(m) + F.expr(f"(rank - {cutover} - 1) div {max(q, 1)}")
        )
        .cast("int")
        + 1
    )
    binned = ranked.select("pos", bin_col.alias("bin"))
    per = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("pos").alias("n_pos"),
    )
    w_cum = W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    w_all = W.partitionBy()
    return per.select(
        "bin",
        "n_docs",
        "n_pos",
        F.expr("(1000000 * n_pos) div n_docs").alias("pos_rate_ppm"),
        (F.lit(1000000) * F.sum("n_pos").over(w_cum)).alias("_cum"),
        F.nullif(F.sum("n_pos").over(w_all), F.lit(0)).alias("_tot"),
    ).withColumn(
        "cum_capture_ppm", F.expr("_cum div _tot")
    ).drop("_cum", "_tot")


PROBE_MOD = 50
NOISE_K = 5
# The audit panel is a FIXED BUDGET, not a fixed rate: vec_id % 50 == 1
# capped to the first PANEL_MAX hits.  A label-noise/NDCG audit feeds a
# human-review queue, so its size must not grow with the corpus — and a
# rate-based panel makes the exact scorer quadratic (probes x corpus):
# measured 36x wall at 9x data on the sf0.9 fixture before the cap, ~9x
# (linear) after.  The cap leaves every fixture <= sf0.1 unchanged.
PANEL_MAX = 100
PROBE_CAP = PROBE_MOD * PANEL_MAX

# Shared CTE chain (through the tie-broken top-k with its rank) for the two
# neighbor-based evals — the SQL twin of :func:`_probe_topk`.
_TOPK_CTES = f"""
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
          FROM embeddings),
    n AS (SELECT vec_id, v, label,
                 sqrt(list_dot_product(v, v)) AS nrm FROM e),
    q AS (SELECT * FROM n
          WHERE vec_id % {PROBE_MOD} = 1 AND vec_id < {PROBE_CAP}),
    scored AS (
      SELECT q.vec_id AS probe_id, q.label AS own_label,
             c.label AS nbr_label,
             list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cosine,
             c.vec_id AS neighbor_id
      FROM q JOIN n c ON q.vec_id <> c.vec_id),
    top AS (
      SELECT probe_id, own_label, nbr_label, rk FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                   ORDER BY cosine DESC, neighbor_id) AS rk
        FROM scored) t
      WHERE rk <= {NOISE_K})
"""


def _probe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(probe_id, own_label, nbr_label, rk): the ``NOISE_K`` cosine-nearest
    corpus neighbors of each probe-panel member, rank fully tie-broken
    (cosine DESC, neighbor_id).  Broadcast probes against one corpus scan —
    knn_cosine_topk's green shape; shared by the label-noise audit and the
    NDCG eval."""
    n = _embeddings(spark, sf_dir)
    lbl = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    n = n.join(lbl, "vec_id")
    q = n.filter(
        (F.col("vec_id") % PROBE_MOD == 1) & (F.col("vec_id") < PROBE_CAP)
    ).select(
        F.col("vec_id").alias("probe_id"),
        F.col("label").alias("own_label"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    scored = n.join(
        F.broadcast(q), F.col("vec_id") != F.col("probe_id")
    ).select(
        "probe_id",
        "own_label",
        F.col("label").alias("nbr_label"),
        (_dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm"))).alias(
            "cosine"
        ),
        F.col("vec_id").alias("neighbor_id"),
    )
    w = W.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= NOISE_K)
        .select("probe_id", "own_label", "nbr_label", "rk")
    )


@query(
    "eval_knn_label_noise",
    oracle=f"""
    WITH {_TOPK_CTES},
         votes AS (
           SELECT probe_id, own_label, nbr_label,
                  CAST(COUNT(*) AS BIGINT) AS n_votes
           FROM top GROUP BY 1, 2, 3)
    SELECT probe_id, own_label,
           nbr_label AS knn_label, n_votes,
           CASE WHEN nbr_label <> own_label THEN 1 ELSE 0 END AS is_suspect
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                     ORDER BY n_votes DESC, nbr_label) AS vrk
          FROM votes) v
    WHERE vrk = 1
    """,
)
def eval_knn_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LABEL-NOISE AUDIT by k-NN disagreement (Confident-Learning family):
    for a fixed probe panel, find the 5 cosine-nearest neighbors in the
    full corpus and compare the majority neighbor label with the point's
    own label — a mismatch flags a likely mislabel for human review.  This
    is the standard pre-training label-QA pass over an embedded dataset.

    Reuses the oracle-green exact-cosine machinery of ``knn_cosine_topk``
    (broadcast probes, sequential-fold dot product identical to DuckDB's
    ``list_dot_product``, fully tie-broken top-k), then a per-probe
    majority vote tie-broken on the smaller label.

    Scale shape: probes are a fixed-budget panel (PANEL_MAX); the corpus side is one
    scan with the probe panel broadcast (linear, no shuffle).  At 100 TB
    the exact scorer is the REFEREE run on samples exactly like this —
    the full-corpus audit swaps in ``ann_lsh_topk``'s bucketed candidate
    generation and keeps the vote/flag tail unchanged."""
    top = _probe_topk(spark, sf_dir)
    votes = top.groupBy("probe_id", "own_label", "nbr_label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    wv = W.partitionBy("probe_id").orderBy(
        F.desc("n_votes"), F.asc("nbr_label")
    )
    return (
        votes.withColumn("vrk", F.row_number().over(wv))
        .filter(F.col("vrk") == 1)
        .select(
            "probe_id",
            "own_label",
            F.col("nbr_label").alias("knn_label"),
            "n_votes",
            F.when(F.col("nbr_label") != F.col("own_label"), 1)
            .otherwise(0)
            .alias("is_suspect"),
        )
    )


# 1/log2(i+1) in ppm, precomputed so no libm log crosses the engine
# boundary (the _BENFORD_PPM pattern); _IDCG_PPM[k] is the ideal DCG of k
# relevant results — the prefix sums of the discount ladder.
_DISC_PPM = {1: 1000000, 2: 630930, 3: 500000, 4: 430677, 5: 386853}
_IDCG_PPM = {1: 1000000, 2: 1630930, 3: 2130930, 4: 2561607, 5: 2948460}

_DISC_CASE = "CASE rk " + " ".join(
    f"WHEN {i} THEN {p}" for i, p in _DISC_PPM.items()
) + " ELSE 0 END"
_IDCG_CASE = "CASE n_rel " + " ".join(
    f"WHEN {i} THEN {p}" for i, p in _IDCG_PPM.items()
) + " ELSE 0 END"


@query(
    "eval_ndcg_label_match",
    oracle=f"""
    WITH {_TOPK_CTES},
    per AS (
      SELECT probe_id, own_label,
             CAST(SUM(CASE WHEN nbr_label = own_label
                           THEN {_DISC_CASE} ELSE 0 END) AS BIGINT)
               AS dcg_ppm,
             CAST(SUM(CASE WHEN nbr_label = own_label THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_rel
      FROM top GROUP BY 1, 2)
    SELECT probe_id, own_label, n_rel, dcg_ppm,
           CAST({_IDCG_CASE} AS BIGINT) AS idcg_ppm,
           (1000000 * dcg_ppm) // NULLIF(CAST({_IDCG_CASE} AS BIGINT), 0)
             AS ndcg_ppm
    FROM per
    """,
)
def eval_ndcg_label_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@5 of the embedding space as a retrieval index, with "neighbor
    shares my label" as the graded relevance — the standard ranking-quality
    number for an embedding model drop (did the new checkpoint still put
    same-class items first?), computed per probe-panel member.

    Exact integers end to end: the log2 position discounts are PRECOMPUTED
    ppm constants (no runtime libm — the dq_benford_first_digit rule), DCG
    is an integer dot of the relevance vector with that ladder, ideal DCG
    for binary relevance is the ladder's prefix sum at n_rel, and NDCG is
    one truncating ppm division.  NULL ndcg_ppm (not a crash) for probes
    with zero relevant neighbors, in both engines.

    Scale shape: everything downstream of the shared broadcast top-k
    (:func:`_probe_topk`) is a panel-sized groupBy — the corpus is touched
    exactly once."""
    top = _probe_topk(spark, sf_dir)
    rel = F.when(F.col("nbr_label") == F.col("own_label"), 1).otherwise(0)
    per = top.groupBy("probe_id", "own_label").agg(
        F.sum(
            F.when(
                F.col("nbr_label") == F.col("own_label"),
                F.expr(_DISC_CASE),
            ).otherwise(0)
        ).alias("dcg_ppm"),
        F.sum(rel).alias("n_rel"),
    )
    return per.select(
        "probe_id",
        "own_label",
        "n_rel",
        "dcg_ppm",
        F.expr(f"CAST({_IDCG_CASE} AS BIGINT)").alias("idcg_ppm"),
        F.expr(
            f"(1000000 * dcg_ppm) div nullif(CAST({_IDCG_CASE} AS BIGINT), 0)"
        ).alias("ndcg_ppm"),
    )


CALIB_BINS = 10


@query(
    "eval_calibration_bins",
    oracle=f"""
    WITH scored AS ({_SCORE_ORACLE}),
    binned AS (
      SELECT least(score_ppm // {1000000 // CALIB_BINS}, {CALIB_BINS - 1})
               + 1 AS bin,
             score_ppm, pos
      FROM scored)
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(SUM(score_ppm) AS BIGINT) // COUNT(*) AS mean_score_ppm,
           (1000000 * CAST(SUM(pos) AS BIGINT)) // COUNT(*) AS pos_rate_ppm,
           abs(CAST(SUM(score_ppm) AS BIGINT) // COUNT(*)
               - (1000000 * CAST(SUM(pos) AS BIGINT)) // COUNT(*))
             AS gap_ppm
    FROM binned GROUP BY 1
    """,
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELIABILITY DIAGRAM (calibration table): cut the score axis into
    {CALIB_BINS} fixed-width bins and compare each bin's mean score with
    its observed positive rate — the per-bin gap is the Expected
    Calibration Error's integrand, the number that says whether a
    classifier's scores can be READ as probabilities (and so whether a
    fixed threshold transfers across corpora).

    Fixed-WIDTH bins (score domain is [0, 1e6] ppm), unlike the
    fixed-COUNT deciles of eval_gains_deciles — the two tables answer
    different questions (calibration vs ranked capture).  All integer:
    truncating ppm divisions; empty bins are absent (same in both
    engines).  int64 headroom: SUM(score_ppm) <= n*1e6 holds to ~9.2e12
    docs per bin; past that widen to DECIMAL(38,0) (agg_moments pattern).

    Scale shape: one scoring scan into a {CALIB_BINS}-group partial+final
    aggregate — the cheapest possible distributed shape, no window, no
    join."""
    scored = _scored_docs(spark, sf_dir)
    width = 1000000 // CALIB_BINS
    binned = scored.select(
        (F.least(F.expr(f"score_ppm div {width}"), F.lit(CALIB_BINS - 1)) + 1)
        .alias("bin"),
        "score_ppm",
        "pos",
    )
    per = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("pos").alias("n_pos"),
        F.sum("score_ppm").alias("_score_sum"),
    )
    return per.select(
        "bin",
        "n_docs",
        "n_pos",
        F.expr("_score_sum div n_docs").alias("mean_score_ppm"),
        F.expr("(1000000 * n_pos) div n_docs").alias("pos_rate_ppm"),
        F.expr(
            "abs(_score_sum div n_docs - (1000000 * n_pos) div n_docs)"
        ).alias("gap_ppm"),
    )


PR_THRESHOLDS = tuple(range(100_000, 1_000_000, 100_000))


@query(
    "eval_pr_threshold_sweep",
    oracle=f"""
    WITH scored AS ({_SCORE_ORACLE}),
    classes AS (
      SELECT score_ppm,
             CAST(COUNT(*) AS BIGINT) AS n_s,
             CAST(SUM(pos) AS BIGINT) AS p_s
      FROM scored GROUP BY 1),
    th(threshold_ppm) AS (VALUES {", ".join(f"({t})" for t in PR_THRESHOLDS)}),
    per AS (
      SELECT t.threshold_ppm,
             CAST(SUM(CASE WHEN c.score_ppm >= t.threshold_ppm
                           THEN c.p_s ELSE 0 END) AS BIGINT) AS n_tp,
             CAST(SUM(CASE WHEN c.score_ppm >= t.threshold_ppm
                           THEN c.n_s - c.p_s ELSE 0 END) AS BIGINT) AS n_fp,
             CAST(SUM(c.p_s) AS BIGINT) AS n_pos
      FROM th t CROSS JOIN classes c
      GROUP BY 1)
    SELECT threshold_ppm, n_tp, n_fp,
           n_pos - n_tp AS n_fn,
           (1000000 * n_tp) // NULLIF(n_tp + n_fp, 0) AS precision_ppm,
           (1000000 * n_tp) // NULLIF(n_pos, 0) AS recall_ppm,
           (2000000 * n_tp) // NULLIF(n_tp + n_fp + n_pos, 0) AS f1_ppm
    FROM per
    """,
)
def eval_pr_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRECISION / RECALL / F1 at a fixed ladder of score thresholds — the
    operating-point table that turns a scored corpus into a deployable
    filter ("keep everything above t"): pick the row whose precision
    clears the contamination budget and read off the recall you paid.
    Completes the classifier-eval family (AUC = threshold-free summary,
    calibration = can scores be read as probabilities, gains = ranked
    capture, THIS = the actual knob).

    Exact integers throughout: counts from the domain-bounded score-class
    rollup, truncating ppm divisions, and F1 via the integer identity
    ``F1 = 2tp / (2tp + fp + fn)`` — one division, no float harmonic
    mean.  NULL (not crash) where a denominator is empty, both engines.

    Scale shape: the corpus collapses to the same <=1e6-row score-class
    table eval_auc_rank uses; the 9-threshold sweep is a cross join
    against THAT (metadata x constant), never against corpus rows."""
    scored = _scored_docs(spark, sf_dir)
    classes = scored.groupBy("score_ppm").agg(
        F.count(F.lit(1)).alias("n_s"),
        F.sum("pos").alias("p_s"),
    )
    th = spark.createDataFrame(
        [(t,) for t in PR_THRESHOLDS], "threshold_ppm int"
    )
    per = (
        classes.crossJoin(F.broadcast(th))
        .groupBy("threshold_ppm")
        .agg(
            F.sum(
                F.when(F.col("score_ppm") >= F.col("threshold_ppm"),
                       F.col("p_s")).otherwise(0)
            ).alias("n_tp"),
            F.sum(
                F.when(
                    F.col("score_ppm") >= F.col("threshold_ppm"),
                    F.col("n_s") - F.col("p_s"),
                ).otherwise(0)
            ).alias("n_fp"),
            F.sum("p_s").alias("n_pos"),
        )
    )
    return per.select(
        "threshold_ppm",
        "n_tp",
        "n_fp",
        (F.col("n_pos") - F.col("n_tp")).alias("n_fn"),
        F.expr("(1000000 * n_tp) div nullif(n_tp + n_fp, 0)").alias(
            "precision_ppm"
        ),
        F.expr("(1000000 * n_tp) div nullif(n_pos, 0)").alias("recall_ppm"),
        F.expr("(2000000 * n_tp) div nullif(n_tp + n_fp + n_pos, 0)").alias(
            "f1_ppm"
        ),
    )


# --------------------------------------------------------------------------
# ROUGE-2 n-gram overlap — NLG/summarization-style reference eval
# --------------------------------------------------------------------------


@query(
    "eval_rouge2_pairs",
    oracle=r"""
    WITH ts AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ts
                FROM documents),
    bg AS (
      SELECT DISTINCT doc_id, ts[i.i] || ' ' || ts[i.i + 1] AS bg
      FROM ts, LATERAL (SELECT unnest(range(1, len(ts))) AS i) i),
    pair AS (
      SELECT c.doc_id AS cand_id, r.doc_id AS ref_id,
             c.bg AS cbg, r.bg AS rbg
      FROM bg c FULL JOIN bg r
        ON r.doc_id = c.doc_id + 1 AND c.bg = r.bg
      WHERE COALESCE(c.doc_id, r.doc_id - 1) % 2 = 0),
    stats AS (
      SELECT COALESCE(cand_id, ref_id - 1) AS cand_id,
             CAST(SUM(CASE WHEN cbg IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_cand,
             CAST(SUM(CASE WHEN rbg IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_ref,
             CAST(SUM(CASE WHEN cbg IS NOT NULL AND rbg IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_common
      FROM pair GROUP BY 1)
    SELECT cand_id, cand_id + 1 AS ref_id, n_cand, n_ref, n_common,
           CASE WHEN n_ref = 0 THEN NULL
                ELSE CAST(n_common * 1000000 // n_ref AS BIGINT)
           END AS recall_ppm,
           CASE WHEN n_cand = 0 THEN NULL
                ELSE CAST(n_common * 1000000 // n_cand AS BIGINT)
           END AS precision_ppm,
           CASE WHEN n_cand + n_ref = 0 THEN NULL
                ELSE CAST(2 * n_common * 1000000 // (n_cand + n_ref)
                          AS BIGINT)
           END AS f1_ppm
    FROM stats
    WHERE n_ref > 0
    """,
)
def eval_rouge2_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-2 (distinct-bigram overlap) between candidate/reference
    document pairs — the NLG/summarization eval loop (Lin 2004) as a
    corpus query: each even doc_id is scored against doc_id+1 as its
    reference, with recall = |∩|/|ref bigrams|, precision = |∩|/|cand|,
    and F1 via the integer set identity ``2|∩|/(|cand|+|ref|)`` (the
    eval_pr_threshold_sweep recipe — one truncating division, no
    compounded ratios).  Distinct bigrams (the set form of ROUGE) keep
    every count exact-integer; the clipped-multiset form swaps the
    dedup for a LEAST(tf_c, tf_r) sum, same plan shape.

    Plan shape: bigram explode → per-doc distinct → ONE equi-join on
    (adjacent-pair key, bigram) — candidate and reference sides co-hash
    on the bigram so the intersection is a hash join, never a cross
    product; counts collapse map-side.  Pairs where the reference is
    missing (odd corpus tail) drop, mirrored by the twin's n_ref > 0.

    Scale shape: everything keys on (pair, bigram) — embarrassingly
    parallel, output one row per pair; at 100 TB the pairing key is the
    (candidate, reference) alignment column a real eval set carries."""
    d = load_spread(spark, sf_dir, "documents").select("doc_id", "text")
    ts = d.select("doc_id", F.split("text", r"\s+").alias("ts"))
    # one pass: the pair key and a side flag ride the bigram explode, and
    # per-(pair, bigram) presence bits replace both the per-doc DISTINCT
    # and the former full-outer join (which re-executed the explode
    # subtree once per side — 2 Generates, 4 Exchanges).  max(when(...))
    # over the raw multiset IS the distinct-presence bit, so the set
    # semantics (ROUGE's distinct-bigram form) are unchanged.
    bg = ts.select(
        (F.col("doc_id") - F.col("doc_id") % 2).alias("cand_id"),
        (F.col("doc_id") % 2).alias("side"),
        F.explode(
            F.expr(
                "CASE WHEN size(ts) < 2 THEN array()"
                " ELSE transform(sequence(1, size(ts) - 1),"
                " i -> element_at(ts, i) || ' ' || element_at(ts, i + 1))"
                " END"
            )
        ).alias("bg"),
    )
    present = bg.groupBy("cand_id", "bg").agg(
        F.max(F.when(F.col("side") == 0, 1).otherwise(0)).alias("cp"),
        F.max(F.when(F.col("side") == 1, 1).otherwise(0)).alias("rp"),
    )
    stats = present.groupBy("cand_id").agg(
        F.sum("cp").cast("long").alias("n_cand"),
        F.sum("rp").cast("long").alias("n_ref"),
        F.sum(F.col("cp") * F.col("rp")).cast("long").alias("n_common"),
    )
    ppm = lambda num, den: F.when(  # noqa: E731
        F.expr(den) == 0, F.lit(None).cast("long")
    ).otherwise(F.expr(f"{num} * 1000000 div ({den})"))
    return stats.filter(F.col("n_ref") > 0).select(
        "cand_id",
        (F.col("cand_id") + 1).alias("ref_id"),
        "n_cand",
        "n_ref",
        "n_common",
        ppm("n_common", "n_ref").alias("recall_ppm"),
        ppm("n_common", "n_cand").alias("precision_ppm"),
        ppm("2 * n_common", "n_cand + n_ref").alias("f1_ppm"),
    )


# --------------------------------------------------------------------------
# Matryoshka truncation eval: retrieval recall of dimension-prefix search
# --------------------------------------------------------------------------

MRL_PREFIXES = (8, 16, 32, 64)  # dim prefixes; 64 = the full embedding
MRL_TOP_K = 5


def _mrl_oracle() -> str:
    from hadoopmapreduce_spark.operators.similarity import (
        EMBED_DIM,
        N_QUERIES,
    )

    levels = []
    for d in MRL_PREFIXES:
        levels.append(
            f"""t{d} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_dot_product(list_slice(q.v, 1, {d}),
                                           list_slice(c.v, 1, {d}))
                          / (sqrt(list_dot_product(list_slice(q.v, 1, {d}),
                                                   list_slice(q.v, 1, {d})))
                             * sqrt(list_dot_product(list_slice(c.v, 1, {d}),
                                                     list_slice(c.v, 1, {d}))))
                          DESC, c.vec_id ASC) AS rk
        FROM e q JOIN e c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}) t
      WHERE rk <= {MRL_TOP_K})"""
        )
    unions = "\n      UNION ALL ".join(
        f"""SELECT {d} AS dim_prefix, t.query_id,
             CAST(COUNT(f.neighbor_id) AS BIGINT) AS n_hits
      FROM t{d} t LEFT JOIN t{EMBED_DIM} f
        ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
      GROUP BY 1, 2"""
        for d in MRL_PREFIXES
    )
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    {",".join(levels)},
    hits AS ({unions})
    SELECT CAST(dim_prefix AS INT) AS dim_prefix, query_id, n_hits,
           CAST(n_hits * 1000000 // {MRL_TOP_K} AS BIGINT) AS recall_ppm
    FROM hits
    """


@query("eval_matryoshka_truncation", oracle=_mrl_oracle())
def eval_matryoshka_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-representation eval (Kusupati et al. 2022): retrieval
    recall@{MRL_TOP_K} of exact cosine search over DIMENSION PREFIXES
    (8/16/32/64) against the full-dimension truth — the measurement that
    decides how far an embedding column can be truncated before the ANN
    index pays for it (truncation is the cheapest compression there is:
    no re-encoding, just list_slice).

    Per (prefix, query): the exact top-{MRL_TOP_K} under the truncated
    cosine, intersected with the full-dimension top-{MRL_TOP_K};
    recall in ppm via one truncating division.  The 64-prefix rows are
    the built-in sanity floor (recall == 1.0 by construction).  All
    arithmetic is the shared exact recipe: in-row sequential dots ==
    list_dot_product, sqrt/division on identical doubles, total
    (cosine DESC, vec_id ASC) tie-breaks.

    Scale shape: |prefixes| exact scoring passes of the bounded query
    set against the corpus (broadcast probes, linear scans — the
    knn_cosine_topk shape x4); at 100 TB the prefix searches run against
    the IVFADC index instead, same eval join."""
    from hadoopmapreduce_spark.operators.similarity import (
        EMBED_DIM,
        N_QUERIES,
        _dot,
    )

    e = load_spread(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )

    def topk(d: int) -> DataFrame:
        qs = F.slice(F.col("qv"), 1, d)
        cs = F.slice(F.col("v"), 1, d)
        cos = _dot(qs, cs) / (F.sqrt(_dot(qs, qs)) * F.sqrt(_dot(cs, cs)))
        w = W.partitionBy("query_id").orderBy(
            F.desc("cos"), F.asc("vec_id")
        )
        return (
            e.crossJoin(F.broadcast(q))
            .filter(F.col("vec_id") != F.col("query_id"))
            .select("query_id", "vec_id", cos.alias("cos"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= MRL_TOP_K)
            .select("query_id", F.col("vec_id").alias("neighbor_id"))
        )

    truth = topk(EMBED_DIM)
    out = None
    for d in MRL_PREFIXES:
        level = topk(d)
        hits = (
            level.join(truth, ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_hits"))
        )
        lvl = (
            level.select("query_id")
            .distinct()
            .join(hits, "query_id", "left")
            .select(
                F.lit(d).cast("int").alias("dim_prefix"),
                "query_id",
                F.coalesce(F.col("n_hits"), F.lit(0))
                .cast("long")
                .alias("n_hits"),
            )
        )
        out = lvl if out is None else out.unionByName(lvl)
    return out.select(
        "dim_prefix",
        "query_id",
        "n_hits",
        F.expr(f"n_hits * 1000000 div {MRL_TOP_K}").alias("recall_ppm"),
    )


@query(
    "eval_mrr_label_match",
    oracle=f"""
    WITH {_TOPK_CTES},
    firsts AS (
      SELECT probe_id, own_label,
             MIN(CASE WHEN nbr_label = own_label THEN rk END) AS first_rk
      FROM top GROUP BY 1, 2)
    SELECT probe_id, own_label,
           CAST(first_rk AS INT) AS first_rel_rank,
           CAST(CASE WHEN first_rk IS NULL THEN NULL
                     ELSE 1000000 // first_rk END AS BIGINT) AS rr_ppm
    FROM firsts
    """,
)
def eval_mrr_label_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@{{NOISE_K}} of the embedding space as a retrieval index — the
    reciprocal rank of the FIRST same-label neighbor per probe-panel
    member, the companion number to ``eval_ndcg_label_match`` (NDCG
    grades the whole ranking; MRR grades time-to-first-hit, the metric
    retrieval-augmented pipelines actually page on).

    Exact integers: rr_ppm = 1000000 div first_rank (one truncating
    division of exact ints); NULL when no same-label neighbor appears in
    the top {{NOISE_K}} — in both engines, never a crash.  The mean (the
    "M" of MRR) is deliberately left to the consumer: per-probe rows
    hash-compare exactly and aggregate freely.

    Scale shape: everything downstream of the shared broadcast top-k
    (:func:`_probe_topk`) is a panel-sized groupBy — the corpus is
    touched exactly once, identically to the NDCG and label-noise
    evals (panel capped at PANEL_MAX so the probe side stays a
    broadcast at any corpus size)."""
    top = _probe_topk(spark, sf_dir)
    firsts = top.groupBy("probe_id", "own_label").agg(
        F.min(
            F.when(F.col("nbr_label") == F.col("own_label"), F.col("rk"))
        ).alias("first_rk")
    )
    return firsts.select(
        "probe_id",
        "own_label",
        F.col("first_rk").cast("int").alias("first_rel_rank"),
        F.expr("1000000 div first_rk").cast("long").alias("rr_ppm"),
    )


# --------------------------------------------------------------------------
# BLEU components (Papineni et al. 2002): clipped n-gram precisions +
# brevity ratio, in exact integers — the companion to eval_rouge2_pairs
# --------------------------------------------------------------------------

BLEU_MAX_N = 4


def _bleu_ngram_sql(n: int, side: str) -> str:
    """DuckDB CTE body: tagged n-grams of one side (multiset — no
    dedup), n prepended so all orders share one join key space."""
    gram = " || ' ' || ".join(f"ts[i.i + {j}]" for j in range(n))
    return f"""
      SELECT doc_id, '{n}:' || {gram} AS gram
      FROM ts_{side}, LATERAL (SELECT unnest(range(1, len(ts) + 2 - {n})) AS i) i
    """


def _bleu_oracle() -> str:
    cand_grams = "\n      UNION ALL ".join(
        _bleu_ngram_sql(n, "c") for n in range(1, BLEU_MAX_N + 1)
    )
    ref_grams = "\n      UNION ALL ".join(
        _bleu_ngram_sql(n, "r") for n in range(1, BLEU_MAX_N + 1)
    )
    p_cols = ",\n           ".join(
        f"CAST(CASE WHEN SUM(CASE WHEN n = {n} THEN total END) = 0 THEN NULL"
        f" ELSE SUM(CASE WHEN n = {n} THEN clipped END) * 1000000"
        f" // SUM(CASE WHEN n = {n} THEN total END) END AS BIGINT)"
        f" AS p{n}_ppm"
        for n in range(1, BLEU_MAX_N + 1)
    )
    return f"""
    WITH ts0 AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ts
                 FROM documents),
    ts_c AS (SELECT * FROM ts0 WHERE doc_id % 2 = 0),
    ts_r AS (SELECT doc_id - 1 AS doc_id, ts FROM ts0 WHERE doc_id % 2 = 1),
    ctf AS (SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS tfc
            FROM ({cand_grams}) GROUP BY 1, 2),
    rtf AS (SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS tfr
            FROM ({ref_grams}) GROUP BY 1, 2),
    j AS (SELECT c.doc_id,
                 CAST(SUBSTR(c.gram, 1, 1) AS INT) AS n,
                 c.tfc AS total,
                 LEAST(c.tfc, COALESCE(r.tfr, 0)) AS clipped
          FROM ctf c LEFT JOIN rtf r
            ON r.doc_id = c.doc_id AND r.gram = c.gram),
    lens AS (SELECT c.doc_id, CAST(len(c.ts) AS BIGINT) AS len_c,
                    CAST(len(r.ts) AS BIGINT) AS len_r
             FROM ts_c c JOIN ts_r r USING (doc_id)),
    px AS (SELECT doc_id, {p_cols} FROM j GROUP BY doc_id)
    SELECT l.doc_id AS cand_id, l.doc_id + 1 AS ref_id,
           l.len_c, l.len_r,
           CAST(CASE WHEN l.len_r = 0 THEN NULL
                     ELSE l.len_c * 1000000 // l.len_r END AS BIGINT)
             AS brevity_ppm,
           px.p1_ppm, px.p2_ppm, px.p3_ppm, px.p4_ppm
    FROM lens l JOIN px USING (doc_id)
    """


@query("eval_bleu_components", oracle=_bleu_oracle())
def eval_bleu_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU's exact-integer decomposition (Papineni et al. 2002) over the
    same even→odd candidate/reference pairing as ``eval_rouge2_pairs``:
    the four MODIFIED (clipped-multiset) n-gram precisions p1..p4 —
    clip(g) = min(tf_cand(g), tf_ref(g)), the multiset form ROUGE-2's
    distinct-set query deliberately does not cover — and the brevity
    RATIO len_c/len_r, each as one truncating ppm division.

    The geometric mean + exp brevity penalty (the scalar BLEU) needs
    exp/ln, so the query ships the exact integer COMPONENTS and leaves
    the one libm fold to the consumer — the no-libm discipline
    (cross-engine bit-stability beats a pre-folded float), identical to
    how eval_rouge2_pairs leaves the mean to the consumer.

    Plan shape: ONE explode produces all four tagged n-gram orders
    ('n:gram' keys), multiset tf via (doc, gram) map-side-combined
    counts, one LEFT hash join candidate→reference on (pair, gram) —
    never a cross product — then a per-pair conditional pivot to the
    four precision columns.  Docs shorter than n tokens contribute ZERO
    n-grams for that order (per-order IF guard — Spark's sequence()
    DESCENDS when stop < start, so an unguarded short doc would crash
    element_at under ANSI mode; test-pinned on 1–3-token docs), making
    that order's precision NULL exactly as the oracle's empty range().

    Scale shape: keys on (pair, gram) end to end, one row per pair out;
    at 100 TB the pairing key is the eval set's alignment column.
    [REF] parity: composes the reference's join+aggregate surface
    (ClickThru.java:98-168) at MT-eval semantics."""
    d = load_spread(spark, sf_dir, "documents").select("doc_id", "text")
    ts = d.select("doc_id", F.split("text", r"\s+").alias("ts"))
    # Per-order emptiness guard: sequence(1, stop) DESCENDS when stop < 1
    # (default step -1), so a doc shorter than n tokens would evaluate
    # element_at at index 0 / past the end and crash under ANSI mode.
    # IF(size >= n, ..., array()) yields zero grams instead — mirroring
    # the oracle's range(1, len + 2 - n), which is empty for short docs.
    grams_expr = "concat(" + ", ".join(
        f"IF(size(ts) >= {n}, "
        f"transform(sequence(1, size(ts) - {n - 1}), "
        f"i -> '{n}:' || "
        + " || ' ' || ".join(f"element_at(ts, i + {j})" for j in range(n))
        + "), array())"
        for n in range(1, BLEU_MAX_N + 1)
    ) + ")"
    # one pass over the gram stream: the pair key and a side flag ride the
    # explode, so candidate and reference tf are two conditional counts of
    # the SAME (pair, gram) group — the former ctf/rtf split re-executed
    # the explode+count subtree once per join input (2 Generates).  A
    # gram seen only on the reference side lands as tfc = 0, contributing
    # total = 0 / clipped = 0 to every sum — identical to its absence
    # from the former candidate-driven LEFT join.
    grams = ts.select(
        (F.col("doc_id") - F.col("doc_id") % 2).alias("cand_id"),
        (F.col("doc_id") % 2).alias("side"),
        F.explode(F.expr(grams_expr)).alias("gram"),
    )
    tf = grams.groupBy("cand_id", "gram").agg(
        F.count(F.when(F.col("side") == 0, F.lit(1))).alias("tfc"),
        F.count(F.when(F.col("side") == 1, F.lit(1))).alias("tfr"),
    )
    j = tf.select(
        "cand_id",
        F.substring("gram", 1, 1).cast("int").alias("n"),
        F.col("tfc").alias("total"),
        F.least(F.col("tfc"), F.col("tfr")).alias("clipped"),
    )
    # _anyc reproduces the former inner join on px: a pair whose candidate
    # doc emitted zero grams had no px row and was dropped
    px = j.groupBy("cand_id").agg(
        *[
            F.expr(
                f"CAST(CASE WHEN SUM(CASE WHEN n = {n} THEN total END) = 0"
                f" THEN NULL ELSE SUM(CASE WHEN n = {n} THEN clipped END)"
                f" * 1000000 div SUM(CASE WHEN n = {n} THEN total END)"
                f" END AS BIGINT)"
            ).alias(f"p{n}_ppm")
            for n in range(1, BLEU_MAX_N + 1)
        ],
        F.sum("total").alias("_anyc"),
    ).filter(F.col("_anyc") > 0)
    # pair lengths via the same conditional-aggregate fold (one scan of
    # ts instead of the former lc/lr double scan); the non-null filter
    # reproduces the former lc ⋈ lr INNER join (both docs must exist)
    lens = (
        ts.select(
            (F.col("doc_id") - F.col("doc_id") % 2).alias("cand_id"),
            (F.col("doc_id") % 2).alias("side"),
            F.size("ts").cast("long").alias("len"),
        )
        .groupBy("cand_id")
        .agg(
            F.max(F.when(F.col("side") == 0, F.col("len"))).alias("len_c"),
            F.max(F.when(F.col("side") == 1, F.col("len"))).alias("len_r"),
        )
        .filter(F.col("len_c").isNotNull() & F.col("len_r").isNotNull())
    )
    return (
        lens.join(px, "cand_id")
        .select(
            "cand_id",
            (F.col("cand_id") + 1).alias("ref_id"),
            "len_c",
            "len_r",
            F.expr(
                "CAST(CASE WHEN len_r = 0 THEN NULL"
                " ELSE len_c * 1000000 div len_r END AS BIGINT)"
            ).alias("brevity_ppm"),
            "p1_ppm",
            "p2_ppm",
            "p3_ppm",
            "p4_ppm",
        )
    )


# --------------------------------------------------------------------------
# chrF components — character n-gram precision/recall (Popović 2015)
# --------------------------------------------------------------------------

CHRF_MAX_N = 4  # character n-gram orders 1..4 (chrF's default 6 adds two
# more explode passes for metrically-redundant orders at this corpus;
# the clipped-multiset machinery is order-generic either way)


def _chrf_oracle() -> str:
    grams = "\n      UNION ALL ".join(
        f"SELECT doc_id, '{n}:' || substr(cs, i.i, {n}) AS gram"
        f" FROM cs, LATERAL (SELECT unnest(range(1, len(cs) - {n} + 2)) AS i) i"
        for n in range(1, CHRF_MAX_N + 1)
    )
    out_cols = ",\n           ".join(
        f"COALESCE(m.m{n}, 0) AS m{n},\n           "
        f"CAST(CASE WHEN c.tc{n} = 0 THEN NULL ELSE COALESCE(m.m{n}, 0)"
        f" * 1000000 // c.tc{n} END AS BIGINT) AS p{n}_ppm,\n           "
        f"CAST(CASE WHEN r.tr{n} = 0 THEN NULL ELSE COALESCE(m.m{n}, 0)"
        f" * 1000000 // r.tr{n} END AS BIGINT) AS r{n}_ppm"
        for n in range(1, CHRF_MAX_N + 1)
    )
    msum = ", ".join(
        f"CAST(SUM(CASE WHEN n = {n} THEN mm END) AS BIGINT) AS m{n}"
        for n in range(1, CHRF_MAX_N + 1)
    )
    tcsum = ", ".join(
        f"CAST(COALESCE(SUM(CASE WHEN n = {n} THEN tfc END), 0) AS BIGINT)"
        f" AS tc{n}"
        for n in range(1, CHRF_MAX_N + 1)
    )
    trsum = ", ".join(
        f"CAST(COALESCE(SUM(CASE WHEN n = {n} THEN tfr END), 0) AS BIGINT)"
        f" AS tr{n}"
        for n in range(1, CHRF_MAX_N + 1)
    )
    return f"""
    WITH cs0 AS (SELECT doc_id, regexp_replace(text, '\\s+', '', 'g') AS cs
                 FROM documents),
    cs AS (SELECT * FROM cs0),
    g AS ({grams}),
    tf AS (SELECT doc_id, gram, CAST(SUBSTR(gram, 1, 1) AS INT) AS n,
                  CAST(COUNT(*) AS BIGINT) AS tf
           FROM g GROUP BY 1, 2, 3),
    ctf AS (SELECT doc_id, gram, n, tf AS tfc FROM tf WHERE doc_id % 2 = 0),
    rtf AS (SELECT doc_id - 1 AS doc_id, gram, n, tf AS tfr
            FROM tf WHERE doc_id % 2 = 1),
    mt AS (SELECT c.doc_id, c.n, LEAST(c.tfc, r.tfr) AS mm
           FROM ctf c JOIN rtf r USING (doc_id, gram)),
    m AS (SELECT doc_id, {msum} FROM mt GROUP BY doc_id),
    c AS (SELECT doc_id, {tcsum} FROM ctf GROUP BY doc_id),
    r AS (SELECT doc_id, {trsum} FROM rtf GROUP BY doc_id)
    SELECT c.doc_id AS cand_id, c.doc_id + 1 AS ref_id,
           {out_cols}
    FROM c
    JOIN r USING (doc_id)
    LEFT JOIN m USING (doc_id)
    """


@query("eval_chrf_components", oracle=_chrf_oracle())
def eval_chrf_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chrF's exact-integer decomposition (Popović, WMT 2015) over the
    same even→odd candidate/reference pairing as the BLEU and ROUGE-2
    evals: per character-n-gram order 1..{CHRF_MAX_N}, the clipped
    MULTISET match count m_n = Σ_g min(tf_c, tf_r) — symmetric, so one
    inner join feeds both directions — with per-order PRECISION
    (m/total_cand) and RECALL (m/total_ref) in truncating ppm.  chrF is
    the MT metric that survives tokenizer mismatch (it sees characters,
    not tokens), which is why data pipelines use it to compare corpora
    ACROSS tokenizations; the chrF2 scalar (β=2 F-mean) is a nonlinear
    fold left to the consumer — the BLEU-components discipline.

    Whitespace is removed before gram extraction (the standard chrF
    preprocessing), so the metric reads subword structure across word
    boundaries.  Short-doc safety inherited from the BLEU fix: the
    per-order guard emits zero grams when the char string is shorter
    than n (Spark's sequence() would descend), mirroring DuckDB's empty
    range(); m/p/r then read 0/NULL exactly.

    Scale shape: ONE explode emits all {CHRF_MAX_N} tagged orders (rows
    ≈ 4× corpus chars — the same linear position-table posture as
    ``dedup_substring_spans``), then exactly TWO keyed aggregations:
    (pair, gram) conditional tf counts for both sides at once, and a
    per-pair rollup of all 3×{CHRF_MAX_N} outputs.  The earlier
    formulation filtered the tf table into cand/ref frames and joined
    them back — Spark re-executed the explode+count subtree once per
    reference (4 Generates, 4 scans, 7 shuffle + 3 broadcast Exchanges,
    3 joins — plans/r13/eval_chrf_components_before.txt); folding the
    side split into conditional aggregates is the same arithmetic with
    1 Generate, 1 scan, 0 joins.  Never a cross product; keys on
    (pair, gram) end to end."""
    d = load_spread(spark, sf_dir, "documents").select(
        "doc_id", F.regexp_replace("text", r"\s+", "").alias("cs")
    )
    grams_expr = "concat(" + ", ".join(
        f"IF(length(cs) >= {n}, "
        f"transform(sequence(1, length(cs) - {n} + 1), "
        f"i -> '{n}:' || substr(cs, i, {n})), array())"
        for n in range(1, CHRF_MAX_N + 1)
    ) + ")"
    # one pass: pair key + side flag ride the explode, so candidate and
    # reference tf land as two conditional counts of the SAME group
    tf = (
        d.select(
            (F.col("doc_id") - F.col("doc_id") % 2).alias("cand_id"),
            (F.col("doc_id") % 2).alias("side"),
            F.explode(F.expr(grams_expr)).alias("gram"),
        )
        .groupBy("cand_id", "gram")
        .agg(
            F.count(F.when(F.col("side") == 0, F.lit(1))).alias("tfc"),
            F.count(F.when(F.col("side") == 1, F.lit(1))).alias("tfr"),
        )
        .select(
            "cand_id",
            F.substring("gram", 1, 1).cast("int").alias("n"),
            "tfc",
            "tfr",
        )
    )
    # per-pair rollup: m_n = Σ_g min(tfc, tfr) (0 when either side lacks
    # the gram — identical to the former inner join's matched-gram sum),
    # tc_n/tr_n the per-side totals.  Pairs missing a whole side (no cand
    # or no ref grams at all) were dropped by the former c⋈r inner join;
    # the HAVING-style filter reproduces that.
    agg_cols = []
    for n in range(1, CHRF_MAX_N + 1):
        isn = F.col("n") == n
        agg_cols.append(
            F.coalesce(
                F.sum(F.when(isn, F.least(F.col("tfc"), F.col("tfr")))),
                F.lit(0),
            )
            .cast("long")
            .alias(f"m{n}")
        )
        agg_cols.append(
            F.coalesce(F.sum(F.when(isn, F.col("tfc"))), F.lit(0))
            .cast("long")
            .alias(f"tc{n}")
        )
        agg_cols.append(
            F.coalesce(F.sum(F.when(isn, F.col("tfr"))), F.lit(0))
            .cast("long")
            .alias(f"tr{n}")
        )
    per_pair = (
        tf.groupBy("cand_id")
        .agg(
            *agg_cols,
            F.sum("tfc").alias("_anyc"),
            F.sum("tfr").alias("_anyr"),
        )
        .filter((F.col("_anyc") > 0) & (F.col("_anyr") > 0))
    )
    out_cols = []
    for n in range(1, CHRF_MAX_N + 1):
        out_cols.append(F.col(f"m{n}"))
        out_cols.append(
            F.when(F.col(f"tc{n}") == 0, F.lit(None).cast("long"))
            .otherwise(F.expr(f"m{n} * 1000000 div tc{n}"))
            .cast("long")
            .alias(f"p{n}_ppm")
        )
        out_cols.append(
            F.when(F.col(f"tr{n}") == 0, F.lit(None).cast("long"))
            .otherwise(F.expr(f"m{n} * 1000000 div tr{n}"))
            .cast("long")
            .alias(f"r{n}_ppm")
        )
    return per_pair.select(
        "cand_id",
        (F.col("cand_id") + 1).alias("ref_id"),
        *out_cols,
    )


# --------------------------------------------------------------------------
# pass@k — the code-generation eval metric (Chen et al. 2021, HumanEval)
# --------------------------------------------------------------------------

PASS_AT_KS = (1, 5, 10)
PASS_N_MIN, PASS_N_MOD = 10, 11  # n = 10 + doc_id % 11 samples per task


def _pass_products(nvar: str, cvar: str, k: int, div: str = "//") -> str:
    """SQL for the exact estimator 1 − C(n−c, k)/C(n, k) in ppm: the
    binomial ratio telescopes to Π_{i=0..k-1} (n−c−i)/(n−i), so
    num = (n−c)(n−c−1)…(n−c−k+1) and den = n(n−1)…(n−k+1) are plain
    int64 products (k ≤ 10, n ≤ 20 → den ≤ 20!/10! ≈ 6.7e11).  ``div``
    is the engine's truncating-division token ('//' DuckDB, 'div'
    Spark) — both truncate toward zero on these non-negative operands."""
    num = " * ".join(f"({nvar} - {cvar} - {i})" for i in range(k))
    den = " * ".join(f"({nvar} - {i})" for i in range(k))
    return (
        f"CAST(CASE WHEN {cvar} = 0 THEN 0"
        f" WHEN {nvar} - {cvar} < {k} THEN 1000000"
        f" ELSE 1000000 - ({num}) * 1000000 {div} ({den})"
        f" END AS BIGINT)"
    )


def _pass_at_k_oracle() -> str:
    cols = ",\n           ".join(
        _pass_products("n", "c", k) + f" AS pass_at_{k}_ppm"
        for k in PASS_AT_KS
    )
    return f"""
    WITH tasks AS (
      SELECT doc_id AS task_id,
             {PASS_N_MIN} + doc_id % {PASS_N_MOD} AS n,
             (doc_id * 7) % ({PASS_N_MIN} + doc_id % {PASS_N_MOD} + 1) AS c
      FROM documents)
    SELECT task_id, CAST(n AS BIGINT) AS n_samples,
           CAST(c AS BIGINT) AS n_correct,
           {cols}
    FROM tasks
    """


@query("eval_pass_at_k", oracle=_pass_at_k_oracle())
def eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pass@k (Chen et al. 2021 §2.1) — the metric every code-generation
    eval (HumanEval, MBPP) reports, via the UNBIASED estimator
    1 − C(n−c, k)/C(n, k) over n samples with c correct, NOT the biased
    1 − (1 − c/n)^k.  The binomial ratio telescopes to a k-term falling-
    factorial quotient, so with the fixture bounds (n ≤ 20, k ≤ 10) both
    products are exact int64 and the metric is one truncating ppm
    division — no floats, no log-gamma, engine-identical.  Guards: c = 0
    → 0; n − c < k (can't pick k all-failing samples) → exactly 1e6.

    Per-task (n, c) comes from the deterministic law in the spec CTE —
    at deployment those columns are the real harness counts and the law
    CTE is replaced by the results table; the estimator expression is
    the deliverable.

    Scale shape: embarrassingly parallel row arithmetic — one projection
    over the task table, no shuffle, no join; the downstream mean-over-
    tasks is a 1-row aggregate the consumer owns (kept out so the hash
    pins every task's exact value, not a lossy average)."""
    d = load_spread(spark, sf_dir, "documents")
    n = F.lit(PASS_N_MIN) + F.col("doc_id") % PASS_N_MOD
    tasks = d.select(
        F.col("doc_id").alias("task_id"),
        n.cast("long").alias("n"),
        ((F.col("doc_id") * 7) % (n + 1)).cast("long").alias("c"),
    )
    cols = [
        F.expr(_pass_products("n", "c", k, div="div")).alias(
            f"pass_at_{k}_ppm"
        )
        for k in PASS_AT_KS
    ]
    return tasks.select(
        "task_id",
        F.col("n").alias("n_samples"),
        F.col("c").alias("n_correct"),
        *cols,
    )
