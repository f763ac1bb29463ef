"""Hybrid retrieval fusion — the production RAG retrieval shape.

A retrieval stack that runs BOTH a lexical ranker (BM25 over an inverted
index) and a semantic ranker (embedding cosine ANN) needs a fusion step to
combine the two ranked lists per query.  Reciprocal-rank fusion (Cormack,
Clarke & Buettcher, SIGIR 2009) is the standard: score(item) = Σ_systems
1/(k + rank_system(item)) with k = 60, summed over the systems that
returned the item.  It is pure rank arithmetic — no score calibration
across systems — which is exactly why production stacks use it and why it
is exactly oracle-expressible.

[REF] parity: composes the reference's join+aggregate surface
(ClickThru.java:98-168) over two upstream ranked panels.  [EXT] §2.5
mandate (similarity search / text retrieval families, fused).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from hadoopmapreduce_spark.registry import query

RRF_K = 60       # the canonical reciprocal-rank constant
RRF_TOP_K = 5    # fused results per query

# Exact integer RRF: both input panels rank 1..5, so every reciprocal
# 1/(60 + r) has denominator in 61..65; scaling by LCM(61..65) makes each
# contribution an exact int64 and the fused score a sum of exact int64s —
# no float rank arithmetic, no cross-engine rounding surface.  The unit is
# a constant of the QUERY (panel depth), not of the data: deeper panels
# just widen the LCM.
RRF_UNIT = math.lcm(*range(RRF_K + 1, RRF_K + RRF_TOP_K + 1))  # 495_593_280


def _rrf_oracle() -> str:
    """DuckDB twin: composes the two input panels' ORACLES verbatim (the
    fused result adjudicates end-to-end through both upstream paths), then
    pure integer rank arithmetic."""
    from hadoopmapreduce_spark.operators.similarity import KNN_COSINE_ORACLE
    from hadoopmapreduce_spark.operators.textops import BM25_ORACLE

    unit = RRF_UNIT
    return f"""
    WITH lex AS (
      SELECT query_doc AS query_id, doc_id AS item_id,
             CAST(rank AS INT) AS lex_rank
      FROM ({BM25_ORACLE})),
    sem AS (
      SELECT query_id, neighbor_id AS item_id, CAST(rk AS INT) AS sem_rank
      FROM ({KNN_COSINE_ORACLE})),
    shared AS (
      SELECT DISTINCT query_id FROM lex
      INTERSECT SELECT DISTINCT query_id FROM sem),
    l2 AS (SELECT lex.* FROM lex JOIN shared USING (query_id)
           WHERE item_id <> query_id),
    s2 AS (SELECT sem.* FROM sem JOIN shared USING (query_id)
           WHERE item_id <> query_id),
    u AS (
      SELECT COALESCE(l2.query_id, s2.query_id) AS query_id,
             COALESCE(l2.item_id, s2.item_id) AS item_id,
             l2.lex_rank, s2.sem_rank
      FROM l2 FULL JOIN s2
        ON l2.query_id = s2.query_id AND l2.item_id = s2.item_id),
    sc AS (
      SELECT query_id, item_id,
             CAST(COALESCE({unit} // ({RRF_K} + lex_rank), 0)
                  + COALESCE({unit} // ({RRF_K} + sem_rank), 0) AS BIGINT)
               AS rrf_units,
             lex_rank, sem_rank
      FROM u)
    SELECT query_id, CAST(rk AS INT) AS rank, item_id, rrf_units,
           lex_rank, sem_rank
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY rrf_units DESC, item_id ASC) AS rk
          FROM sc) t
    WHERE rk <= {RRF_TOP_K}
    """


@query("retrieval_rrf_fusion", oracle=_rrf_oracle())
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the lexical panel (``text_bm25_topk``:
    each probe doc queries the corpus with its top tf·idf keywords) and
    the semantic panel (``knn_cosine_topk``: each probe vector's exact
    cosine top-k) over the SHARED probe set — fixture convention: probe
    document i's embedding is ``vec_id`` i, so the BM25 panel (the
    {BM25_PANEL} smallest doc_ids) and the knn panel (vec_id <
    {N_QUERIES}) intersect on their common query ids, mechanically via
    the ``shared`` semi-join (no magic constants; holds at every SF
    because vec_ids are a prefix of doc_ids).

    Semantics: per (query, item), rrf_units = Σ RRF_UNIT/(60 + rank) over
    the systems that ranked the item, with RRF_UNIT = LCM(61..65) making
    every reciprocal an exact int64 (see the constant above).  The probe
    itself is excluded (a retrieval system doesn't return the query; BM25
    ranks it ~1st by construction, which would just pad every fused
    list).  Ranks are fused AS ASSIGNED by each system — RRF's defining
    property is that it never re-scores.  Ties break on item_id.

    Scale shape: both inputs are bounded panels (queries × top-k rows),
    so the fusion is panel-sized work end to end — a full outer join on
    (query, item) between two ≤40-row frames and one bounded window.
    The expensive parts are the UPSTREAM plans, which run unchanged
    (VERDICT r12 ask #4's criterion); at 100 TB the panels are whatever
    the retrieval evaluation set is, and fusion cost stays panel-sized.
    The fused quality number this feeds (e.g. MRR via
    ``eval_mrr_label_match``) is the metric a hybrid-retrieval rollout
    decision reads."""
    from hadoopmapreduce_spark.operators.similarity import knn_cosine_topk
    from hadoopmapreduce_spark.operators.textops import text_bm25_topk

    lex = text_bm25_topk(spark, sf_dir).select(
        F.col("query_doc").alias("query_id"),
        F.col("doc_id").alias("item_id"),
        F.col("rank").cast("int").alias("lex_rank"),
    )
    sem = knn_cosine_topk(spark, sf_dir).select(
        "query_id",
        F.col("neighbor_id").alias("item_id"),
        F.col("rk").cast("int").alias("sem_rank"),
    )
    shared = (
        lex.select("query_id")
        .distinct()
        .join(sem.select("query_id").distinct(), "query_id", "left_semi")
    )
    l2 = lex.join(F.broadcast(shared), "query_id", "left_semi").filter(
        F.col("item_id") != F.col("query_id")
    )
    s2 = sem.join(F.broadcast(shared), "query_id", "left_semi").filter(
        F.col("item_id") != F.col("query_id")
    )
    u = l2.join(s2, ["query_id", "item_id"], "full")
    contrib = lambda rank_col: F.coalesce(  # noqa: E731
        F.expr(f"{RRF_UNIT} div ({RRF_K} + {rank_col})"), F.lit(0)
    )
    sc = u.select(
        "query_id",
        "item_id",
        (contrib("lex_rank") + contrib("sem_rank"))
        .cast("long")
        .alias("rrf_units"),
        "lex_rank",
        "sem_rank",
    )
    w = W.partitionBy("query_id").orderBy(F.desc("rrf_units"), F.asc("item_id"))
    return (
        sc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= RRF_TOP_K)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "item_id",
            "rrf_units",
            "lex_rank",
            "sem_rank",
        )
    )


# --------------------------------------------------------------------------
# Rank-biased overlap — the fusion decision's diagnostic sibling
# --------------------------------------------------------------------------

RBO_P_NUM, RBO_P_DEN = 1, 2  # persistence p = 1/2
RBO_DEPTH = 5                # panels are top-5
# exact-integer RBO: truncated RBO@D with p=1/2 is
#   Σ_{d=1..D} (1-p)·p^(d-1)·X_d/d  =  Σ_d X_d / (2^d · d)
# scaled by RBO_UNIT = 2^D · lcm(1..D) = 1920 every term is an exact
# int64.  An item first counted at depth m = max(rank_A, rank_B)
# contributes the SUFFIX sum Σ_{d=m..D} 1920/(2^d·d) — precomputed below.
RBO_UNIT = (2**RBO_DEPTH) * math.lcm(*range(1, RBO_DEPTH + 1))  # 1920
_RBO_COEFF = [RBO_UNIT // (2**d * d) for d in range(1, RBO_DEPTH + 1)]
RBO_SUFFIX = [sum(_RBO_COEFF[m - 1 :]) for m in range(1, RBO_DEPTH + 1)]


def _rbo_oracle() -> str:
    from hadoopmapreduce_spark.operators.similarity import KNN_COSINE_ORACLE
    from hadoopmapreduce_spark.operators.textops import BM25_ORACLE

    suffix_case = " ".join(
        f"WHEN {m} THEN {RBO_SUFFIX[m - 1]}"
        for m in range(1, RBO_DEPTH + 1)
    )
    return f"""
    WITH lex0 AS (
      SELECT query_doc AS query_id, doc_id AS item_id, rank
      FROM ({BM25_ORACLE})
      WHERE doc_id <> query_doc),
    lex AS (
      SELECT query_id, item_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rank)
                  AS INT) AS lr
      FROM lex0),
    sem AS (
      SELECT query_id, neighbor_id AS item_id, CAST(rk AS INT) AS sr
      FROM ({KNN_COSINE_ORACLE})),
    shared AS (
      SELECT DISTINCT query_id FROM lex
      INTERSECT SELECT DISTINCT query_id FROM sem),
    pairs AS (
      SELECT l.query_id, l.item_id, GREATEST(l.lr, s.sr) AS m
      FROM lex l JOIN sem s USING (query_id, item_id)
      WHERE l.lr <= {RBO_DEPTH} AND s.sr <= {RBO_DEPTH}),
    agg AS (
      SELECT query_id,
             CAST(COUNT(*) AS BIGINT) AS n_common,
             CAST(COALESCE(SUM(CASE WHEN m = 1 THEN 1 END), 0) AS INT)
               AS top1_match,
             CAST(SUM(CASE m {suffix_case} END) AS BIGINT) AS rbo_units
      FROM pairs GROUP BY query_id)
    SELECT sh.query_id,
           COALESCE(a.n_common, 0) AS n_common,
           COALESCE(a.top1_match, 0) AS top1_match,
           COALESCE(a.rbo_units, 0) AS rbo_units
    FROM shared sh LEFT JOIN agg a USING (query_id)
    """


@query("retrieval_rbo_overlap", oracle=_rbo_oracle())
def retrieval_rbo_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010) between the
    lexical and semantic panels per shared query — the agreement
    diagnostic a retrieval stack reads BEFORE deciding how to fuse: RBO
    near 1 means the systems are redundant (fusion buys nothing), near 0
    means they surface disjoint result spaces (fusion is where the
    recall is).  Truncated at the panel depth with persistence p = 1/2.

    Exact integers end to end: with p = 1/2 and D = {RBO_DEPTH}, every
    term X_d/(2^d·d) is an exact multiple of 1/RBO_UNIT (= 1/1920), and
    an item whose deeper rank is m contributes the precomputed suffix
    sum RBO_SUFFIX[m-1] (1322, 362, 122, 42, 12) — so rbo_units is a
    plain int64 SUM over the (query, item) intersection, no float rank
    math.  Full agreement reads 1860 units = (1 − p^D)·RBO_UNIT.

    The lexical list drops the probe's self-hit and COMPACTS ranks
    (rank among retrieved non-self results — the list a user of the
    system actually sees); the semantic list already excludes self.

    Scale shape: both panels bounded, so this is panel-sized arithmetic
    after the unchanged upstream plans — the same posture as
    ``retrieval_rrf_fusion``, which it composes with: run both, fuse
    where RBO is low, prune the redundant system where it is high."""
    from pyspark.sql.functions import broadcast

    from hadoopmapreduce_spark.operators.similarity import knn_cosine_topk
    from hadoopmapreduce_spark.operators.textops import text_bm25_topk

    wl = W.partitionBy("query_id").orderBy("rank")
    lex = (
        text_bm25_topk(spark, sf_dir)
        .filter(F.col("doc_id") != F.col("query_doc"))
        .select(
            F.col("query_doc").alias("query_id"),
            F.col("doc_id").alias("item_id"),
            "rank",
        )
        .withColumn("lr", F.row_number().over(wl).cast("int"))
        .drop("rank")
    )
    sem = knn_cosine_topk(spark, sf_dir).select(
        "query_id",
        F.col("neighbor_id").alias("item_id"),
        F.col("rk").cast("int").alias("sr"),
    )
    shared = (
        lex.select("query_id")
        .distinct()
        .join(sem.select("query_id").distinct(), "query_id", "left_semi")
    )
    m = F.greatest(F.col("lr"), F.col("sr"))
    suffix = F.lit(None).cast("long")
    for depth in range(RBO_DEPTH, 0, -1):
        suffix = F.when(m == depth, F.lit(RBO_SUFFIX[depth - 1])).otherwise(
            suffix
        )
    pairs = (
        lex.join(sem, ["query_id", "item_id"])
        .filter((F.col("lr") <= RBO_DEPTH) & (F.col("sr") <= RBO_DEPTH))
        .select("query_id", m.alias("m"), suffix.alias("contrib"))
    )
    agg = pairs.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_common"),
        F.sum(F.when(F.col("m") == 1, 1)).cast("int").alias("top1_match"),
        F.sum("contrib").alias("rbo_units"),
    )
    return (
        broadcast(shared)
        .join(agg, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            F.coalesce("top1_match", F.lit(0)).cast("int").alias("top1_match"),
            F.coalesce("rbo_units", F.lit(0)).cast("long").alias("rbo_units"),
        )
    )
