"""[GEN] Sort / limit / top-k (absent from the reference; its only ordering
is the framework-internal shuffle byte sort on Text keys).

Scale note: `orderBy(...).limit(k)` compiles to TakeOrderedAndProject —
per-partition bounded heaps merged on the driver, O(k) memory, no global
sort.  A full global orderBy materialization is only exposed via the sink
writers (repartitionByRange), never inside a query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoopmapreduce_spark.catalog import load_table
from hadoopmapreduce_spark.registry import query


@query(
    "sort_topk_orders",
    oracle="""
    SELECT o_orderkey AS orderkey, o_custkey AS custkey, o_totalprice AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def sort_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 orders by price (deterministic: orderkey tie-break)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_custkey").alias("custkey"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


@query(
    "sort_multi_key",
    oracle="""
    SELECT o_orderkey AS orderkey, o_orderpriority AS priority,
           CAST(o_orderdate AS DATE) AS orderdate
    FROM orders
    ORDER BY o_orderpriority ASC, o_orderdate DESC, o_orderkey ASC
    LIMIT 50
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-direction multi-key sort with limit."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(
            F.asc("o_orderpriority"), F.desc("o_orderdate"), F.asc("o_orderkey")
        )
        .limit(50)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("orderdate"),
        )
    )


@query(
    "sample_bottomk_per_group",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority AS priority, o_orderkey AS orderkey,
             ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
               AS hrank,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT,
                        o_orderkey) AS rn
      FROM orders)
    SELECT priority, orderkey, hrank
    FROM ranked WHERE rn <= 5
    """,
)
def sample_bottomk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform k-sample per group via bottom-k-by-hash: rank
    rows by an engine-portable content hash (first 15 md5 nibbles as an
    integer — the repo's cross-engine hash idiom) and keep the 5 smallest
    per order priority.  Equivalent in distribution to per-group
    reservoir sampling but STATELESS and reproducible: membership is a
    pure function of the key, stable under relayout, retries and engine —
    which is why it is also the mergeable form (bottom-k of a union =
    bottom-k of the merged bottom-k's).  Complements sample_stratified
    (rate-based) with exact-k semantics.

    Per-group window after one shuffle on the group key; at 100 TB the
    map-side can pre-prune to each partition's local bottom-k first
    (Spark's TakeOrderedAndProject shape), so the shuffle carries
    k·partitions rows, not the table."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    hrank = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15), 16, 10
    ).cast("long")
    ranked = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderkey").alias("orderkey"),
        hrank.alias("hrank"),
    ).withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("priority").orderBy("hrank", "orderkey")
        ),
    )
    return ranked.where(F.col("rn") <= 5).select("priority", "orderkey", "hrank")


@query(
    "sort_topk_with_ties",
    oracle="""
    WITH r AS (
      SELECT o_custkey AS custkey, o_orderkey AS orderkey,
             o_orderdate AS orderdate,
             RANK() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate DESC) AS rk
      FROM orders)
    SELECT custkey, orderkey, orderdate, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= 3
    """,
)
def sort_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k WITH TIES (``FETCH FIRST 3 ROWS WITH TIES``
    semantics): each customer's 3 most recent order DATES, where every
    order sharing the cutoff date comes along — RANK, not ROW_NUMBER, so
    the result is fully determined by the data with NO tie-break column
    needed (row_number would demand one to stay deterministic; rank makes
    nondeterminism impossible by construction — the complementary
    discipline to sort_topk_orders' explicit tie-break).  One shuffle on
    the group key; the per-group sort is the same cost class as any
    window, and the output can exceed 3·|groups| only by the tie width —
    bounded fan-out at any scale."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    rk = F.rank().over(
        W.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"))
    )
    return (
        o.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            rk.cast("long").alias("rk"),
        )
        .where(F.col("rk") <= 3)
    )


@query(
    "sample_weighted_bottomk",
    oracle="""
    WITH w AS (
      SELECT o_orderpriority AS priority, o_orderkey AS orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS w_cents,
             ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM orders),
    ranked AS (
      SELECT priority, orderkey, w_cents, h // w_cents AS pri,
             ROW_NUMBER() OVER (
               PARTITION BY priority
               ORDER BY h // w_cents, h, orderkey) AS rn
      FROM w)
    SELECT priority, orderkey, w_cents, pri
    FROM ranked WHERE rn <= 20
    """,
)
def sample_weighted_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED k-sample per group — the integer-exact analogue
    of A-ES weighted reservoir sampling (Efraimidis-Spirtakis priority
    ``u^(1/w)`` bottom-k).  Priority here is ``h div w`` on a 60-bit
    content hash and an integer weight (order value in cents): doubling a
    row's weight halves its expected priority, so inclusion probability
    grows with weight, yet everything stays in exact BIGINT arithmetic —
    no float ``pow``/``ln`` whose libm ulps could diverge cross-engine.
    Like sample_bottomk_per_group it is STATELESS and mergeable (bottom-k
    of a union == bottom-k of merged bottom-k's), which is what makes it a
    distributed reservoir: each partition keeps its local bottom-k and the
    single shuffle carries k rows per partition, never the table.

    Weights are exact cents via the DECIMAL(18,2) reconstruction (the
    fixture's doubles REPRESENT 2-decimal prices; see NOTES.md playbook #6
    — this is a reconstruction cast, not a quantization choice)."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    w_cents = (
        F.col("o_totalprice").cast("decimal(18,2)") * 100
    ).cast("bigint")
    h = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15), 16, 10
    ).cast("long")
    base = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderkey").alias("orderkey"),
        w_cents.alias("w_cents"),
        h.alias("h"),
    ).withColumn("pri", F.expr("h div w_cents"))
    ranked = base.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("priority").orderBy("pri", "h", "orderkey")
        ),
    )
    return ranked.where(F.col("rn") <= 20).select(
        "priority", "orderkey", "w_cents", "pri"
    )


@query(
    "sort_collation_unicode",
    oracle="""
    WITH v AS (
      SELECT DISTINCT s FROM (
        SELECT p_name AS s FROM part
        UNION ALL SELECT upper(p_name) FROM part))
    SELECT s,
           ROW_NUMBER() OVER (ORDER BY s COLLATE en_us, s) AS rk
    FROM v ORDER BY s COLLATE en_us, s LIMIT 100
    """,
)
def sort_collation_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware ordering: top-100 DISTINCT part-name variants (the
    lowercase fixture names unioned with their uppercase forms) under the
    ICU root order — Spark's ``collate(s, 'UNICODE')`` against DuckDB's
    ``COLLATE en_us``.  Non-vacuous by construction: ICU sorts case
    variants adjacently at the tertiary level ('blue anvil' < 'BLUE
    ANVIL' < 'blue axe') while binary order puts EVERY uppercase string
    before every lowercase one, so the two orders disagree on almost all
    of this set; the probe that validated cross-engine ICU agreement on
    accents/case/punctuation is recorded in NOTES.md.  Binary tie-break
    after the collated key keeps the order total even if collation-equal
    distinct strings ever appear.

    Scale shape: distinct is a wordcount-class shuffle; the collated
    top-100 is TakeOrderedAndProject on ICU sort keys (per-partition
    bounded heaps — collation support rides the same bounded-top-k plan
    as any sort, which is the point: collation-correct ordering at 100 TB
    costs no more than binary ordering)."""
    p = load_table(spark, sf_dir, "part")
    from pyspark.sql import Window as W

    v = (
        p.select(F.col("p_name").alias("s"))
        .unionAll(p.select(F.upper(F.col("p_name")).alias("s")))
        .distinct()
    )
    key = F.expr("collate(s, 'UNICODE')")
    top = v.orderBy(key, F.col("s")).limit(100)
    return top.withColumn(
        "rk",
        F.row_number().over(W.orderBy(F.expr("collate(s, 'UNICODE')"), F.col("s"))).cast("long"),
    )


@query(
    "agg_collation_ci_groups",
    oracle="""
    WITH v AS (
      SELECT p_name AS s FROM part
      UNION ALL SELECT upper(p_name) FROM part)
    SELECT MIN(s) AS canonical,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT s) AS BIGINT) AS n_case_variants
    FROM v
    GROUP BY s COLLATE "en_us.nocase"
    """,
)
def agg_collation_ci_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping under REAL collation semantics: the mixed
    upper/lower part-name stream collapses into ICU case-fold equivalence
    classes — Spark's ``UNICODE_CI`` against DuckDB's combined
    ``en_us.nocase`` collation.  Probed equivalent on a/A, ä/Ä, é/É and
    the ß/SS trap (NEITHER engine folds ß to ss at this strength — both
    keep them distinct, unlike lower()-based folding which is the
    classic wrong answer; probe recorded in NOTES.md).  The grouping
    KEY is dropped from the output — a collation group's representative
    value is engine-nondeterministic by definition — and replaced by the
    binary MIN over the class, which is deterministic in both engines.

    The aggregation itself is an ordinary partial+final hash aggregate on
    ICU sort keys: collation-correct grouping at 100 TB costs the same
    shuffle as binary grouping."""
    p = load_table(spark, sf_dir, "part")
    v = p.select(F.col("p_name").alias("s")).unionAll(
        p.select(F.upper(F.col("p_name")).alias("s"))
    )
    return (
        v.groupBy(F.expr("collate(s, 'UNICODE_CI')").alias("k"))
        .agg(
            F.min(F.expr("collate(s, 'UTF8_BINARY')")).alias("canonical"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(F.expr("collate(s, 'UTF8_BINARY')")).alias(
                "n_case_variants"
            ),
        )
        .drop("k")
    )
