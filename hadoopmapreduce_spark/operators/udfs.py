"""[GEN] User-defined function surface — the engine/user extension points
the reference cannot have (its mapper/reducer *are* the whole program;
SURVEY.md §2.4 UDF row).

Three tiers, in preference order (see also multimodal.py's mapInPandas):
  1. built-in column expressions        — everything else in this repo
  2. Arrow-vectorized pandas UDFs       — udf_pandas_scalar (scalar),
                                          udf_grouped_normalize (grouped map)
  3. row-at-a-time Python UDFs          — deliberately NOT shipped; tested
                                          only as an anti-benchmark in
                                          tests/test_udfs.py

Everything here is arithmetic on exact inputs in fixed order, so even the
Python-side queries are SQL-oracle-checkable bit-for-bit.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from hadoopmapreduce_spark.catalog import load_table
from hadoopmapreduce_spark.registry import query


@F.pandas_udf(DoubleType())
def _charge_udf(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    """Vectorized charge formula — one Arrow batch in, one out; identical
    IEEE arithmetic to the SQL expression, ~10-100× a row-wise Python UDF."""
    return price * (1 - discount) * (1 + tax)


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF: the charge formula evaluated in Python over Arrow
    batches.  Exists to pin the Arrow round-trip (values must equal the
    JVM expression bit-for-bit); production code would use the built-in
    expression (see agg_pricing_summary) since this adds a Python boundary
    for no semantic gain."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        _charge_udf("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


def _minmax_normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group min-max normalization (grouped-map kernel).  min/max are
    exact regardless of order, and the normalization is one fixed-order
    expression per row → deterministic across partitionings."""
    lo = pdf["value"].min()
    hi = pdf["value"].max()
    span = hi - lo
    norm = (pdf["value"] - lo) / span if span > 0 else pdf["value"] * 0.0
    return pd.DataFrame(
        {
            "event_type": pdf["event_type"],
            "event_id": pdf["event_id"],
            "value": pdf["value"],
            "value_norm": norm,
        }
    )


@query(
    "udf_grouped_normalize",
    oracle="""
    SELECT event_type, event_id, value,
           CASE WHEN MAX(value) OVER w > MIN(value) OVER w
                THEN (value - MIN(value) OVER w)
                     / (MAX(value) OVER w - MIN(value) OVER w)
                ELSE value * 0.0 END AS value_norm
    FROM events
    WINDOW w AS (PARTITION BY event_type)
    """,
)
def udf_grouped_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas UDF (applyInPandas): min-max normalize event
    values within each event_type.  The grouped-map shape is the UDAF/
    custom-per-group escape hatch; here its output is provably equal to a
    window-function formulation, which is exactly the check the oracle
    performs.  Scale: one shuffle on the group key, groups stream through
    Arrow; a group must fit in one worker's memory (event_type cardinality
    is tiny — for high-cardinality keys this is the wrong tool and the
    window form is used instead)."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    return ev.groupBy("event_type").applyInPandas(
        _minmax_normalize,
        schema="event_type string, event_id long, value double, value_norm double",
    )


@query(
    "udtf_bigram_expand",
    oracle="""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ts FROM documents),
    z AS (
      SELECT doc_id,
             unnest(list_zip(ts[1:len(ts) - 1], ts[2:len(ts)],
                             range(0, len(ts) - 1))) AS p
      FROM t)
    SELECT doc_id, CAST(p[3] AS INT) AS pos,
           CAST(p[1] AS VARCHAR) || ' ' || CAST(p[2] AS VARCHAR) AS bigram
    FROM z
    """,
)
def udtf_bigram_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function): one document row in, N bigram
    rows out — the user-defined-table-function tier of the UDF surface
    (``F.explode`` covers the built-in case; this pins the *user-authored*
    generator contract incl. lateral-join wiring).

    Runs the FULL documents table.  UDTFs are row-at-a-time Python — at
    scale the same expansion is the pure-codegen ``posexplode`` used by
    fn_explode_suite (that is the production path, asserted equal here by
    the oracle's first-principles bigram construction); this query pins
    the user-authored generator contract on all rows, not a sample."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, bigram string")
    class BigramExpand:
        def eval(self, doc_id: int, text: str):  # noqa: ANN001
            toks = [t for t in __import__("re").split(r"\s+", text) if t != ""]
            for i in range(len(toks) - 1):
                yield doc_id, i, f"{toks[i]} {toks[i + 1]}"

    spark.udtf.register("bigram_expand", BigramExpand)
    d = load_table(spark, sf_dir, "documents")
    d.select("doc_id", "text").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT b.doc_id, b.pos, b.bigram "
        "FROM _udtf_docs d, LATERAL bigram_expand(d.doc_id, d.text) b"
    )


@query(
    "udf_cogrouped_asof",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id  AS user_id,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts,
           CAST(v.ts AS TIMESTAMP) AS last_view_ts
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts FROM events
                    WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def udf_cogrouped_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The as-of join AGAIN, via ``cogroup().applyInPandas`` — the
    co-grouped pandas API (both sides shuffle once on user_id, then each
    user's views and purchases arrive as two aligned pandas frames and
    ``pd.merge_asof`` does the backward match in-process).

    Same oracle as join_asof_purchase_view (operators/asof.py), which runs
    the union+window formulation — two independent implementations, one
    SQL twin.  When to prefer this shape: per-key logic too gnarly for
    window expressions (model scoring, per-key curve fitting).  The window
    form stays JVM-side and is the default; this one demonstrates the
    escape hatch with identical semantics.  Output is the matched ts VALUE
    (never a row id), so equal-timestamp ties can't make the result
    ambiguous.

    Full table, cogrouped on a HASH BUCKET of the user (64 buckets), not
    per-user: ``pd.merge_asof(by="user_id")`` does the per-user matching
    inside each bucket, so Python crosses the Arrow boundary 64 times
    instead of once per user — the difference between per-group overhead
    dominating and amortizing away.  At cluster scale the bucket count
    scales with cores, and per-bucket state stays bounded at
    |events| / buckets."""
    _B = 64
    ev = load_table(spark, sf_dir, "events")
    bucket = F.pmod(F.xxhash64("user_id"), F.lit(_B)).cast("int").alias("b")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", bucket
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", bucket
    )

    def asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # left = purchases for one bucket of users, right = their views;
        # merge_asof requires both frames sorted by the on-key
        out = left.sort_values("ts", kind="mergesort").rename(
            columns={"event_id": "purchase_id", "ts": "purchase_ts"}
        )
        if len(right) == 0:
            out["last_view_ts"] = pd.NaT
        else:
            v = right.sort_values("ts", kind="mergesort").rename(
                columns={"ts": "last_view_ts"}
            )
            out = pd.merge_asof(
                out,
                v,
                left_on="purchase_ts",
                right_on="last_view_ts",
                by="user_id",
                direction="backward",
            )
        return out[["purchase_id", "user_id", "purchase_ts", "last_view_ts"]]

    return purchases.groupBy("b").cogroup(views.groupBy("b")).applyInPandas(
        asof,
        schema="purchase_id long, user_id long, purchase_ts timestamp, "
        "last_view_ts timestamp",
    )


def _sum_tokens_py(n: pd.Series) -> int:
    # int64 summation in pandas is exact (no float detour) — the UDAF
    # result must hash-match the oracle's BIGINT SUM
    return int(n.sum())


def _count_rows_py(n: pd.Series) -> int:
    # the Series->scalar type hints are load-bearing: they are what makes
    # pandas_udf infer GROUPED_AGG eval type (a hintless lambda infers
    # SCALAR and fails analysis inside agg())
    return int(len(n))


@query(
    "udaf_pandas_grouped_agg",
    oracle="""
    SELECT lang,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY 1
    """,
)
def udaf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE vectorized UDAF: a ``pandas_udf`` in GROUPED_AGG mode (Arrow
    series in → one scalar out per group), completing the UDF surface next
    to the scalar pandas UDF, the grouped-map transform, the cogrouped
    as-of, and the Python UDTF.  Contract query: the production path for
    a plain sum is the built-in (its codegen twin is this oracle); the
    UDAF tier exists for aggregations Spark lacks, and this pins the API
    + exactness (int64 pandas summation, no float detour).

    GROUPED_AGG UDAFs also work as window functions over unbounded frames
    — same Arrow batch path.  Unlike grouped-map, partial aggregation is
    NOT available (each group's values gather to one executor), which is
    the documented scale trade: use only when the aggregate is truly
    custom."""
    # wrapped here, not at module level: pandas_udf parses its DDL return
    # type eagerly and needs an active session.  Both aggregates are UDAFs
    # — Spark forbids mixing GROUPED_AGG pandas UDFs with built-in
    # aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT)
    sum_tokens = F.pandas_udf(_sum_tokens_py, "long")
    count_rows = F.pandas_udf(_count_rows_py, "long")
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        sum_tokens(F.col("n_chars")).alias("total_chars"),
        count_rows(F.col("n_chars")).alias("n_docs"),
    )
