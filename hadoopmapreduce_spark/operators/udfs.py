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

from hadoopmapreduce_spark.catalog import load_spread, load_table
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
    # row-at-a-time Python expansion: spread the single-split scan
    d = load_spread(spark, sf_dir, "documents")
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


# --------------------------------------------------------------------------
# t-digest — mergeable quantile sketch (partial digests → merge), the
# UDAF-tier sketch NOTES.md round 5 planned.  Deterministic by construction:
# bucket assignment is content-derived, every compress sorts its input, and
# the merge concatenates buckets in bucket order — so the driver's value
# hash is stable even though the estimate is approximate (rows-only
# registration, like the other sketches; error bound pinned in
# tests/test_udfs.py).
# --------------------------------------------------------------------------

TDIGEST_DELTA = 100
TDIGEST_BUCKETS = 16
TDIGEST_QS = (0.25, 0.5, 0.75, 0.9, 0.99)


def _tdigest_compress(means, weights, delta=TDIGEST_DELTA):
    """One pass of t-digest clustering (Dunning & Ertl, k0-style size cap
    ``4·n·q(1-q)/δ``).  Input order does not matter: centroids are sorted
    by (mean, weight) first, so the result is a pure function of the
    multiset — the property that makes the sketch mergeable AND the output
    deterministic under Spark's nondeterministic partial ordering."""
    import numpy as np

    means = np.asarray(means, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.float64)
    order = np.lexsort((weights, means))
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = float(means[0]), float(weights[0])
    w_before = 0.0
    for m, w in zip(means[1:], weights[1:]):
        m, w = float(m), float(w)
        q = (w_before + cur_w / 2.0 + w / 2.0) / total
        cap = 4.0 * total * q * (1.0 - q) / delta
        if cur_w + w <= cap:
            cur_m += (m - cur_m) * (w / (cur_w + w))
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_before += cur_w
            cur_m, cur_w = m, w
    out_m.append(cur_m)
    out_w.append(cur_w)
    return out_m, out_w


def _tdigest_quantile(means, weights, q):
    """Standard centroid-midpoint linear interpolation; clamps to the
    extreme centroid means outside the first/last midpoints."""
    total = sum(weights)
    target = q * total
    cum = 0.0
    mids = []
    for m, w in zip(means, weights):
        mids.append((cum + w / 2.0, m))
        cum += w
    if target <= mids[0][0]:
        return mids[0][1]
    for (c0, m0), (c1, m1) in zip(mids, mids[1:]):
        if target <= c1:
            return m0 + (m1 - m0) * ((target - c0) / (c1 - c0))
    return mids[-1][1]


@query("udaf_tdigest_quantiles")
def udaf_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed quantile sketch over lineitem extendedprice per return
    flag, built the way a 100 TB job must: stage 1 digests each
    content-derived bucket independently (``applyInPandas`` per (flag,
    bucket) — the map-side partial), stage 2 merges the ≤δ-centroid partials
    per flag and reads the quantiles off the merged digest.  Only centroid
    lists cross the stage-2 shuffle (≤δ rows × 16 buckets per group), never
    raw values — the sketch property that replaces a full sort at scale.

    Rows-only by design (a t-digest has no SQL twin); the rank-error bound
    (≤ ~2·q(1-q)·4/δ of n) and the merge-vs-direct consistency are pinned in
    tests/test_udfs.py.  Reference has no quantiles at all
    (ClickThru.java:1-189; [EXT] mandate)."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType as _D,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").cast("double").alias("v"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", "l_orderkey", "l_linenumber")), 1, 6
                ),
                16,
                10,
            ).cast("long")
            % TDIGEST_BUCKETS
        ).alias("bucket"),
    )

    partial_schema = StructType(
        [
            StructField("flag", StringType()),
            StructField("bucket", LongType()),
            StructField("means", ArrayType(_D())),
            StructField("weights", ArrayType(_D())),
        ]
    )

    def build(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        vals = pdf["v"].to_numpy()
        m, w = _tdigest_compress(vals, [1.0] * len(vals))
        return pd.DataFrame(
            {"flag": [key[0]], "bucket": [key[1]], "means": [m], "weights": [w]}
        )

    partials = li.groupBy("flag", "bucket").applyInPandas(build, partial_schema)

    out_schema = StructType(
        [
            StructField("flag", StringType()),
            StructField("q", _D()),
            StructField("est", _D()),
        ]
    )

    def merge(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("bucket", kind="mergesort")
        means: list[float] = []
        weights: list[float] = []
        for ms, ws in zip(pdf["means"], pdf["weights"]):
            means.extend(ms)
            weights.extend(ws)
        m, w = _tdigest_compress(means, weights)
        return pd.DataFrame(
            {
                "flag": key[0],
                "q": list(TDIGEST_QS),
                "est": [_tdigest_quantile(m, w, q) for q in TDIGEST_QS],
            }
        )

    return partials.groupBy("flag").applyInPandas(merge, out_schema)


def _arrow_token_stats(batches):
    """mapInArrow kernel: per-row token/char stats computed with pyarrow
    compute kernels — no pandas materialization, zero-copy columnar in and
    out.  Integer outputs only, so the Arrow path is bit-checkable against
    the SQL twin."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        text = batch.column("text")
        n_chars = pc.utf8_length(text)
        # tokens = whitespace runs + 1 (fixture text never has leading/
        # trailing whitespace; the SQL twin uses the same convention)
        n_tokens = pc.add(
            pc.count_substring_regex(text, r"\s+"), pa.scalar(1, pa.int64())
        )
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("doc_id"),
                pc.cast(n_chars, pa.int64()),
                pc.cast(n_tokens, pa.int64()),
            ],
            ["doc_id", "n_chars", "n_tokens"],
        )


@query(
    "udf_arrow_token_stats",
    oracle=r"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens
    FROM documents
    """,
)
def udf_arrow_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` contract query — the fourth Python-interop surface
    (after scalar pandas UDF, grouped/cogrouped applyInPandas, and UDTF):
    RecordBatches cross into Python with NO pandas conversion and the
    kernel runs pyarrow compute functions, the lowest-overhead Python
    boundary Spark offers.  Per-doc char and whitespace-token counts in
    exact integers, bit-checked against the SQL twin (the production path:
    text_stats' pure-codegen expressions).

    Shape: embarrassingly parallel map over scan batches — no shuffle, no
    state; the Arrow boundary cost is per-batch, not per-row."""
    d = load_spread(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInArrow(
        _arrow_token_stats,
        "doc_id bigint, n_chars bigint, n_tokens bigint",
    )
