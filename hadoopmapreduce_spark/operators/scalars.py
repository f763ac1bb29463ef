"""[GEN] Scalar function suites.

The reference's entire expression language is: substring/indexOf, string
concat, contains, regex split, float parse/format, and JSON field get/has
(cited per-op in SURVEY.md §2.4).  Each query below exercises one function
family over the fixtures with a DuckDB twin; all run inside whole-stage
codegen (no Python).

Cross-engine parity traps handled here:
  * DuckDB ``regexp_replace`` replaces the FIRST match unless given the 'g'
    flag; Spark replaces all → oracle always passes 'g'.
  * Only IEEE-exact math (abs/floor/ceil/round/sqrt/x*x/mod) is compared —
    libm-dependent fns (exp/ln/pow) differ in last ulps between JVM and C++.
  * Day-of-week conventions differ → not used.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoopmapreduce_spark.catalog import load_table
from hadoopmapreduce_spark.registry import query


@query(
    "fn_string_suite",
    oracle="""
    SELECT p_partkey AS partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           substr(p_type, 1, 5) AS type_prefix,
           length(p_name) AS name_len,
           replace(p_type, ' ', '_') AS type_snake,
           CASE WHEN strpos(p_type, 'BRUSHED') > 0 THEN 1 ELSE 0 END AS is_brushed,
           lpad(p_brand, 12, '*') AS brand_padded,
           trim(concat('  ', p_name, '  ')) AS name_trimmed,
           len(string_split(p_type, ' ')) AS type_words
    FROM part
    """,
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: upper/lower/substr/length/replace/contains(instr)/
    lpad/trim/concat/split — the reference's substring+indexOf+concat
    vocabulary (``ClickThru.java:98,116,142,160-166``) generalized."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.when(F.instr(F.col("p_type"), "BRUSHED") > 0, 1).otherwise(0).alias("is_brushed"),
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trimmed"),
        F.size(F.split("p_type", " ")).alias("type_words"),
    )


@query(
    "fn_date_suite",
    oracle="""
    SELECT o_orderkey AS orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           quarter(o_orderdate) AS qtr,
           day(o_orderdate) AS dom,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
           last_day(CAST(o_orderdate AS DATE)) AS month_end
    FROM orders
    """,
)
def fn_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family (none exists in the reference): extract parts,
    truncate, diff, last_day.  These all stay in codegen and fold into
    partition pruning when the table is date-partitioned."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.quarter(d).alias("qtr"),
        F.dayofmonth(d).alias("dom"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        F.last_day(d.cast("date")).alias("month_end"),
    )


@query(
    "fn_math_suite",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
           abs(l_extendedprice - 50000.0) AS abs_dev,
           -- DuckDB floor/ceil return DOUBLE; Spark's return BIGINT — cast so
           -- the driver's value hash compares like types
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_floor_k,
           CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_round1,
           l_extendedprice - floor(l_extendedprice) AS price_frac,
           sqrt(l_quantity) AS qty_sqrt,
           l_discount * l_discount AS disc_sq,
           l_orderkey % 7 AS key_mod
    FROM lineitem
    """,
)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family restricted to IEEE-deterministic ops (sqrt is correctly
    rounded by both engines; exp/ln/pow are libm-dependent and excluded from
    oracle-checked surface)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.abs(F.col("l_extendedprice") - 50000.0).alias("abs_dev"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_floor_k"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.round(F.col("l_extendedprice").cast("decimal(18,2)"), 1)
        .cast("double")
        .alias("price_round1"),
        (F.col("l_extendedprice") - F.floor("l_extendedprice")).alias("price_frac"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_discount") * F.col("l_discount")).alias("disc_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@query(
    "fn_array_suite",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS min_val,
           CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS max_val,
           list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
                       (a, b) -> a + b) AS norm_sq
    FROM embeddings
    """,
)
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over the embedding column: size, index, min/max, and a
    fused transform+aggregate (squared L2 norm).  Both engines fold the
    lambda sequentially over the same element order in double precision, so
    the result is bit-stable.  This is the JVM-side primitive the similarity
    operators build on — no Python in the loop."""
    e = load_table(spark, sf_dir, "embeddings")
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.array_min("embedding").cast("double").alias("min_val"),
        F.array_max("embedding").cast("double").alias("max_val"),
        F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x * x).alias("norm_sq"),
    )


@query(
    "fn_json_suite",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CASE WHEN json_extract_string(props, '$.k') IS NOT NULL THEN 1 ELSE 0 END AS has_k,
           length(props) AS raw_len
    FROM events
    """,
)
def fn_json_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: field get + has-key — the reference's entire JSON usage
    (``jsnObj.get``/``has``, ``ClickThru.java:105,111``) over the events
    props column."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k")
    return ev.select(
        "event_id",
        k.cast("bigint").alias("k_val"),
        F.when(k.isNotNull(), 1).otherwise(0).alias("has_k"),
        F.length("props").alias("raw_len"),
    )


@query(
    "fn_conditional_suite",
    oracle="""
    SELECT o_orderkey AS orderkey,
           CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              ELSE 'pending' END AS status_label,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'was_p') AS coalesced,
           CASE WHEN o_totalprice > 150000 THEN 'big' ELSE 'small' END AS size_label
    FROM orders
    """,
)
def fn_conditional_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: CASE/coalesce/nullif — null-safe branching (the
    reference's analogue is the has-key probe + silent stale-value bug E1,
    which typed null propagation eliminates)."""
    o = load_table(spark, sf_dir, "orders")
    s = F.col("o_orderstatus")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.when(s == "F", "finished").when(s == "O", "open").otherwise("pending").alias(
            "status_label"
        ),
        F.coalesce(F.nullif(s, F.lit("P")), F.lit("was_p")).alias("coalesced"),
        F.when(F.col("o_totalprice") > 150000, "big").otherwise("small").alias(
            "size_label"
        ),
    )


@query(
    "fn_regex_suite",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '^(\\w+)', 1) AS first_word,
           length(regexp_replace(text, '[aeiou]', '', 'g')) AS deveoweled_len,
           len(regexp_split_to_array(text, '\\s+')) AS ws_tokens,
           CASE WHEN regexp_matches(text, 'spark') THEN 1 ELSE 0 END AS mentions_spark
    FROM documents
    """,
)
def fn_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family (generalizing the reference's delimiter-regex split,
    ``ClickThru.java:163``).  Patterns restricted to the RE2∩Java-regex
    common subset; DuckDB's replace needs the 'g' flag for parity."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.regexp_extract(t, r"^(\w+)", 1).alias("first_word"),
        F.length(F.regexp_replace(t, "[aeiou]", "")).alias("deveoweled_len"),
        F.size(F.split(t, r"\s+")).alias("ws_tokens"),
        F.when(t.rlike("spark"), 1).otherwise(0).alias("mentions_spark"),
    )


@query(
    "fn_cast_suite",
    oracle="""
    SELECT o_orderkey AS orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR) AS price_int_str,
           CAST(substr(CAST(o_orderkey AS VARCHAR), 1, 2) AS BIGINT) AS key_prefix,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec_roundtrip
    FROM orders
    """,
)
def fn_cast_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast family (the reference's Float.parseFloat/toString,
    ``ClickThru.java:183,186``).  Integer↔string casts are representation-
    stable across engines; double→string is not and is never emitted."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.floor("o_totalprice").cast("bigint").cast("string").alias("price_int_str"),
        F.substring(F.col("o_orderkey").cast("string"), 1, 2)
        .cast("bigint")
        .alias("key_prefix"),
        # decimal→double round trip rather than a raw decimal output column:
        # pandas dtype for DECIMAL differs between engines (object[Decimal]
        # vs float64), which would trip a dtype-sensitive results hash
        F.col("o_totalprice")
        .cast("decimal(18,2)")
        .cast("double")
        .alias("price_dec_roundtrip"),
    )


@query(
    "fn_map_suite",
    oracle="""
    WITH m AS (
      SELECT o_orderkey,
             map(['status', 'priority'],
                 [o_orderstatus, o_orderpriority]) AS props
      FROM orders)
    SELECT o_orderkey AS orderkey,
           props['status'][1] AS status_val,
           props['priority'][1] AS priority_val,
           len(map_keys(props)) AS n_keys,
           CASE WHEN array_contains(map_keys(props), 'status') THEN 1 ELSE 0 END AS has_status
    FROM m
    """,
)
def fn_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: construct, extract, keys, membership — over an ad-hoc
    string map built from order columns (MapType columns behave like the
    events.props JSON once parsed; this exercises the typed form)."""
    o = load_table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.element_at(m, "status").alias("status_val"),
        F.element_at(m, "priority").alias("priority_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.array_contains(F.map_keys(m), "status").cast("int").alias("has_status"),
    )


@query(
    "fn_explode_suite",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             unnest(list_zip(regexp_split_to_array(text, '\\s+'),
                             range(0, len(regexp_split_to_array(text, '\\s+'))))) AS z
      FROM documents
    )
    SELECT doc_id, CAST(z[2] AS INT) AS pos, CAST(z[1] AS VARCHAR) AS tok
    FROM t
    """,
)
def fn_explode_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating explode with ordinality (posexplode) — the typed
    UDTF shape (one input row → N output rows with position).  Lazy and
    JVM-side; the DuckDB twin zips tokens with their indices before
    unnesting."""
    from hadoopmapreduce_spark.catalog import load_table as _lt

    d = _lt(spark, sf_dir, "documents")
    ts = F.split(F.col("text"), r"\s+")
    return d.select(
        "doc_id", F.posexplode(ts).alias("pos", "tok")
    ).select("doc_id", F.col("pos").cast("int").alias("pos"), "tok")


@query(
    "fn_fuzzy_suite",
    oracle="""
    WITH t AS (
      SELECT doc_id, regexp_extract(text, '^(\\w+)', 1) AS w FROM documents)
    SELECT doc_id,
           w AS first_word,
           levenshtein(w, 'spark') AS dist_spark,
           levenshtein(w, 'query') AS dist_query,
           CASE WHEN levenshtein(w, 'spark') <= 2 THEN 1 ELSE 0 END AS near_spark,
           translate(w, 'aeiou', '_____') AS vowels_masked,
           reverse(w) AS reversed,
           repeat(substr(w, 1, 2), 2) AS doubled_prefix
    FROM t
    """,
)
def fn_fuzzy_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy/string-edit family: levenshtein distance (the character-level
    near-dup primitive complementing token-level Jaccard), translate,
    reverse, repeat.  Edit distance is integer-exact — safe across engines
    — and a bounded-distance filter is the classic fuzzy-join predicate
    (at scale: length/prefix banding first, then edit distance on
    candidates, mirroring the MinHash verify-on-candidates shape)."""
    d = load_table(spark, sf_dir, "documents")
    w = F.regexp_extract(F.col("text"), r"^(\w+)", 1)
    return d.select(
        "doc_id",
        w.alias("first_word"),
        F.levenshtein(w, F.lit("spark")).alias("dist_spark"),
        F.levenshtein(w, F.lit("query")).alias("dist_query"),
        F.when(F.levenshtein(w, F.lit("spark")) <= 2, 1).otherwise(0).alias("near_spark"),
        F.translate(w, "aeiou", "_____").alias("vowels_masked"),
        F.reverse(w).alias("reversed"),
        F.repeat(F.substring(w, 1, 2), 2).alias("doubled_prefix"),
    )


@query(
    "fn_bitwise_suite",
    oracle="""
    SELECT o_orderkey AS orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 7 AS or7,
           xor(o_orderkey, 21) AS xor21,
           (o_orderkey % 1024) << 2 AS shifted_l,
           o_orderkey >> 3 AS shifted_r,
           bit_count(o_orderkey) AS popcount
    FROM orders
    """,
)
def fn_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor/shifts/popcount — the primitives under
    SimHash banding and bitmap-style encodings; integer-exact across
    engines.  Shift amount domain kept under 2^62 (ANSI overflow throws)."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        k.alias("orderkey"),
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(7)).alias("or7"),
        k.bitwiseXOR(F.lit(21)).alias("xor21"),
        F.shiftleft(k % 1024, 2).alias("shifted_l"),
        F.shiftright(k, 3).alias("shifted_r"),
        F.bit_count(k).alias("popcount"),
    )


@query(
    "fn_trycast_suite",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id AS VARCHAR)
                  WHEN doc_id % 3 = 1 THEN 'not-a-number'
                  ELSE '' END AS raw
      FROM documents)
    SELECT doc_id, raw,
           TRY_CAST(raw AS BIGINT) AS as_int,
           CASE WHEN TRY_CAST(raw AS BIGINT) IS NULL THEN 1 ELSE 0 END AS failed
    FROM t
    """,
)
def fn_trycast_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe casting: try_cast yields NULL on malformed input instead
    of an ANSI runtime error — the typed-ingest counterpart of the tolerant
    JSON reader (dirty values become accountable nulls, never task
    failures).  Domain restricted to clean-integer/garbage strings: the
    engines agree there, but differ on decimal-string→int (DuckDB rounds,
    Spark rejects) — that asymmetry is deliberately excluded."""
    d = load_table(spark, sf_dir, "documents")
    raw = (
        F.when(F.col("doc_id") % 3 == 0, F.col("doc_id").cast("string"))
        .when(F.col("doc_id") % 3 == 1, F.lit("not-a-number"))
        .otherwise(F.lit(""))
    )
    as_int = raw.try_cast("bigint")
    return d.select(
        "doc_id",
        raw.alias("raw"),
        as_int.alias("as_int"),
        F.when(as_int.isNull(), 1).otherwise(0).alias("failed"),
    )


@query(
    "fn_array_setops",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_sort(list_distinct(regexp_split_to_array(text, '\\s+'))) AS toks,
             ['spark', 'query', 'table', 'join'] AS probe
      FROM documents)
    SELECT doc_id,
           -- DuckDB's array_to_string renders the empty list as NULL
           COALESCE(array_to_string(list_sort(list_intersect(toks, probe)), ','), '') AS common,
           len(list_intersect(toks, probe)) AS n_common,
           COALESCE(array_to_string(list_sort(list_filter(probe, p -> NOT array_contains(toks, p))), ','), '') AS missing,
           len(list_distinct(toks || probe)) AS n_union
    FROM t
    """,
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set operations: intersect / difference / union against a probe
    vocabulary, with sorted string renderings so results are order-canonical
    across engines (array element ORDER is engine-defined; the sets aren't)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.array_sort(F.array_distinct(F.split(F.col("text"), r"\s+")))
    probe = F.array(*[F.lit(w) for w in ("spark", "query", "table", "join")])
    inter = F.array_intersect(toks, probe)
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(inter), ",").alias("common"),
        F.size(inter).alias("n_common"),
        F.array_join(F.array_sort(F.array_except(probe, toks)), ",").alias("missing"),
        F.size(F.array_distinct(F.concat(toks, probe))).alias("n_union"),
    )


@query(
    "fn_map_transform_suite",
    oracle="""
    -- the oracle computes each map-HOF result from the base columns the map
    -- was built from (DuckDB lacks map_zip_with/transform_keys; the POINT is
    -- verifying Spark's map-transform semantics against first principles)
    SELECT o_orderkey AS orderkey,
           lower(o_orderstatus) AS status_lower,
           'k_priority' AS first_renamed_key,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS n_f_entries,
           2 AS n_merged_keys,
           o_orderstatus || '|' || o_orderpriority AS zipped_val
    FROM orders
    """,
)
def fn_map_transform_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: transform_values / transform_keys /
    map_filter / map_concat / map_zip_with over a typed map built from order
    columns.  All JVM-side lambda expressions; the oracle recomputes each
    result from the underlying columns (first-principles twin)."""
    o = load_table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    lowered = F.transform_values(m, lambda _k, v: F.lower(v))
    renamed = F.transform_keys(m, lambda k, _v: F.concat(F.lit("k_"), k))
    only_f = F.map_filter(m, lambda _k, v: v == "F")
    merged = F.map_concat(
        F.create_map(F.lit("status"), F.col("o_orderstatus")),
        F.create_map(F.lit("extra"), F.lit("x")),
    )
    m2 = F.create_map(
        F.lit("status"), F.col("o_orderpriority"),
        F.lit("priority"), F.col("o_orderstatus"),
    )
    zipped = F.map_zip_with(m, m2, lambda _k, v1, v2: F.concat_ws("|", v1, v2))
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.element_at(lowered, "status").alias("status_lower"),
        F.array_min(F.map_keys(renamed)).alias("first_renamed_key"),
        F.size(only_f).alias("n_f_entries"),
        F.size(merged).alias("n_merged_keys"),
        F.element_at(zipped, "status").alias("zipped_val"),
    )


@query(
    "fn_interval_suite",
    oracle="""
    SELECT o_orderkey AS orderkey,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_date,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS quarter_later,
           CAST(o_orderdate AS DATE) - INTERVAL 7 DAY AS week_before,
           make_date(year(o_orderdate), month(o_orderdate), 1) AS month_floor,
           CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS DATE) AS week_start
    FROM orders
    """,
)
def fn_interval_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/date arithmetic: day/month offsets (add_months handles
    month-end clamping identically in both engines), make_date construction,
    week truncation.  All codegen'd; month arithmetic through add_months
    rather than raw INTERVAL MONTH so clamping semantics are explicit.
    DuckDB's date + INTERVAL yields TIMESTAMP, so the oracle casts month
    arithmetic back to DATE to match Spark's add_months; day offsets are
    compared as timestamps (midnight) on both sides."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.date_add(d, 30).cast("timestamp").alias("due_date"),
        F.add_months(d, 3).alias("quarter_later"),
        F.date_sub(d, 7).cast("timestamp").alias("week_before"),
        F.make_date(F.year(d), F.month(d), F.lit(1)).alias("month_floor"),
        F.date_trunc("week", d).cast("date").alias("week_start"),
    )


@query(
    "fn_variant_suite",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
           CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k_str,
           CAST(json_extract_string(props, '$.missing') AS BIGINT) AS k_missing,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS k_mod
    FROM events
    """,
)
def fn_variant_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path: ``parse_json`` once into the binary
    semi-structured type, then typed ``variant_get`` extractions — the
    modern replacement for repeated ``get_json_object`` string re-parses
    (the VARIANT value parses the JSON ONCE and each extraction is a
    binary-encoded field probe, which is the 100 TB difference: N
    extractions cost one parse, not N).  Missing paths yield typed NULLs;
    DuckDB's twin re-extracts from text because it has no variant type —
    same values, different engine representation."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k_long = F.try_variant_get(v, "$.k", "bigint")
    return ev.select(
        "event_id",
        k_long.alias("k_long"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "bigint").alias("k_missing"),
        (k_long % 7).alias("k_mod"),
    )


@query(
    "fn_struct_suite",
    oracle="""
    WITH s AS (
      SELECT o_orderkey,
             {'status': o_orderstatus, 'price': CAST(o_totalprice AS DECIMAL(18,2))} AS st,
             {'status': o_orderstatus,
              'price': CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)} AS stj
      FROM orders WHERE o_orderkey % 13 = 0)
    SELECT o_orderkey AS orderkey,
           st.status AS status_field,
           CAST(st.price AS DOUBLE) AS price_field,
           CASE WHEN st.status = 'O' AND st.price > 100000 THEN 1 ELSE 0 END
             AS is_big_open,
           CAST(to_json(stj) AS VARCHAR) AS st_json
    FROM s
    """,
)
def fn_struct_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct scalar functions: construct (named_struct), field access,
    predicates over fields, and JSON serialization — the nested-type
    surface the reference's flat string records never had (SURVEY.md §1.1:
    "no nested types").

    The struct itself never appears in the output (engines canonicalize
    nested values differently in result sets); everything compared is a
    scalar PROJECTION of it, plus to_json whose field order is the
    construction order in both engines.  The serialized struct carries the
    price as a decimal-formatted STRING: engines agree on decimal→string
    unconditionally, while JSON *number* serialization differs (DuckDB
    strips the trailing zero of 465799.50, Spark keeps the scale)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 13 == 0)
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    st = F.struct(
        F.col("o_orderstatus").alias("status"), price_dec.alias("price")
    )
    stj = F.struct(
        F.col("o_orderstatus").alias("status"),
        price_dec.cast("string").alias("price"),
    )
    with_s = o.select(
        F.col("o_orderkey").alias("orderkey"), st.alias("st"), stj.alias("stj")
    )
    return with_s.select(
        "orderkey",
        F.col("st.status").alias("status_field"),
        F.col("st.price").cast("double").alias("price_field"),
        F.when(
            (F.col("st.status") == "O") & (F.col("st.price") > 100000), 1
        )
        .otherwise(0)
        .alias("is_big_open"),
        F.to_json(F.col("stj")).alias("st_json"),
    )


@query(
    "fn_array_hof_suite",
    oracle="""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks
      FROM documents)
    SELECT doc_id,
           CAST(len(list_filter(toks, x -> length(x) > 8)) AS INT) AS n_long,
           CASE WHEN len(list_filter(toks, x -> x LIKE 'term%')) > 0
                THEN 1 ELSE 0 END AS any_term,
           CASE WHEN len(list_filter(toks, x -> NOT length(x) > 0)) = 0
                THEN 1 ELSE 0 END AS all_nonempty,
           list_reverse(toks)[1] AS last_tok,
           CAST(list_position(toks, toks[1]) AS INT) AS first_pos
    FROM t
    """,
)
def fn_array_hof_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array predicates: filter-count, exists, forall, reverse
    indexing, and position — the HOF surface beyond fn_array_suite's
    transform/aggregate.  exists/forall compile to Spark's ArrayExists/
    ArrayForAll codegen; DuckDB expresses them as list_filter lengths, with
    identical boolean semantics on non-null elements."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    return d.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: F.length(x) > 8)).alias("n_long"),
        F.exists(toks, lambda x: x.startswith("term"))
        .cast("int")
        .alias("any_term"),
        F.forall(toks, lambda x: F.length(x) > 0).cast("int").alias(
            "all_nonempty"
        ),
        F.element_at(F.reverse(toks), 1).alias("last_tok"),
        F.array_position(toks, F.element_at(toks, 1))
        .cast("int")
        .alias("first_pos"),
    )


@query(
    "fn_binary_suite",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS INT) AS n_bytes,
           to_base64(text::BLOB) AS b64,
           md5(text) AS content_md5,
           hex(substr(text, 1, 4)::BLOB) AS head_hex,
           CAST(8 * length(text) AS INT) AS bit_len
    FROM documents WHERE doc_id % 11 = 0
    """,
)
def fn_binary_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary family over payload bytes: octet length, base64, md5, hex of
    a byte-range head, bit length — the blob toolkit the multimodal
    convention (binary payload + typed metadata) relies on.  The fixture
    text is ASCII so utf-8 bytes == characters and both engines hash/encode
    identical byte strings; Spark's hex() uppercases, DuckDB's hex() also
    uppercases — base64 alphabets are RFC 4648 in both, but Spark emits
    MIME-wrapped output (CRLF every 76 chars, java.util.Base64.getMimeEncoder
    heritage) while DuckDB emits the bare form, so the wrap is stripped."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 0)
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.replace(F.base64(payload), F.lit("\r\n"), F.lit("")).alias("b64"),
        F.md5(payload).alias("content_md5"),
        F.hex(F.expr("substring(encode(text, 'utf-8'), 1, 4)")).alias(
            "head_hex"
        ),
        F.bit_length(payload).alias("bit_len"),
    )


def _xxhash64_oracle() -> str:
    from hadoopmapreduce_spark.functions import xxh64_sql as X

    steps: list[tuple[str, str]] = []
    h_key = X.hash_long_steps(steps, "doc_id", "42::HUGEINT", "k")
    h_lang = X.hash_string_steps(steps, "lang", "42::HUGEINT", "g")
    h_text = X.hash_string_steps(steps, "text", "42::HUGEINT", "c")
    chain1 = X.hash_long_steps(steps, "doc_id", "42::HUGEINT", "x1")
    h_chain = X.hash_string_steps(steps, "text", chain1, "x2")
    return X.steps_to_sql(
        "SELECT doc_id, lang, text FROM documents",
        steps,
        f"""SELECT doc_id,
               {X.signed_col(h_key)} AS h_key,
               {X.signed_col(h_lang)} AS h_lang,
               {X.signed_col(h_text)} AS h_text,
               {X.signed_col(h_chain)} AS h_chain
        FROM __LAST__""",
    )


@query("fn_xxhash64_suite", oracle=_xxhash64_oracle())
def fn_xxhash64_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xxHash64 differential suite: Spark's ``xxhash64`` (seed 42) vs a
    bit-exact DuckDB SQL port (functions/xxh64_sql.py — constant-multiplier
    limb arithmetic on HUGEINT, list_reduce stripe/tail loops, chained CTE
    steps).  Four shapes over ``documents``: the BIGINT fast path
    (``hashLong``), short strings (``lang`` — the <32-byte tail-only
    path), medium strings (``text``, 47-558 bytes — 1 to 17 rounds of the
    4-accumulator stripe loop plus every tail branch), and multi-column
    seed chaining (column i's hash seeds column i+1).

    Why it matters: xxhash64 keys hash-partitioning, LSH band ids, and
    bloom prefilters across this repo; until now those internals were
    verified via their downstream OUTPUTS because DuckDB lacked the hash.
    This suite pins the primitive itself, bit-for-bit, over every row of a
    fixture table — so xxhash64-derived keys anywhere else can now be
    trusted cross-engine (and promoted to full oracles where useful).

    Scale: pure codegen JVM-side; one projection, no shuffle, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.xxhash64("doc_id").alias("h_key"),
        F.xxhash64("lang").alias("h_lang"),
        F.xxhash64("text").alias("h_text"),
        F.xxhash64("doc_id", "text").alias("h_chain"),
    )


@query(
    "fn_url_suite",
    oracle=r"""
    WITH urls AS (
      SELECT doc_id,
             'https://data.example.com/' || source || '/' || doc_id
               || '?lang=' || lang || '&n=' || n_chars || '#sec-' || (doc_id % 7)
               AS url,
             lang, source
      FROM documents WHERE doc_id % 13 = 0)
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+):', 1) AS protocol,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]*(/[^?#]*)', 1) AS path,
           regexp_extract(url, '\?([^#]*)', 1) AS query,
           regexp_extract(url, 'lang=([^&#]*)', 1) AS q_lang,
           regexp_extract(url, '#(.*)$', 1) AS ref,
           replace(lang || ' ' || source, ' ', '+') AS encoded,
           lang || ' ' || source AS decoded
    FROM urls
    """,
)
def fn_url_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function family: ``parse_url`` (PROTOCOL/HOST/PATH/QUERY/REF and
    keyed QUERY lookup) plus ``url_encode``/``url_decode`` round-trip —
    the log-ingestion toolkit (every clickstream pipeline splits URLs).
    URLs are synthesized from fixture columns, so the suite runs over real
    rows; DuckDB has no parse_url, so the twin is the component regexes of
    RFC 3986's reference grammar.  The encode case uses a value with a
    space (``x-www-form-urlencoded`` turns it into '+'; the remaining
    charset is alphanumeric, where Java's URLEncoder is the identity) so
    the encoding is actually exercised, not vacuous."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 13 == 0)
    url = F.concat(
        F.lit("https://data.example.com/"),
        F.col("source"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&n="),
        F.col("n_chars").cast("string"),
        F.lit("#sec-"),
        (F.col("doc_id") % 7).cast("string"),
    )
    u = d.select("doc_id", "lang", "source", url.alias("url"))
    pu = lambda part: F.parse_url(F.col("url"), F.lit(part))  # noqa: E731
    spaced = F.concat(F.col("lang"), F.lit(" "), F.col("source"))
    return u.select(
        "doc_id",
        F.lower(pu("PROTOCOL")).alias("protocol"),
        pu("HOST").alias("host"),
        pu("PATH").alias("path"),
        pu("QUERY").alias("query"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang")).alias("q_lang"),
        pu("REF").alias("ref"),
        F.url_encode(spaced).alias("encoded"),
        F.url_decode(F.url_encode(spaced)).alias("decoded"),
    )
