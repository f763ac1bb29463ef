"""[EXT] Text-analysis operators for LLM training-data pipelines.

All pure JVM-side column expressions (no Python in the hot path): tokenize /
count / ratio arithmetic is whole-stage-codegen'd, and every query is a
single scan + narrow transforms (+ one aggregate where noted) — the
embarrassingly-parallel shape that scales linearly to 100 TB.

Determinism: ratios are int/int double divisions (exact inputs, fixed
operation order) and fingerprints are md5-based (identical hex output on
both engines), so everything here is oracle-checkable bit-exactly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from hadoopmapreduce_spark.catalog import load_spread, load_table
from hadoopmapreduce_spark.registry import query


def _tokens(col):
    return F.split(col, r"\s+")


@query(
    "text_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, text,
             regexp_split_to_array(text, '\\s+') AS ts
      FROM documents)
    SELECT doc_id, lang,
           length(text) AS n_chars,
           len(ts) AS n_tokens,
           len(list_distinct(ts)) AS n_distinct_tokens,
           CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(ts) AS avg_token_len,
           CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts) AS distinct_ratio,
           list_aggregate(list_transform(ts, x -> length(x)), 'max') AS max_token_len
    FROM t
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document statistics: char/token/distinct-token counts, mean token
    length, type-token ratio, longest token."""
    d = load_spread(spark, sf_dir, "documents")
    ts = _tokens(F.col("text"))
    n_tokens = F.size(ts)
    n_distinct = F.size(F.array_distinct(ts))
    return d.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / n_tokens
        ).alias("avg_token_len"),
        (n_distinct.cast("double") / n_tokens).alias("distinct_ratio"),
        F.array_max(F.transform(ts, F.length)).alias("max_token_len"),
    )


@query(
    "topk_terms",
    oracle="""
    SELECT tok AS term, COUNT(*) AS n
    FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS tok FROM documents)
    GROUP BY 1
    ORDER BY n DESC, term ASC
    LIMIT 100
    """,
)
def topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequency top-k — the classic MapReduce wordcount
    generalized from the reference's shuffle-and-count skeleton.  Partial
    aggregation absorbs token skew map-side; the final top-k is
    TakeOrderedAndProject (bounded heaps, no global sort)."""
    d = load_spread(spark, sf_dir, "documents")
    return (
        d.select(F.explode(_tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(100)
    )


# marker word-lists per language for the scoring heuristic.  NOTE: the
# synthetic fixture's text is language-agnostic term soup (identical
# vocabulary across langs), so *accuracy* against the lang column is chance —
# what the oracle verifies is the scoring/argmax semantics, which is the
# operator contract.  On real corpora the lists would be stopword profiles.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "fast"),
    "de": ("table", "join", "merge"),
    "es": ("query", "group", "row"),
    "fr": ("stream", "line", "sort"),
    "zh": ("spark", "window", "scan"),
}
_LANG_ORDER = ("en", "de", "es", "fr", "zh")


def _marker_sql(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang])
    return f"len(list_filter(ts, t -> t IN ({lst})))"


_GUESS_SQL = "CASE " + " ".join(
    "WHEN "
    + " AND ".join(f"s_{a} >= s_{b}" for b in _LANG_ORDER if b != a)
    + f" THEN '{a}'"
    for a in _LANG_ORDER
) + " ELSE 'en' END"


@query(
    "lang_id_markers",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {", ".join(f"{_marker_sql(lang)} AS s_{lang}" for lang in _LANG_ORDER)}
      FROM (SELECT doc_id, lang, regexp_split_to_array(text, '\\s+') AS ts FROM documents)
    )
    SELECT doc_id, lang, {_GUESS_SQL} AS lang_guess,
           CASE WHEN lang = {_GUESS_SQL} THEN 1 ELSE 0 END AS is_correct
    FROM scored
    """,
)
def lang_id_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via marker-word scoring (n-gram/stopword-profile family):
    count marker hits per language, argmax with a fixed preference order for
    ties.  One narrow pass, no shuffle.

    Occurrence counting uses size(ts) - size(array_remove(ts, w)) per marker
    word instead of a higher-order F.filter lambda: array_remove is a native
    codegen expression while HOF lambdas are interpreted per element — this
    cut the sf0.1 bench time ~6x with identical semantics (duplicates still
    counted, matching the oracle's list_filter)."""
    d = load_spread(spark, sf_dir, "documents")
    tokens = d.select("doc_id", "lang", _tokens(F.col("text")).alias("ts"))
    ts = F.col("ts")
    n = F.size(ts)

    def marker_count(markers: tuple[str, ...]):
        c = None
        for w in markers:
            cc = n - F.size(F.array_remove(ts, w))
            c = cc if c is None else c + cc
        return c

    scored = tokens.select(
        "doc_id",
        "lang",
        *[
            marker_count(_LANG_MARKERS[lang]).alias(f"s_{lang}")
            for lang in _LANG_ORDER
        ],
    )
    guess = F.lit("en")
    # build the same first-max CASE chain as the oracle
    expr = None
    for lang in _LANG_ORDER:
        cond = None
        for other in _LANG_ORDER:
            if other == lang:
                continue
            c = F.col(f"s_{lang}") >= F.col(f"s_{other}")
            cond = c if cond is None else (cond & c)
        expr = (
            F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
        )
    guess = expr.otherwise(F.lit("en"))
    return scored.select(
        "doc_id",
        "lang",
        guess.alias("lang_guess"),
        F.when(F.col("lang") == guess, 1).otherwise(0).alias("is_correct"),
    )


@query(
    "quality_score",
    oracle="""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ts, length(text) AS n_chars
      FROM documents)
    SELECT doc_id,
           0.4 * LEAST(CAST(len(ts) AS DOUBLE) / 60.0, 1.0)
         + 0.4 * (CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts))
         + 0.2 * LEAST(CAST(n_chars AS DOUBLE) / 300.0, 1.0) AS score,
           CASE WHEN 0.4 * LEAST(CAST(len(ts) AS DOUBLE) / 60.0, 1.0)
                   + 0.4 * (CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts))
                   + 0.2 * LEAST(CAST(n_chars AS DOUBLE) / 300.0, 1.0) >= 0.6
                THEN 'keep' ELSE 'drop' END AS verdict
    FROM t
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score — weighted blend of length saturation and
    type-token ratio, with a keep/drop verdict (the filter stage of a
    training-data pipeline).  Fixed-order double arithmetic over exact
    integer inputs → bit-stable."""
    d = load_spread(spark, sf_dir, "documents")
    ts = _tokens(F.col("text"))
    n_tokens = F.size(ts).cast("double")
    distinct_ratio = F.size(F.array_distinct(ts)).cast("double") / F.size(ts)
    n_chars = F.length("text").cast("double")
    score = (
        F.lit(0.4) * F.least(n_tokens / 60.0, F.lit(1.0))
        + F.lit(0.4) * distinct_ratio
        + F.lit(0.2) * F.least(n_chars / 300.0, F.lit(1.0))
    )
    return d.select(
        "doc_id",
        score.alias("score"),
        F.when(score >= 0.6, "keep").otherwise("drop").alias("verdict"),
    )


@query(
    "token_count_bpe",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))) AS BIGINT) AS total_tokens,
           MAX(len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))) AS max_doc_tokens
    FROM documents GROUP BY 1
    """,
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish pre-tokenizer regex (word runs +
    isolated punctuation) — the budget-estimation pass of a training
    pipeline, aggregated per language."""
    d = load_spread(spark, sf_dir, "documents")
    n_tok = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\w+|[^\w\s]"), F.lit(0)))
    return (
        d.select("lang", n_tok.alias("n_tok"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.max("n_tok").alias("max_doc_tokens"),
        )
    )


@query(
    "doc_fingerprint",
    oracle="""
    WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ts FROM documents)
    SELECT doc_id,
           md5(array_to_string(ts, ' ')) AS fp_full,
           CASE WHEN len(ts) >= 3 THEN
             list_aggregate(
               list_transform(range(1, len(ts) - 1),
                              i -> md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])),
               'min')
           ELSE md5(array_to_string(ts, ' ')) END AS fp_min_shingle
    FROM t
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whole-text md5 plus a winnowing-style
    min-shingle fingerprint (minimum md5 over 3-token shingles — robust to
    local edits, the 1-hash special case of the MinHash signature used by
    minhash_dedup).  md5 hex is identical across engines, so unlike
    xxhash-based sketches this one is oracle-checkable."""
    d = load_spread(spark, sf_dir, "documents")
    ts = _tokens(F.col("text"))
    joined = F.array_join(ts, " ")
    # shifted-slice zip (2 array passes) beats per-index slice+concat —
    # same construction as dedup._shingles
    n = F.size(ts)
    shingles = F.zip_with(
        F.zip_with(
            F.slice(ts, 1, n - 2), F.slice(ts, 2, n - 2),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        F.slice(ts, 3, n - 2),
        lambda ab, c: F.concat(ab, F.lit(" "), c),
    )
    shingle_md5s = F.transform(shingles, lambda s: F.md5(s.cast("binary")))
    return d.select(
        "doc_id",
        F.md5(joined.cast("binary")).alias("fp_full"),
        F.when(F.size(ts) >= 3, F.array_min(shingle_md5s))
        .otherwise(F.md5(joined.cast("binary")))
        .alias("fp_min_shingle"),
    )


SAMPLE_RATES = {"en": 50, "de": 80, "es": 80, "fr": 80, "zh": 30}  # percent


@query(
    "sample_stratified",
    oracle=f"""
    WITH bucketed AS (
      SELECT doc_id, lang, (doc_id * 2654435761) % 100 AS bucket
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN bucket < CASE lang
                 {' '.join(f"WHEN '{lang}' THEN {rate}" for lang, rate in SAMPLE_RATES.items())}
                 ELSE 0 END THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM bucketed GROUP BY 1
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language stratified sampling — the mixture-weight
    step of a training-data pipeline.  Membership is a pure function of the
    key (Knuth multiplicative hash mod 100 vs a per-stratum rate), so the
    sample is reproducible across runs/engines and needs no RNG state;
    at 100 TB it is a stateless narrow filter.  Output: per-language totals
    and sampled counts (the full sampled set is `bucket < rate`)."""
    d = load_spread(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * F.lit(2654435761)) % 100
    rate = None
    for lang, r in SAMPLE_RATES.items():
        rate = (
            F.when(F.col("lang") == lang, r)
            if rate is None
            else rate.when(F.col("lang") == lang, r)
        )
    rate = rate.otherwise(0)
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(bucket < rate, 1).otherwise(0)).alias("n_sampled"),
    )


PACK_TOKEN_BUDGET = 2000  # tokens per training shard


@query(
    "pack_token_budget",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_tok
      FROM documents),
    c AS (
      SELECT doc_id, lang, n_tok,
             SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - n_tok AS cum_before
      FROM t)
    SELECT doc_id, lang, n_tok,
           CAST(cum_before // {PACK_TOKEN_BUDGET} AS BIGINT) AS shard
    FROM c
    """,
)
def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: assign documents to fixed-token-budget
    training shards per language — running token count in a deterministic
    order, shard = floor(tokens-before / budget).

    Exact integer running sums make the assignment reproducible; at scale
    this is one window shuffle on the stratum key, and the shard id becomes
    the write partition (each output file ≈ one training chunk).  The
    greedy order-by-key policy trades ~half-a-document of per-shard slack
    for never needing a global bin-packing pass — the standard choice when
    shards number in the millions."""
    from pyspark.sql import Window as W

    d = load_spread(spark, sf_dir, "documents")
    n_tok = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\w+|[^\w\s]"), F.lit(0)))
    w = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    t = d.select("doc_id", "lang", n_tok.alias("n_tok"))
    cum_before = F.sum("n_tok").over(w) - F.col("n_tok")
    return t.select(
        "doc_id",
        "lang",
        "n_tok",
        F.floor(cum_before / PACK_TOKEN_BUDGET).cast("bigint").alias("shard"),
    )


VOCAB_SIZE = 1000


@query(
    "vocab_coverage",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok
      FROM documents),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, COUNT(*) AS n FROM toks GROUP BY 1
        ORDER BY n DESC, tok LIMIT {VOCAB_SIZE}))
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_in_vocab,
           CAST(SUM(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS coverage
    FROM toks t LEFT JOIN vocab v USING (tok)
    GROUP BY 1
    """,
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage: build the top-N term vocabulary from
    the corpus itself, then score each document by the fraction of its
    tokens inside the vocabulary — the OOV-rate pass of a tokenizer/corpus
    fit check.

    Scale shape: the vocabulary is a bounded top-N (partial-agg + bounded
    heap), broadcast to the token stream — the per-doc pass is one explode +
    broadcast hash join + re-group on doc_id.  The corpus-wide term count is
    the same aggregation topk_terms runs; nothing is quadratic."""
    d = load_spread(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok"))
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(VOCAB_SIZE)
        .select("tok", F.lit(1).alias("_in_vocab"))
    )
    hit = F.when(F.col("_in_vocab").isNotNull(), 1).otherwise(0)
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(hit).alias("n_in_vocab"),
            (F.sum(hit).cast("double") / F.count(F.lit(1))).alias("coverage"),
        )
    )


_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\+1-555-[0-9]{4}"


@query(
    "pii_redact",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com or +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
      FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones,
           regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM t
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the redaction pass every training-data pipeline runs
    before tokenization: count and mask email addresses and phone numbers.

    The fixture text is synthetic term soup with no PII, so a deterministic
    contact line (derived from doc_id) is appended first and then redacted —
    the oracle checks both the detection counts and the redacted bytes.
    Pure regexp codegen, embarrassingly parallel; note DuckDB's
    regexp_replace needs the 'g' flag to match Spark's replace-all
    default."""
    d = load_spread(spark, sf_dir, "documents")
    injected = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    t = d.select("doc_id", injected.alias("text"))
    email, phone = _EMAIL_RE, _PHONE_RE  # same pattern is valid Java + RE2
    return t.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(email), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(phone), F.lit(0))).alias(
            "n_phones"
        ),
        F.regexp_replace(
            F.regexp_replace(F.col("text"), email, "<EMAIL>"), phone, "<PHONE>"
        ).alias("redacted"),
    )


@query(
    "doc_repetition_signals",
    oracle="""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ts FROM documents),
    g AS (
      SELECT doc_id, 1 AS gram_n, u.g AS gram FROM t, UNNEST(ts) AS u(g)
      UNION ALL
      SELECT doc_id, 2 AS gram_n, ts[i] || ' ' || ts[i + 1] AS gram
      FROM t, UNNEST(range(1, len(ts))) AS r(i)),
    c AS (
      SELECT doc_id, gram_n, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2, 3)
    SELECT doc_id, gram_n,
           CAST(SUM(cnt) AS BIGINT) AS total_grams,
           CAST(MAX(cnt) AS BIGINT) AS top_gram_count,
           CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) AS top_gram_frac,
           CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE)
             / SUM(cnt) AS dup_gram_frac
    FROM c GROUP BY 1, 2
    """,
)
def doc_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals: per document, the fraction
    of mass held by the single most frequent word / bigram
    (``top_gram_frac``) and the fraction covered by grams occurring more
    than once (``dup_gram_frac``) — high values flag boilerplate and
    spam-generated text for pipeline filtering.

    One scan: unigrams and bigrams are built array-side (bigrams via
    ``zip_with`` over two shifted slices — codegen-friendly, no per-index
    lambda), tagged with their gram size, exploded once, and reduced by two
    hash aggregates (doc×gram counts, then doc-level maxima/sums).  All
    shuffle keys include doc_id, so data spreads over the cluster; the
    fractions are int/int double divisions — bit-exact cross-engine."""
    docs = load_spread(spark, sf_dir, "documents")
    ts = F.split(F.col("text"), r"\s+")
    n = F.size(ts)
    bigrams = F.zip_with(
        F.slice(ts, 1, n - 1),
        F.slice(ts, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    tag = lambda arr, k: F.transform(
        arr, lambda g: F.struct(F.lit(k).alias("gram_n"), g.alias("gram"))
    )
    grams = F.concat(tag(ts, 1), tag(bigrams, 2))
    counts = (
        docs.select("doc_id", F.explode(grams).alias("g"))
        .groupBy("doc_id", F.col("g.gram_n").alias("gram_n"), F.col("g.gram").alias("gram"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counts.groupBy("doc_id", "gram_n").agg(
        F.sum("cnt").alias("total_grams"),
        F.max("cnt").alias("top_gram_count"),
        (F.max("cnt").cast("double") / F.sum("cnt")).alias("top_gram_frac"),
        (
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).cast("double")
            / F.sum("cnt")
        ).alias("dup_gram_frac"),
    )


CONTAM_GRAM = 5
CONTAM_MOD = 97


@query(
    "contamination_check",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ts FROM documents),
    g AS (
      SELECT DISTINCT doc_id,
             ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]
                   || ' ' || ts[i+4] AS gram
      FROM t, UNNEST(range(1, len(ts) - {CONTAM_GRAM - 2})) AS r(i)),
    bench AS (
      SELECT DISTINCT gram FROM g WHERE doc_id % {CONTAM_MOD} = 0)
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(b.gram) AS BIGINT) AS n_contaminated,
           CAST(COUNT(b.gram) AS DOUBLE) / COUNT(*) AS contamination_frac
    FROM g LEFT JOIN bench b ON g.gram = b.gram
    WHERE g.doc_id % {CONTAM_MOD} <> 0
    GROUP BY 1
    """,
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: fraction of each training document's
    distinct {CONTAM_GRAM}-grams that also appear in a held-out benchmark
    set (here: docs with doc_id ≡ 0 mod {CONTAM_MOD}, standing in for an
    eval suite).  The canonical pre-training decontamination primitive.

    Scale shape: the benchmark side is tiny by construction (eval suites
    are MBs, corpora are TBs) → its distinct-gram set broadcasts, and the
    corpus side is one scan + explode + broadcast LEFT join + one aggregate
    keyed on doc_id.  Per-doc gram dedup happens ARRAY-SIDE
    (array_distinct before the explode) — zero shuffle, where a
    `.distinct()` on the exploded (doc_id, gram) pairs would shuffle every
    gram string in the corpus (measured 6× slower at sf0.1).  No
    corpus-sized shuffle of text: at 100 TB you'd hash the grams
    (xxhash64) before the join; here they stay as strings so the DuckDB
    twin is byte-identical."""
    docs = load_spread(spark, sf_dir, "documents")
    ts = F.split(F.col("text"), r"\s+")
    n = F.size(ts)
    # 5-grams via a zip_with ladder over shifted slices (2-gram → 4-gram →
    # 5-gram).  An indexed transform with element_at(ts, i+k) re-evaluates
    # the split() per element — measured 10× slower; the ladder touches the
    # token array a bounded 6 times regardless of length.
    g2 = F.zip_with(
        F.slice(ts, 1, n - 1), F.slice(ts, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    g4 = F.zip_with(
        F.slice(g2, 1, n - 3), F.slice(g2, 3, n - 3),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    g5 = F.zip_with(
        F.slice(g4, 1, n - 4), F.slice(ts, 5, n - 4),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    gram = F.array_distinct(
        F.when(n >= CONTAM_GRAM, g5).otherwise(F.array().cast("array<string>"))
    )
    grams = docs.select("doc_id", F.explode(gram).alias("gram"))
    bench = (
        grams.filter(F.col("doc_id") % CONTAM_MOD == 0)
        .select("gram")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        grams.filter(F.col("doc_id") % CONTAM_MOD != 0)
        .join(F.broadcast(bench), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("hit").alias("n_contaminated"),
            (F.count("hit").cast("double") / F.count(F.lit(1))).alias(
                "contamination_frac"
            ),
        )
    )


TFIDF_TOP_N = 3


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, tok AS term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok
            FROM documents)
      GROUP BY 1, 2),
    df AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             tf.tf * ((n.n_docs - df.df + 0.5) / (df.df + 0.5)) AS tfidf
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
    SELECT doc_id, term, tf, df, tfidf, rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS rk
      FROM scored) t
    WHERE rk <= {TFIDF_TOP_N}
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF keyword extraction: top-{TFIDF_TOP_N} terms by
    tf × idf, where idf is the BM25 rational form
    (N − df + 0.5)/(df + 0.5).  The rational idf is deliberate: it is pure
    IEEE arithmetic (one subtract, two adds, one divide), so scores are
    bit-identical cross-engine, where ln()-based idf would be at the mercy
    of libm rounding differences between the JVM and DuckDB.

    Plan: one explode → (doc, term) counts (tf, shuffled on doc+term with
    map-side combine), a |vocab|-sized reduction for df, and a tf⋈df join
    on term.  The doc-count scalar broadcasts; the join is shuffle-on-term
    (vocab follows a Zipf law, so AQE's skew split handles the stopword
    keys); the final per-doc top-k is a bounded window."""
    d = load_spread(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    tf = (
        d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (
                F.col("tf")
                * ((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TFIDF_TOP_N)
        .select("doc_id", "term", "tf", "df", "tfidf", "rk")
    )


CHUNK_W = 64   # window tokens
CHUNK_S = 48   # stride (W - S = 16 token overlap)


@query(
    "doc_chunk_windows",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ts FROM documents),
    c AS (
      SELECT doc_id,
             CAST((r.i - 1) / {CHUNK_S} AS BIGINT) AS chunk_id,
             ts[r.i : r.i + {CHUNK_W} - 1] AS toks
      FROM t, UNNEST(range(1, GREATEST(len(ts) - {CHUNK_W} + 1, 1) + 1,
                           {CHUNK_S})) AS r(i))
    SELECT doc_id, chunk_id,
           array_to_string(toks, ' ') AS chunk_text,
           CAST(len(toks) AS INT) AS n_tokens
    FROM c
    """,
)
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — split each document into
    {CHUNK_W}-token windows with stride {CHUNK_S} (16-token overlap), the
    standard preprocessing step before embedding/packing long documents
    for training.  Each chunk keeps (doc_id, chunk_id) provenance.

    Implementation note (the textops perf trap): the token array is
    materialized as a COLUMN first, so the per-chunk ``slice`` references
    a bound attribute — inlining the split() expression would re-evaluate
    it for every chunk.  Start offsets come from a strided ``sequence``;
    everything is codegen array ops, one explode, zero shuffles."""
    docs = load_spread(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(F.col("text"), r"\s+").alias("ts"))
    n = F.size(F.col("ts"))
    starts = F.sequence(
        F.lit(1), F.greatest(n - (CHUNK_W - 1), F.lit(1)), F.lit(CHUNK_S)
    )
    chunks = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                starts,
                lambda i: F.struct(
                    ((i - 1) / CHUNK_S).cast("long").alias("chunk_id"),
                    F.slice(F.col("ts"), i, CHUNK_W).alias("toks"),
                ),
            )
        ).alias("c"),
    )
    return chunks.select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.array_join(F.col("c.toks"), " ").alias("chunk_text"),
        F.size(F.col("c.toks")).cast("int").alias("n_tokens"),
    )


@query(
    "corpus_summary",
    oracle="""
    WITH t AS (
      SELECT source, lang, n_chars,
             len(regexp_split_to_array(text, '\\s+')) AS n_tokens
      FROM documents)
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
           CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens
    FROM t GROUP BY 1, 2
    """,
)
def corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card rollup: per (source, lang) document/token/char totals
    and token-length extremes — the summary table every corpus release
    ships.  One narrow pass (token counts are array lengths, no explode)
    into a tiny grouped aggregate; integer sums are exact, and the single
    double division is int/int — bit-stable."""
    d = load_spread(spark, sf_dir, "documents")
    nt = F.size(F.split(F.col("text"), r"\s+"))
    return (
        d.select("source", "lang", "n_chars", nt.alias("n_tokens"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_tokens").cast("long").alias("min_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
            (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        )
    )


PMI_MIN_COUNT = 5
PMI_TOP_N = 100


@query(
    "pmi_top_pairs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ts FROM documents),
    uni AS (
      SELECT u.tok AS term, CAST(COUNT(*) AS BIGINT) AS c
      FROM t, UNNEST(ts) AS u(tok) GROUP BY 1),
    big AS (
      SELECT ts[i] AS w1, ts[i + 1] AS w2, CAST(COUNT(*) AS BIGINT) AS c_xy
      FROM t, UNNEST(range(1, len(ts))) AS r(i)
      GROUP BY 1, 2),
    tot AS (
      SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM uni) AS t_uni,
             (SELECT CAST(SUM(c_xy) AS BIGINT) FROM big) AS t_big)
    SELECT w1, w2, c_xy,
           CAST(c_xy AS DOUBLE) * t_uni * t_uni
             / (CAST(t_big AS DOUBLE) * u1.c * u2.c) AS assoc,
           rk
    FROM (
      SELECT b.w1, b.w2, b.c_xy, u1.c AS c1, u2.c AS c2, tot.t_uni, tot.t_big,
             ROW_NUMBER() OVER (
               ORDER BY CAST(b.c_xy AS DOUBLE) * tot.t_uni * tot.t_uni
                          / (CAST(tot.t_big AS DOUBLE) * u1.c * u2.c) DESC,
                        b.w1, b.w2) AS rk
      FROM big b
      JOIN uni u1 ON u1.term = b.w1
      JOIN uni u2 ON u2.term = b.w2
      CROSS JOIN tot
      WHERE b.c_xy >= {PMI_MIN_COUNT}) q
    JOIN uni u1 ON u1.term = q.w1
    JOIN uni u2 ON u2.term = q.w2
    WHERE rk <= {PMI_TOP_N}
    """,
)
def pmi_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top word pairs by pointwise-mutual-information
    ASSOCIATION RATIO — P(xy)/(P(x)P(y)) = c_xy·T²/(B·c_x·c_y) — kept in
    rational form (no log) so the score is fixed-order IEEE arithmetic on
    exact integer counts, bit-identical cross-engine where log-PMI would
    drift by libm ulps.  The phrase-detection pass (word2vec-style) of a
    corpus pipeline.

    One tokenize feeding two aggregates (unigram counts, adjacent-bigram
    counts via the zip_with ladder), two joins of the bigram table against
    the unigram counts (term-keyed shuffles, Zipf skew handled by AQE),
    scalar totals broadcast, min-count pruning BEFORE the joins, bounded
    top-k via orderBy+limit (TakeOrderedAndProject: per-partition heaps,
    O(k) driver merge) — the rank column is attached by enumerating the
    <=N collected rows, so no single-partition Window ever sees the full
    scored-pair table (at a real vocabulary that window was the one
    single-reducer stage in the plan)."""
    return _pmi_rank(spark, _pmi_scored_top(spark, sf_dir))


def _pmi_scored_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.col("text"), r"\s+").alias("ts"))
    n = F.size(F.col("ts"))
    uni = (
        toks.select(F.explode(F.col("ts")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("ts"), 1, n - 1),
                F.slice(F.col("ts"), 2, n - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    )
    big = pairs.groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")).agg(
        F.count(F.lit(1)).alias("c_xy")
    )
    t_uni = uni.agg(F.sum("c").alias("t_uni"))
    t_big = big.agg(F.sum("c_xy").alias("t_big"))
    u1 = uni.select(F.col("term").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("term").alias("w2"), F.col("c").alias("c2"))
    scored = (
        big.filter(F.col("c_xy") >= PMI_MIN_COUNT)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(t_uni))
        .crossJoin(F.broadcast(t_big))
        .select(
            "w1",
            "w2",
            "c_xy",
            (
                F.col("c_xy").cast("double") * F.col("t_uni") * F.col("t_uni")
                / (F.col("t_big").cast("double") * F.col("c1") * F.col("c2"))
            ).alias("assoc"),
        )
    )
    return (
        scored.orderBy(F.desc("assoc"), F.asc("w1"), F.asc("w2"))
        .limit(PMI_TOP_N)
        .select("w1", "w2", "c_xy", "assoc")
    )


def _pmi_rank(spark: SparkSession, top: DataFrame) -> DataFrame:
    """Attach ``rk`` to the globally-ordered <=PMI_TOP_N-row top slice by
    driver-side enumerate (TakeOrderedAndProject returns rows in order, and
    Python floats ARE IEEE doubles, so assoc round-trips bit-exactly)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("w1", T.StringType()),
            T.StructField("w2", T.StringType()),
            T.StructField("c_xy", T.LongType()),
            T.StructField("assoc", T.DoubleType()),
            T.StructField("rk", T.IntegerType()),
        ]
    )
    rows = [
        (r.w1, r.w2, r.c_xy, r.assoc, i + 1) for i, r in enumerate(top.collect())
    ]
    return spark.createDataFrame(rows, schema)


_MD5_NIBBLE_SQL = "(strpos('0123456789abcdef', substr(md5(text), {i}, 1)) - 1)"


@query(
    "sample_split_train_val_test",
    oracle=f"""
    WITH bucketed AS (
      SELECT lang, n_chars,
             ((({_MD5_NIBBLE_SQL.format(i=1)} * 16
                + {_MD5_NIBBLE_SQL.format(i=2)}) * 16
                + {_MD5_NIBBLE_SQL.format(i=3)}) * 16
                + {_MD5_NIBBLE_SQL.format(i=4)}) % 1000 AS bucket
      FROM documents),
    labeled AS (
      SELECT lang, n_chars,
             CASE WHEN bucket < 800 THEN 'train'
                  WHEN bucket < 900 THEN 'val'
                  ELSE 'test' END AS split
      FROM bucketed)
    SELECT split, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM labeled GROUP BY 1, 2
    """,
)
def sample_split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split — the assignment every
    training pipeline needs to be STABLE across reruns, engines, and data
    relayouts.  The split key is content-derived (md5 of the text, first
    four nibbles → a 0..999 bucket), so the same document always lands in
    the same split no matter which file, partition, or ingestion batch it
    arrives in, and adding documents never reshuffles existing ones —
    properties a random() split lacks.  md5 is bit-identical in Spark and
    DuckDB, which is what makes this oracle-checkable (the repo's usual
    xxhash64 keys have no DuckDB twin).

    Pure per-row expressions + one hash aggregate: embarrassingly parallel,
    no shuffle before the final count rollup."""
    docs = load_spread(spark, sf_dir, "documents")
    md5 = F.md5(F.col("text").cast("binary"))

    def nib(i: int):
        return F.instr(F.lit("0123456789abcdef"), F.substring(md5, i, 1)) - 1

    bucket = (((nib(1) * 16 + nib(2)) * 16 + nib(3)) * 16 + nib(4)) % 1000
    split = (
        F.when(bucket < 800, "train").when(bucket < 900, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "topk_terms_per_lang",
    oracle="""
    WITH counts AS (
      SELECT lang, tok AS term, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT lang, unnest(regexp_split_to_array(text, '\\s+')) AS tok
            FROM documents)
      GROUP BY 1, 2),
    ranked AS (
      SELECT lang, term, n,
             CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                     ORDER BY n DESC, term ASC) AS INT) AS rk
      FROM counts)
    SELECT lang, term, n, rk FROM ranked WHERE rk <= 10
    """,
)
def topk_terms_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 terms PER LANGUAGE — the partitioned form of ``topk_terms``
    (global top-k has a bounded-heap physical plan; per-group top-k is one
    shuffle on the group key + a rank filter, the pattern every
    "top N per category" report uses).  Tie-break (count desc, term asc) is
    total, so ranks are engine-deterministic."""
    from pyspark.sql import Window as W

    d = load_spread(spark, sf_dir, "documents")
    counts = (
        d.select("lang", F.explode(_tokens(F.col("text"))).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("lang").orderBy(F.desc("n"), F.asc("term"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("lang", "term", "n", "rk")
    )


@query(
    "dq_freshness_lag",
    oracle="""
    WITH per_type AS (
      SELECT event_type,
             MAX(CAST(ts AS TIMESTAMP)) AS latest_ts,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1),
    global_max AS (SELECT MAX(latest_ts) AS g FROM per_type)
    SELECT event_type, latest_ts,
           CAST(date_diff('second', latest_ts, g) AS BIGINT) AS lag_seconds,
           n_events
    FROM per_type, global_max
    """,
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness audit: per event type, the latest timestamp and its
    lag (seconds) behind the freshest record in the table — the first
    monitor a streaming ingest gets (a stuck source shows up as a growing
    lag on one type).

    One grouped MAX + a broadcast of the 1-row global max; lag arithmetic
    is integer seconds — nothing to drift."""
    e = load_table(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.max("ts").alias("latest_ts"), F.count(F.lit(1)).alias("n_events")
    )
    gmax = per_type.agg(F.max("latest_ts").alias("g"))
    return per_type.crossJoin(F.broadcast(gmax)).select(
        "event_type",
        "latest_ts",
        (F.col("g").cast("long") - F.col("latest_ts").cast("long")).alias(
            "lag_seconds"
        ),
        "n_events",
    )


@query(
    "pipeline_training_data_prep",
    oracle=f"""
    WITH deduped AS (
      SELECT min_by(doc_id, doc_id) AS doc_id,
             min_by(text, doc_id) AS text,
             min_by(lang, doc_id) AS lang
      FROM documents GROUP BY md5(text)),
    scored AS (
      SELECT doc_id, lang, text,
             CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT)
               AS n_tokens,
             CAST(len(list_distinct(regexp_split_to_array(text, '\\s+')))
                  AS BIGINT) AS n_distinct
      FROM deduped),
    kept AS (
      -- quality gate in exact integer arithmetic: >= 8 tokens and
      -- type-token ratio > 0.5 (cross-multiplied, no division)
      SELECT * FROM scored
      WHERE n_tokens >= 8 AND n_distinct * 2 > n_tokens),
    bucketed AS (
      SELECT lang, n_tokens,
             ((({_MD5_NIBBLE_SQL.format(i=1)} * 16
                + {_MD5_NIBBLE_SQL.format(i=2)}) * 16
                + {_MD5_NIBBLE_SQL.format(i=3)}) * 16
                + {_MD5_NIBBLE_SQL.format(i=4)}) % 1000 AS bucket
      FROM kept),
    labeled AS (
      SELECT lang, n_tokens,
             CASE WHEN bucket < 800 THEN 'train'
                  WHEN bucket < 900 THEN 'val'
                  ELSE 'test' END AS split
      FROM bucketed)
    SELECT split, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM labeled GROUP BY 1, 2
    """,
)
def pipeline_training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END training-data preparation: exact dedup (canonical = min
    doc_id per content hash) → quality gate (length + type-token ratio,
    exact integer cross-multiplication) → deterministic content-derived
    80/10/10 split → per-(split, lang) doc and token accounting.  The
    composite a user of this engine actually runs nightly — every stage is
    an operator registered individually, proven here to compose in ONE
    lazy DAG (one scan, two shuffles: the dedup groupBy and the final
    rollup; the gate and split are narrow).

    Determinism end-to-end: md5 content hash for dedup and split bucket,
    integer token counts, no floats anywhere."""
    d = load_spread(spark, sf_dir, "documents")
    deduped = (
        d.select(F.md5(F.col("text").cast("binary")).alias("h"), "doc_id", "text", "lang")
        .groupBy("h")
        .agg(
            F.min_by("doc_id", "doc_id").alias("doc_id"),
            F.min_by("text", "doc_id").alias("text"),
            F.min_by("lang", "doc_id").alias("lang"),
        )
    )
    ts = F.split(F.col("text"), r"\s+")
    scored = deduped.select(
        "lang",
        "text",
        F.size(ts).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(ts)).cast("long").alias("n_distinct"),
    )
    kept = scored.filter(
        (F.col("n_tokens") >= 8)
        & (F.col("n_distinct") * 2 > F.col("n_tokens"))
    )
    md5 = F.md5(F.col("text").cast("binary"))

    def nib(i: int):
        return F.instr(F.lit("0123456789abcdef"), F.substring(md5, i, 1)) - 1

    bucket = (((nib(1) * 16 + nib(2)) * 16 + nib(3)) * 16 + nib(4)) % 1000
    split = (
        F.when(bucket < 800, "train").when(bucket < 900, "val").otherwise("test")
    )
    return (
        kept.select(split.alias("split"), "lang", "n_tokens")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


# --------------------------------------------------------------------------
# BPE merge learning — subword vocabulary induction
# --------------------------------------------------------------------------

BPE_MERGE_ROUNDS = 4


def _bpe_ctes(rounds: int, apply_last: bool = False) -> list[str]:
    """CTE ladder shared by the learn and apply oracles.  With
    ``apply_last`` the winning merge of the FINAL round is also folded in,
    producing ``v{rounds}`` — the fully-merged symbol table the apply
    query tokenizes with; without it the ladder is byte-identical to what
    ``text_bpe_learn_merges`` has been green against."""
    ctes = [
        r"""vocab AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        FROM documents) t
      WHERE regexp_full_match(w, '[a-z0-9]+') GROUP BY 1)""",
        r"""v0 AS MATERIALIZED (
      SELECT regexp_replace(w, '(.)', '#\1', 'g') AS sym, freq FROM vocab)""",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""el{i} AS MATERIALIZED (
      SELECT sym, freq, string_split(sym, '#')[2:] AS el FROM v{i - 1})"""
        )
        ctes.append(
            f"""p{i} AS MATERIALIZED (
      SELECT el[j.j] AS lhs, el[j.j + 1] AS rhs,
             CAST(SUM(freq) AS BIGINT) AS cnt
      FROM el{i}, LATERAL (SELECT unnest(range(1, len(el))) AS j) j
      GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""b{i} AS MATERIALIZED (
      SELECT lhs, rhs, cnt FROM p{i} ORDER BY cnt DESC, lhs, rhs LIMIT 1)"""
        )
        if i < rounds or apply_last:
            ctes.append(
                f"""v{i} AS MATERIALIZED (
      SELECT list_reduce(list_prepend('', el),
               (acc, s) -> CASE
                 WHEN ends_with(acc, '#' || b.lhs) AND s = b.rhs
                 THEN substr(acc, 1, len(acc) - len(b.lhs)) || b.lhs || b.rhs
                 ELSE acc || '#' || s END) AS sym,
             freq
      FROM el{i} CROSS JOIN b{i} b)"""
            )
    return ctes


def _bpe_oracle(rounds: int) -> str:
    """Unrolled DuckDB twin of the BPE merge loop (MATERIALIZED per round,
    same reason as the k-core oracle: default CTE inlining re-derives the
    vocabulary once per reference).  The greedy left-to-right merge fold
    runs as ``list_reduce`` over a flat '#'-joined accumulator STRING —
    DuckDB 1.0's list_reduce mis-evaluates STRUCT accumulators (fields
    reset per step), so the state is one VARCHAR: '#'-separated symbols,
    merge = strip-tail + append, boundary-safe because every symbol is
    preceded by '#' and symbols never contain it."""
    ctes = _bpe_ctes(rounds)
    rows = "\n    UNION ALL ".join(
        f"SELECT {i} AS round, lhs, rhs, lhs || rhs AS merged, cnt AS pair_count"
        f" FROM b{i}"
        for i in range(1, rounds + 1)
    )
    return f"WITH {', '.join(ctes)}\n    {rows}"


def _bpe_apply_oracle(rounds: int) -> str:
    """Apply-side twin: fold ALL learned merges into the symbol table, read
    each word's token count off the fully-merged symbols (#-count = symbol
    length minus word length), and roll the corpus up per language."""
    ctes = _bpe_ctes(rounds, apply_last=True)
    ctes.append(
        f"""tokmap AS MATERIALIZED (
      SELECT replace(sym, '#', '') AS w,
             CAST(len(sym) - len(replace(sym, '#', '')) AS BIGINT) AS n_tok
      FROM v{rounds})"""
    )
    ctes.append(
        r"""corpus AS (
      SELECT lang, unnest(regexp_split_to_array(lower(text), '\s+')) AS w
      FROM documents)"""
    )
    return f"""WITH {', '.join(ctes)}
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(w)) AS BIGINT) AS n_chars,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM corpus JOIN tokmap USING (w)
    GROUP BY 1"""


def _bpe_merge_loop(
    spark: SparkSession, sf_dir: str, rounds: int, apply_all: bool
) -> tuple[DataFrame, list[tuple[int, str, str, int]]]:
    """The shared BPE iteration: returns the symbol table after the loop
    and the learned merges.  ``apply_all`` folds the final round's winner
    in too (the apply query needs ``v`` with every merge applied; the
    learn query skips the last fold since only the merge LIST is its
    output)."""
    d = load_spread(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w")
    ).filter(F.col("w").rlike("^[a-z0-9]+$"))
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    v = vocab.select(
        F.regexp_replace(F.col("w"), "(.)", r"#$1").alias("sym"), "freq"
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(1, rounds + 1):
        el = F.expr("slice(split(sym, '#'), 2, size(split(sym, '#')) - 1)")
        ve = v.withColumn("el", el)
        n = F.size(F.col("el"))
        pairs = ve.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice(F.col("el"), 1, n - 1),
                    F.slice(F.col("el"), 2, n - 1),
                    lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
                )
            ).alias("pr"),
        )
        best = (
            pairs.groupBy(F.col("pr.lhs").alias("lhs"), F.col("pr.rhs").alias("rhs"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "lhs", "rhs")
            .limit(1)
            .collect()[0]
        )
        a, b, cnt = best["lhs"], best["rhs"], best["cnt"]
        merges.append((rnd, a, b, cnt))
        if rnd < rounds or apply_all:
            fold = F.aggregate(
                F.col("el"),
                F.lit(""),
                lambda acc, x: F.when(
                    acc.endswith("#" + a) & (x == b),
                    F.regexp_replace(acc, f"#{a}$", f"#{a}{b}"),
                ).otherwise(F.concat(acc, F.lit("#"), x)),
            )
            v = ve.select(fold.alias("sym"), "freq").localCheckpoint(eager=True)
    return v, merges


@query("text_bpe_learn_merges", oracle=_bpe_oracle(BPE_MERGE_ROUNDS))
def text_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first {BPE_MERGE_ROUNDS} BPE merges over the corpus
    vocabulary (Sennrich et al. 2016's subword induction — the vocab-build
    step every tokenizer pipeline runs before training): per round, count
    frequency-weighted adjacent symbol pairs, pick the most frequent (ties
    broken lexicographically), and greedily merge it left-to-right in
    every word.

    Shapes: the pair count is one explode+groupBy over the DISTINCT word
    vocabulary (corpus-sized work happens once, in the word count); the
    winning pair is a 1-row ``collect()`` per round (model state, like
    the ANN centroids); the merge applies as a pure-codegen fold with the
    winner embedded as a literal.  Symbol state is a flat '#'-joined
    string, so the fold accumulator is a VARCHAR in both engines (see
    _bpe_oracle on DuckDB's struct-accumulator bug) and the merge is
    boundary-exact.  Per-round localCheckpoint cuts the iterative lineage
    (vocab feeds both the count and the rewrite — the BFS lesson).

    Output: (round, lhs, rhs, merged, pair_count) — one row per learned
    merge."""
    _, merges = _bpe_merge_loop(
        spark, sf_dir, BPE_MERGE_ROUNDS, apply_all=False
    )

    out = None
    for rnd, a, b, cnt in merges:
        row = spark.range(1).select(
            F.lit(rnd).alias("round"),
            F.lit(a).alias("lhs"),
            F.lit(b).alias("rhs"),
            F.lit(a + b).alias("merged"),
            F.lit(cnt).cast("long").alias("pair_count"),
        )
        out = row if out is None else out.unionByName(row)
    return out


@query("text_bpe_apply_tokenize", oracle=_bpe_apply_oracle(BPE_MERGE_ROUNDS))
def text_bpe_apply_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the learned BPE merges — the production half of the tokenizer
    pair (:func:`text_bpe_learn_merges` induces the vocabulary; this query
    tokenizes the corpus with it and reports per-language token economics:
    words, characters, subword tokens).  The ratio n_chars/n_tokens is the
    compression a tokenizer buys — the number every training-data budget is
    denominated in.

    The trick that keeps this linear: merges apply to the DISTINCT word
    vocabulary, not the corpus — per-word token count is read off the
    fully-merged symbol string ('#'-count = symbol length minus word
    length), and the corpus only hash-joins against that vocab-sized map
    (broadcast: a natural-text vocabulary is millions of rows at worst,
    megabytes against a corpus of terabytes).  Corpus-scale work is one
    explode + one broadcast join + one 3-group rollup; the iterative part
    runs over the vocab with per-round localCheckpoints exactly like the
    learn side."""
    v, _ = _bpe_merge_loop(spark, sf_dir, BPE_MERGE_ROUNDS, apply_all=True)
    word = F.expr("replace(sym, '#', '')")
    tokmap = v.select(
        word.alias("w"),
        (F.length("sym") - F.length(word)).cast("long").alias("n_tok"),
    )
    d = load_spread(spark, sf_dir, "documents")
    corpus = d.select(
        "lang",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w"),
    )
    return (
        corpus.join(F.broadcast(tokmap), "w")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("w")).cast("long").alias("n_chars"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


# --------------------------------------------------------------------------
# BPE trainer with end-of-word marker — the Sennrich/GPT-2 training form
# --------------------------------------------------------------------------

BPE_TRAIN_ROUNDS = 6
BPE_EOW = "$"  # end-of-word marker: outside [a-z0-9] so it never collides


def _bpe_train_ctes(rounds: int) -> list[str]:
    """Unrolled CTE ladder for the MARKED trainer.  Differences from
    ``_bpe_ctes``: (1) v0 attaches the end-of-word marker to the final
    character's symbol (``…#o$``), so word-final merges are distinct
    merge events — the Sennrich et al. 2016 training setup; (2) every
    round INCLUDING the last folds its winner in, because the vocab-size
    trajectory reads the post-merge symbol table; (3) the fold's tail
    replacement is pure string arithmetic (substr/len), never regex —
    the marker would otherwise need escaping."""
    ctes = [
        r"""vocab AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        FROM documents) t
      WHERE regexp_full_match(w, '[a-z0-9]+') GROUP BY 1)""",
        f"""v0 AS MATERIALIZED (
      SELECT regexp_replace(w, '(.)', '#\\1', 'g') || '{BPE_EOW}' AS sym,
             freq FROM vocab)""",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""el{i} AS MATERIALIZED (
      SELECT sym, freq, string_split(sym, '#')[2:] AS el FROM v{i - 1})"""
        )
        ctes.append(
            f"""p{i} AS MATERIALIZED (
      SELECT el[j.j] AS lhs, el[j.j + 1] AS rhs,
             CAST(SUM(freq) AS BIGINT) AS cnt
      FROM el{i}, LATERAL (SELECT unnest(range(1, len(el))) AS j) j
      GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""b{i} AS MATERIALIZED (
      SELECT lhs, rhs, cnt FROM p{i} ORDER BY cnt DESC, lhs, rhs LIMIT 1)"""
        )
        ctes.append(
            f"""v{i} AS MATERIALIZED (
      SELECT list_reduce(list_prepend('', el),
               (acc, s) -> CASE
                 WHEN ends_with(acc, '#' || b.lhs) AND s = b.rhs
                 THEN substr(acc, 1, len(acc) - len(b.lhs)) || b.lhs || b.rhs
                 ELSE acc || '#' || s END) AS sym,
             freq
      FROM el{i} CROSS JOIN b{i} b)"""
        )
        ctes.append(
            f"""n{i} AS MATERIALIZED (
      SELECT CAST(COUNT(DISTINCT s) AS BIGINT) AS n_symbols FROM (
        SELECT unnest(string_split(sym, '#')[2:]) AS s FROM v{i}) t)"""
        )
    return ctes


def _bpe_train_oracle(rounds: int) -> str:
    ctes = _bpe_train_ctes(rounds)
    rows = "\n    UNION ALL ".join(
        f"SELECT {i} AS round, lhs, rhs, lhs || rhs AS merged,"
        f" cnt AS pair_count, (SELECT n_symbols FROM n{i}) AS n_symbols"
        f" FROM b{i}"
        for i in range(1, rounds + 1)
    )
    return f"WITH {', '.join(ctes)}\n    {rows}"


@query("text_bpe_train_merges", oracle=_bpe_train_oracle(BPE_TRAIN_ROUNDS))
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING with the end-of-word marker — the form
    Sennrich et al. 2016 (and every production trainer since) actually
    runs, distinct from :func:`text_bpe_learn_merges` in three ways that
    change what is learned and reported:

    * **End-of-word marker**: the final character of every word carries
      ``{BPE_EOW}`` in its symbol (``hello`` → ``h e l l o$``), so a
      word-final pair (``o$`` after merging) is a DIFFERENT merge event
      from the same pair mid-word — the distinction that lets a trained
      vocabulary encode suffix structure ("ing$" vs "ing" inside
      "singer").  The learn-merges sibling deliberately trains unmarked
      (the simpler textbook form); this is the production form.
    * **Vocab-size trajectory**: each round reports ``n_symbols``, the
      distinct symbol-type count AFTER its merge applies — the training
      curve a tokenizer build monitors (grows by ≤1 per round; lhs/rhs
      types vanish when fully absorbed, so it can also shrink).
    * **{BPE_TRAIN_ROUNDS} rounds** (vs 4), so the trace crosses the
      point where word-final merges start winning on this corpus.

    Exactness: frequency-weighted pair counts are exact int64 sums over
    the DISTINCT word vocabulary; argmax ties break (cnt DESC, lhs, rhs)
    in both engines; the greedy left-to-right fold's tail replacement is
    substr/length string arithmetic (NO regex — the marker would need
    escaping, the same reason the oracle uses substr), so marked symbols
    fold identically in Spark and DuckDB.  The oracle unrolls all
    {BPE_TRAIN_ROUNDS} rounds as MATERIALIZED CTEs — the Louvain
    loop-unroll pattern (graph.py) transferred, per VERDICT r12 ask #2.

    Scale shape: corpus-sized work happens ONCE (the word count); every
    round is explode+groupBy over the distinct-word vocabulary (bounded
    by type count, not corpus size) + a 1-row argmax collect (model
    state, like the ANN centroids) + a pure-codegen fold + a 1-row
    distinct-symbol count; per-round localCheckpoint cuts the iterative
    lineage exactly as the learn sibling and the Louvain loop do.  At
    100 TB the vocabulary is millions of types — still a single
    executor-comfortable table."""
    d = load_spread(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w")
    ).filter(F.col("w").rlike("^[a-z0-9]+$"))
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    v = vocab.select(
        F.concat(
            F.regexp_replace(F.col("w"), "(.)", r"#$1"), F.lit(BPE_EOW)
        ).alias("sym"),
        "freq",
    ).localCheckpoint(eager=True)

    trace: list[tuple[int, str, str, int, int]] = []
    for rnd in range(1, BPE_TRAIN_ROUNDS + 1):
        el = F.expr("slice(split(sym, '#'), 2, size(split(sym, '#')) - 1)")
        ve = v.withColumn("el", el)
        n = F.size(F.col("el"))
        pairs = ve.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice(F.col("el"), 1, n - 1),
                    F.slice(F.col("el"), 2, n - 1),
                    lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
                )
            ).alias("pr"),
        )
        best_rows = (
            pairs.groupBy(
                F.col("pr.lhs").alias("lhs"), F.col("pr.rhs").alias("rhs")
            )
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "lhs", "rhs")
            .limit(1)
            .collect()  # bounded: 1-row model state per round
        )
        if not best_rows:
            # pair exhaustion (every word fully merged): the trace just
            # ends — the oracle's empty b{i} likewise emits no row for
            # this and later rounds (its v{i} cross-joins to empty)
            break
        best = best_rows[0]
        a, b = best["lhs"], best["rhs"]
        # tail replacement via substr/len, marker-safe (never regex)
        fold = F.aggregate(
            F.col("el"),
            F.lit(""),
            lambda acc, x: F.when(
                acc.endswith("#" + a) & (x == b),
                F.concat(
                    acc.substr(F.lit(1), F.length(acc) - len(a)),
                    F.lit(a + b),
                ),
            ).otherwise(F.concat(acc, F.lit("#"), x)),
        )
        v = ve.select(fold.alias("sym"), "freq").localCheckpoint(eager=True)
        n_symbols = (
            v.select(
                F.explode(
                    F.expr(
                        "slice(split(sym, '#'), 2,"
                        " size(split(sym, '#')) - 1)"
                    )
                ).alias("s")
            )
            .agg(F.countDistinct("s").alias("n"))
            .collect()[0]["n"]  # bounded: 1-row trajectory point
        )
        trace.append((rnd, a, b, int(best["cnt"]), int(n_symbols)))

    out = None
    for rnd, a, b, cnt, nsym in trace:
        row = spark.range(1).select(
            F.lit(rnd).alias("round"),
            F.lit(a).alias("lhs"),
            F.lit(b).alias("rhs"),
            F.lit(a + b).alias("merged"),
            F.lit(cnt).cast("long").alias("pair_count"),
            F.lit(nsym).cast("long").alias("n_symbols"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# --------------------------------------------------------------------------
# WordPiece-style trainer — likelihood-scored merges (the BPE trainer's
# sibling: same loop, different argmax)
# --------------------------------------------------------------------------

WP_TRAIN_ROUNDS = 5
# WordPiece picks the pair maximizing count(ab) / (count(a)·count(b)) —
# the pairwise likelihood-ratio score (Schuster & Nakajima 2012; the
# BERT tokenizer's training rule) — where count(s) is the frequency-
# weighted occurrence count of SYMBOL s across the vocabulary.  Exact
# rational argmax needs arbitrary precision, so the REGISTERED semantics
# quantize: score_key = (cnt << 30) div (cnt_lhs · cnt_rhs), with total
# tie-break (score_key DESC, cnt DESC, lhs, rhs) — deterministic and
# identical in both engines; 2^30 resolves relative score differences
# down to ~1e-9 at fixture counts.  int64 bounds: cnt ≤ total symbol
# positions P, so cnt·2^30 needs P < 2^33 (~8.6e9 positions); beyond
# that the key moves to DECIMAL, which both engines widen exactly.
WP_SCORE_SHIFT = 30


def _wp_train_ctes(rounds: int) -> list[str]:
    """Unrolled ladder: the marked-BPE v0/el/p CTEs plus a per-round
    symbol-count CTE and the likelihood-scored argmax."""
    ctes = [
        r"""vocab AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        FROM documents) t
      WHERE regexp_full_match(w, '[a-z0-9]+') GROUP BY 1)""",
        f"""v0 AS MATERIALIZED (
      SELECT regexp_replace(w, '(.)', '#\\1', 'g') || '{BPE_EOW}' AS sym,
             freq FROM vocab)""",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""el{i} AS MATERIALIZED (
      SELECT sym, freq, string_split(sym, '#')[2:] AS el FROM v{i - 1})"""
        )
        ctes.append(
            f"""p{i} AS MATERIALIZED (
      SELECT el[j.j] AS lhs, el[j.j + 1] AS rhs,
             CAST(SUM(freq) AS BIGINT) AS cnt
      FROM el{i}, LATERAL (SELECT unnest(range(1, len(el))) AS j) j
      GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""sc{i} AS MATERIALIZED (
      SELECT s, CAST(SUM(freq) AS BIGINT) AS c FROM (
        SELECT unnest(el) AS s, freq FROM el{i}) t GROUP BY 1)"""
        )
        ctes.append(
            f"""b{i} AS MATERIALIZED (
      SELECT p.lhs, p.rhs, p.cnt, cl.c AS lc, cr.c AS rc,
             CAST((p.cnt * {1 << WP_SCORE_SHIFT}) // (cl.c * cr.c)
                  AS BIGINT) AS score_key
      FROM p{i} p
      JOIN sc{i} cl ON cl.s = p.lhs
      JOIN sc{i} cr ON cr.s = p.rhs
      ORDER BY score_key DESC, p.cnt DESC, p.lhs, p.rhs LIMIT 1)"""
        )
        ctes.append(
            f"""v{i} AS MATERIALIZED (
      SELECT list_reduce(list_prepend('', el),
               (acc, s) -> CASE
                 WHEN ends_with(acc, '#' || b.lhs) AND s = b.rhs
                 THEN substr(acc, 1, len(acc) - len(b.lhs)) || b.lhs || b.rhs
                 ELSE acc || '#' || s END) AS sym,
             freq
      FROM el{i} CROSS JOIN b{i} b)"""
        )
    return ctes


def _wp_train_oracle(rounds: int) -> str:
    ctes = _wp_train_ctes(rounds)
    rows = "\n    UNION ALL ".join(
        f"SELECT {i} AS round, lhs, rhs, lhs || rhs AS merged,"
        f" cnt AS pair_count, lc AS lhs_count, rc AS rhs_count, score_key"
        f" FROM b{i}"
        for i in range(1, rounds + 1)
    )
    return f"WITH {', '.join(ctes)}\n    {rows}"


@query("text_wordpiece_train_merges", oracle=_wp_train_oracle(WP_TRAIN_ROUNDS))
def text_wordpiece_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece-style tokenizer training (Schuster & Nakajima 2012 — the
    BERT/ALBERT trainer): the same marked-symbol merge loop as
    :func:`text_bpe_train_merges`, but the argmax is the LIKELIHOOD score
    count(ab)/(count(a)·count(b)) instead of the raw pair count — the
    merge that most increases the unigram-LM likelihood of the corpus,
    which prefers pairs whose parts rarely occur APART (BPE's count
    argmax prefers pairs that are merely common).  The two trainers on
    the same corpus make the difference observable: the fixture's BPE
    round-1 winner (e, r$) loses here to a pair whose constituents are
    almost always together.

    Determinism contract: the exact score is a rational; the registered
    semantics are the QUANTIZED key (cnt << {WP_SCORE_SHIFT}) div
    (cnt_l·cnt_r) with total tie-break (key DESC, cnt DESC, lhs, rhs) —
    the same expression in both engines, so the argmax is
    engine-identical even when two pairs quantize to the same key (see
    the WP_SCORE_SHIFT comment for the int64 bound and the DECIMAL
    escalation path).

    Scale shape: identical to the BPE trainer — corpus-sized work once,
    then per round a vocab-sized pair count, a vocab-sized symbol count
    (one extra explode+groupBy vs BPE, joined to the pair table on the
    two symbol keys), a 1-row argmax collect, and the codegen fold."""
    d = load_spread(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w")
    ).filter(F.col("w").rlike("^[a-z0-9]+$"))
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    v = vocab.select(
        F.concat(
            F.regexp_replace(F.col("w"), "(.)", r"#$1"), F.lit(BPE_EOW)
        ).alias("sym"),
        "freq",
    ).localCheckpoint(eager=True)

    trace: list[tuple] = []
    for rnd in range(1, WP_TRAIN_ROUNDS + 1):
        el = F.expr("slice(split(sym, '#'), 2, size(split(sym, '#')) - 1)")
        ve = v.withColumn("el", el)
        n = F.size(F.col("el"))
        pairs = (
            ve.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("el"), 1, n - 1),
                        F.slice(F.col("el"), 2, n - 1),
                        lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
                    )
                ).alias("pr"),
            )
            .groupBy(F.col("pr.lhs").alias("lhs"), F.col("pr.rhs").alias("rhs"))
            .agg(F.sum("freq").alias("cnt"))
        )
        syms = (
            ve.select(F.explode(F.col("el")).alias("s"), "freq")
            .groupBy("s")
            .agg(F.sum("freq").alias("c"))
        )
        best_rows = (
            pairs.join(
                F.broadcast(syms.select(F.col("s").alias("lhs"), F.col("c").alias("lc"))),
                "lhs",
            )
            .join(
                F.broadcast(syms.select(F.col("s").alias("rhs"), F.col("c").alias("rc"))),
                "rhs",
            )
            .select(
                "lhs",
                "rhs",
                "cnt",
                "lc",
                "rc",
                F.expr(
                    f"(cnt * {1 << WP_SCORE_SHIFT}) div (lc * rc)"
                ).alias("score_key"),
            )
            .orderBy(
                F.desc("score_key"), F.desc("cnt"), F.asc("lhs"), F.asc("rhs")
            )
            .limit(1)
            .collect()  # bounded: 1-row model state per round
        )
        if not best_rows:
            break
        best = best_rows[0]
        a, b = best["lhs"], best["rhs"]
        fold = F.aggregate(
            F.col("el"),
            F.lit(""),
            lambda acc, x: F.when(
                acc.endswith("#" + a) & (x == b),
                F.concat(
                    acc.substr(F.lit(1), F.length(acc) - len(a)),
                    F.lit(a + b),
                ),
            ).otherwise(F.concat(acc, F.lit("#"), x)),
        )
        v = ve.select(fold.alias("sym"), "freq").localCheckpoint(eager=True)
        trace.append(
            (
                rnd,
                a,
                b,
                int(best["cnt"]),
                int(best["lc"]),
                int(best["rc"]),
                int(best["score_key"]),
            )
        )

    out = None
    for rnd, a, b, cnt, lc, rc, key in trace:
        row = spark.range(1).select(
            F.lit(rnd).alias("round"),
            F.lit(a).alias("lhs"),
            F.lit(b).alias("rhs"),
            F.lit(a + b).alias("merged"),
            F.lit(cnt).cast("long").alias("pair_count"),
            F.lit(lc).cast("long").alias("lhs_count"),
            F.lit(rc).cast("long").alias("rhs_count"),
            F.lit(key).cast("long").alias("score_key"),
        )
        out = row if out is None else out.unionByName(row)
    return out


@query(
    "text_inverted_index",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(text, '\\s+')) AS term
      FROM documents)
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS tf,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
           array_to_string(
             list_transform(
               list_sort(list_distinct(list(doc_id)))[1:20],
               x -> CAST(x AS VARCHAR)),
             ',') AS posting_head
    FROM toks GROUP BY 1
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: per term, the corpus term frequency, document
    frequency, and the head of the sorted posting list (first 20 doc ids,
    comma-joined) — the search-engine / retrieval-pipeline core, and the
    direct descendant of the reference's shuffle-by-key skeleton
    (``ClickThru.java:174-189``) with the value stream materialized as a
    posting list instead of a quotient.

    One explode → groupBy(term): partial aggregation absorbs token skew
    map-side for tf/df; the posting set rides the same shuffle.  The
    20-element head keeps row width bounded at any corpus size — a full
    production index would range-partition BY TERM and sink per-shard
    posting files, which is this same plan with the digest column
    replaced by a partitioned sink.  collect_set order is
    nondeterministic but sorted before slicing, so the digest is
    hash-stable."""
    d = load_spread(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), r"\s+")).alias("term")
    )
    g = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.collect_set("doc_id").alias("ds"),
    )
    return g.select(
        "term",
        "tf",
        F.size("ds").cast("long").alias("df"),
        F.concat_ws(
            ",",
            F.transform(
                F.slice(F.sort_array("ds"), 1, 20),
                lambda x: x.cast("string"),
            ),
        ).alias("posting_head"),
    )


@query(
    "text_zipf_fit",
    oracle="""
    WITH uni AS (
      SELECT tok AS term, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS tok
            FROM documents)
      GROUP BY 1),
    ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, term) AS rk FROM uni),
    pts AS (
      SELECT length(to_base(rk, 2)) - 1 AS x,
             length(to_base(c, 2)) - 1 AS y, c
      FROM ranked),
    fit AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts)
    SELECT x AS log2_rank,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(SUM(c) AS BIGINT) AS total_freq,
           n * sxy - sx * sy AS slope_num,
           n * sxx - sx * sx AS slope_den,
           (1000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx)
             AS slope_milli
    FROM pts, fit
    GROUP BY x, n, sx, sy, sxy, sxx
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency diagnostic for a corpus — the standard sanity
    check that token frequencies follow a power law (a training-data
    health signal: scraped boilerplate or synthetic spam bends the curve).
    Every numeric stays an exact integer: rank and frequency are mapped to
    the FLOOR-LOG2 domain via the portable bit-length idiom
    (``length(bin(x)) - 1`` / ``length(to_base(x, 2)) - 1`` — no libm
    ``log``), and the least-squares slope over those points is carried as
    the exact rational ``num/den`` plus a truncated milli-slope (both
    engines truncate integer division toward zero).  Zipf's law predicts
    slope ≈ −1000 milli.

    Output: one row per log2-rank bucket (bucket census) with the global
    fit replicated — every row's slope columns hash-check the whole
    regression.  Scale shape: wordcount shuffle (partial-agg absorbs
    Zipf skew by construction), then a VOCABULARY-sized ranking — the
    global row_number window is over distinct terms, not tokens, and the
    regression inputs are 5 scalars; at a 100 TB corpus the vocabulary
    rank would go through the repartitionByRange + per-partition
    row_number + driver prefix-sum pattern of agg_decile_lift_table."""
    d = load_spread(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    uni = (
        d.select(F.explode(_tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ranked = uni.withColumn(
        "rk", F.row_number().over(W.orderBy(F.desc("c"), F.asc("term")))
    )
    # vocabulary-sized and consumed by TWO branches (bucket census + fit
    # moments) of one returned plan — without the checkpoint the corpus
    # tokenize/groupBy and global rank run twice per invocation
    pts = ranked.select(
        (F.length(F.bin(F.col("rk"))) - 1).cast("long").alias("x"),
        (F.length(F.bin(F.col("c"))) - 1).cast("long").alias("y"),
        "c",
    ).localCheckpoint(eager=False)
    fit = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    buckets = pts.groupBy(F.col("x").alias("log2_rank")).agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("c").alias("total_freq"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return buckets.crossJoin(F.broadcast(fit)).select(
        "log2_rank",
        "n_terms",
        "total_freq",
        num.alias("slope_num"),
        den.alias("slope_den"),
        F.expr(
            "(1000 * (n * sxy - sx * sy)) div (n * sxx - sx * sx)"
        ).alias("slope_milli"),
    )


@query(
    "text_trigram_novelty",
    oracle="""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ts,
             (strpos('0123456789abcdef',
                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) AS nib
      FROM documents),
    tri AS (
      SELECT doc_id, nib,
             ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS g
      FROM t, UNNEST(range(1, len(ts) - 1)) AS r(i)),
    train AS (SELECT DISTINCT g FROM tri WHERE nib < 11),
    cand AS (SELECT doc_id, g FROM tri WHERE nib >= 11)
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           CAST(SUM(CASE WHEN tr.g IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           (1000000 * CAST(SUM(CASE WHEN tr.g IS NULL THEN 1 ELSE 0 END)
                           AS BIGINT))
             // CAST(COUNT(*) AS BIGINT) AS novelty_ppm
    FROM cand c LEFT JOIN train tr ON c.g = tr.g
    GROUP BY 1
    """,
)
def text_trigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty score — the memorization/contamination-adjacent
    signal: how much of each held-out document's token-trigram stream is
    ABSENT from the training split's trigram vocabulary (novelty 0 =
    every phrase already seen, high novelty = genuinely new text).  The
    corpus splits on the md5-first-nibble of doc_id (the repo's stable
    content-derived bucketing: ~11/16 train, 5/16 candidate — same idiom
    as sample_split_train_val_test), trigrams come off the zip_with gram
    ladder (pmi_top_pairs' bigram machinery extended one rung), and the
    score is exact integer ppm.

    Scale shape: one tokenize feeding both splits, a distinct over train
    trigrams (wordcount-class shuffle), and one equi-join of candidate
    trigram occurrences against that set, keyed on the gram — linear,
    skew absorbed by partial dedup map-side.  The trigram SET never sits
    on one machine; contrast with contamination_check, which broadcasts a
    small benchmark side.  Docs under 3 tokens have no trigram stream and
    drop out (both engines agree by construction)."""
    d = load_spread(spark, sf_dir, "documents")
    nib = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    ts = _tokens(F.col("text"))
    base = d.select("doc_id", ts.alias("ts"), nib.alias("nib"))
    n = F.size(F.col("ts"))
    m = F.greatest(n - 2, F.lit(0))
    inner = F.zip_with(
        F.slice(F.col("ts"), 2, m),
        F.slice(F.col("ts"), 3, m),
        lambda b, c: F.concat(b, F.lit(" "), c),
    )
    tri_arr = F.zip_with(
        F.slice(F.col("ts"), 1, m), inner,
        lambda a, bc: F.concat(a, F.lit(" "), bc),
    )
    tri = base.select("doc_id", "nib", F.explode(tri_arr).alias("g"))
    train = tri.where(F.col("nib") < 11).select("g").distinct()
    cand = tri.where(F.col("nib") >= 11).select("doc_id", "g")
    joined = cand.join(
        train.withColumn("seen", F.lit(1)), "g", "left"
    )
    agg = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.sum(F.when(F.col("seen").isNull(), 1).otherwise(0)).alias("n_novel"),
    )
    return agg.withColumn(
        "novelty_ppm", F.expr("(1000000 * n_novel) div n_trigrams")
    )


@query(
    "pipeline_curriculum_mix",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents)
    SELECT ROW_NUMBER() OVER (ORDER BY rn, lang, doc_id) AS position,
           doc_id, lang, rn
    FROM ranked
    """,
)
def pipeline_curriculum_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-curriculum interleave: order the corpus so languages are
    round-robin mixed tier by tier (every language's best remaining doc
    before any language's second-best), with "best" = longest text — the
    deterministic mixing pass before sharding a multilingual training set,
    preventing language-run clumps that destabilize training.

    The oracle states the spec as one global ``ROW_NUMBER() OVER (ORDER BY
    rn, lang, doc_id)`` — a single-partition sort no 100 TB plan should
    run.  The Spark plan computes the SAME total position with bounded
    state instead: (1) per-lang rank (shuffle on lang), (2) tier sizes =
    count per rank tier — a tier-count table (rows = max docs per
    language) whose running offsets are a prefix sum over that tiny
    table, (3) join the broadcast offsets back and add the within-tier
    index from a window over the ≤n_langs-row tier partitions.  Global
    order emerges from arithmetic, not a global sort — the same
    distributed-ranking idiom as agg_decile_lift_table, proven equivalent
    by the oracle's direct formulation."""
    d = load_spread(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    ranked = d.select("doc_id", "lang", "n_chars").withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
        ),
    )
    tiers = (
        ranked.groupBy("rn")
        .agg(F.count(F.lit(1)).alias("tier_n"))
        .withColumn(
            "base",
            F.sum("tier_n").over(
                W.orderBy("rn").rowsBetween(W.unboundedPreceding, -1)
            ),
        )
        .select("rn", F.coalesce("base", F.lit(0)).alias("base"))
    )
    idx = F.row_number().over(
        W.partitionBy("rn").orderBy("lang", "doc_id")
    )
    return (
        ranked.join(F.broadcast(tiers), "rn")
        .withColumn("position", (F.col("base") + idx).cast("long"))
        .select("position", "doc_id", "lang", F.col("rn").cast("long").alias("rn"))
    )


# --------------------------------------------------------------------------
# Classifier evaluation at corpus scale — confusion matrix over lang-ID
# --------------------------------------------------------------------------

from hadoopmapreduce_spark.registry import ORACLES as _REG_ORACLES


@query(
    "eval_lang_confusion",
    oracle=f"""
    WITH preds AS ({_REG_ORACLES["lang_id_markers"]}),
    conf AS (
      SELECT lang, lang_guess, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM preds GROUP BY 1, 2)
    SELECT lang, lang_guess, n_docs,
           CAST(n_docs * 1000000
                // SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT)
             AS recall_ppm,
           CAST(n_docs * 1000000
                // SUM(n_docs) OVER (PARTITION BY lang_guess) AS BIGINT)
             AS precision_ppm
    FROM conf
    """,
)
def eval_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLASSIFIER EVALUATION as a first-class corpus query: the confusion
    matrix of the registered language-ID heuristic against the labeled
    ``lang`` column, with exact-integer recall (share of each true
    language routed to each guess) and precision (share of each guess that
    was right) in ppm — the eval loop every data-pipeline classifier
    (language, quality, toxicity) runs after each rule change.  Diagonal
    rows carry the per-class recall/precision; off-diagonal rows say
    WHERE the mass leaks.

    Integer discipline: ppm = n·10^6 div total (no floats; DuckDB ``//``
    on BIGINT is exact integer division — the DECIMAL ``//`` trap from
    NOTES does not apply).  Shapes: composes :func:`lang_id_markers`
    (narrow, no shuffle), one |langs|²-bounded groupBy, then two window
    sums over the tiny matrix — corpus-scale work is the one scan the
    classifier itself does."""
    preds = lang_id_markers(spark, sf_dir)
    conf = preds.groupBy("lang", "lang_guess").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return conf.select(
        "lang",
        "lang_guess",
        "n_docs",
        F.expr(
            "n_docs * 1000000 div sum(n_docs) over (partition by lang)"
        ).alias("recall_ppm"),
        F.expr(
            "n_docs * 1000000 div sum(n_docs) over (partition by lang_guess)"
        ).alias("precision_ppm"),
    )


@query(
    "pipeline_mixture_cap_rebalance",
    oracle=r"""
    WITH per AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(regexp_split_to_array(text, '\s+'))) AS BIGINT)
               AS tokens
      FROM documents GROUP BY 1),
    pos AS (
      SELECT *,
             CAST(ROW_NUMBER() OVER (ORDER BY tokens, lang) AS BIGINT) AS i,
             CAST(COALESCE(SUM(tokens) OVER (ORDER BY tokens, lang
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS s_prev,
             CAST(COUNT(*) OVER () AS BIGINT) AS n_langs,
             CAST(SUM(tokens) OVER () AS BIGINT) // 2 AS b
      FROM per),
    flags AS (
      SELECT *, CASE WHEN tokens * (n_langs - i + 1) <= b - s_prev
                     THEN 1 ELSE 0 END AS is_full
      FROM pos),
    agg AS (
      SELECT *,
             CAST(SUM(is_full) OVER () AS BIGINT) AS k,
             CAST(SUM(CASE WHEN is_full = 1 THEN tokens ELSE 0 END) OVER ()
                  AS BIGINT) AS s_k,
             CAST(SUM(1 - is_full) OVER (ORDER BY lang
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS rn_capped
      FROM flags),
    q AS (
      SELECT lang, n_docs, tokens, is_full,
             CASE WHEN is_full = 1 THEN tokens
                  ELSE (b - s_k) // (n_langs - k)
                       + CASE WHEN rn_capped <= (b - s_k) % (n_langs - k)
                              THEN 1 ELSE 0 END
             END AS quota_tokens
      FROM agg)
    SELECT lang, n_docs, tokens, quota_tokens,
           (1000000 * quota_tokens) // greatest(tokens, 1) AS factor_ppm,
           1 - is_full AS is_capped
    FROM q
    """,
)
def pipeline_mixture_cap_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA-MIXTURE REBALANCING by water-filling — divide a token budget
    (here half the corpus) across languages as evenly as possible WITHOUT
    upsampling anyone: small languages are taken whole ("full"), the
    budget they don't use is re-spread over the large ones, which all
    land on a common cap.  This is the standard no-repetition variant of
    training-mixture rebalancing (the capped cousin of temperature
    sampling), and the per-lang ``factor_ppm`` is exactly the
    subsampling rate a downstream sampler applies.

    Exact integer water-filling WITHOUT iteration: sorted by tokens
    ascending, a language is full iff ``T_i * (L - i + 1) <= B - S_{i-1}``
    (what it would claim under an equal split of the remaining budget
    fits) — fullness is monotone along that order, so one window pass
    finds the waterline; the capped share splits as ``R div c`` with the
    first ``R mod c`` languages (lang ASC) taking one extra token
    (largest-remainder, the fin_prorate discipline), so
    ``sum(quota) == B`` exactly (pinned in tests).  A capped language's
    quota never exceeds its supply: ``T_{k+1} > R/c`` follows from the
    waterline inequality failing at k+1.

    Scale shape: one corpus scan into a per-lang partial+final aggregate;
    every window runs over the LANGUAGE-sized table (the band-offset
    pattern) — metadata-sized no matter the corpus."""
    d = load_spread(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_tokens(F.col("text")))).alias("tokens"),
    )
    wi = W.orderBy("tokens", "lang")
    pos = per.select(
        "lang",
        "n_docs",
        "tokens",
        F.row_number().over(wi).cast("long").alias("i"),
        F.coalesce(
            F.sum("tokens").over(wi.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("s_prev"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n_langs"),
        F.expr("sum(tokens) over () div 2").alias("b"),
    )
    flags = pos.withColumn(
        "is_full",
        F.when(
            F.col("tokens") * (F.col("n_langs") - F.col("i") + 1)
            <= F.col("b") - F.col("s_prev"),
            1,
        ).otherwise(0),
    )
    wl = W.orderBy("lang").rowsBetween(W.unboundedPreceding, 0)
    agg = flags.select(
        "*",
        F.sum("is_full").over(W.partitionBy()).alias("k"),
        F.sum(F.when(F.col("is_full") == 1, F.col("tokens")).otherwise(0))
        .over(W.partitionBy())
        .alias("s_k"),
        F.sum(F.lit(1) - F.col("is_full")).over(wl).alias("rn_capped"),
    )
    q = agg.withColumn(
        "quota_tokens",
        F.when(F.col("is_full") == 1, F.col("tokens")).otherwise(
            F.expr(
                "(b - s_k) div (n_langs - k)"
                " + if(rn_capped <= (b - s_k) % (n_langs - k), 1, 0)"
            )
        ),
    )
    return q.select(
        "lang",
        "n_docs",
        "tokens",
        "quota_tokens",
        F.expr("(1000000 * quota_tokens) div greatest(tokens, 1)").alias(
            "factor_ppm"
        ),
        (F.lit(1) - F.col("is_full")).alias("is_capped"),
    )


# --------------------------------------------------------------------------
# staged for round-7 registration: zlib compression-ratio quality signal
# --------------------------------------------------------------------------
#
# The standard cheap quality/repetition filter for LLM corpora (used by the
# Gopher/RefinedWeb-style rule batteries): near-random text compresses
# poorly, boilerplate/templated text compresses extremely well, and both
# tails get gated before training.  DEFLATE is not expressible in SQL, so
# like udaf_tdigest_quantiles this is a ROWS-ONLY registration candidate —
# its correctness evidence is the in-repo battery instead: an exact
# recomputation test against direct zlib, a three-partitioning determinism
# test, and a monotonicity property (repetitive < random, pinned in
# tests/test_round6_session2.py).  Values are stable for a fixed zlib
# build (level pinned at 6); cross-build drift is why no driver oracle.

DEFLATE_LEVEL = 6


def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DEFLATE ratio in ppm: ``deflate_ppm = 1e6 *
    compressed_bytes / raw_bytes`` (integer), plus the gate flag for the
    standard keep-band.  The only Python in the plan is one Arrow-batched
    pandas UDF computing ``len(zlib.compress(...))`` — the ratio
    arithmetic and gating stay JVM-side; one narrow projection, no
    shuffle, linear at any scale."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _deflate_len(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), DEFLATE_LEVEL))
        )

    d = load_spread(spark, sf_dir, "documents")
    nb = F.length(F.encode(F.col("text"), "utf-8")).cast("bigint")
    out = d.select(
        "doc_id",
        nb.alias("n_bytes"),
        _deflate_len(F.col("text")).cast("bigint").alias("n_deflate"),
    )
    ratio = F.expr("(1000000 * n_deflate) div greatest(n_bytes, 1)")
    return out.select(
        "doc_id",
        "n_bytes",
        "n_deflate",
        ratio.alias("deflate_ppm"),
        # keep-band: heavily repetitive (<300000 ppm) and incompressible
        # (>=1050000 ppm — deflate overhead can exceed 1.0 on tiny docs)
        # both gate out
        F.when((ratio >= 300000) & (ratio < 1050000), F.lit(1))
        .otherwise(F.lit(0))
        .alias("keep"),
    )


# --- PII scrub (privacy filtering for training corpora) ---------------------
#
# The fixture corpus is synthetic and carries no organic PII, so the
# operator first INJECTS deterministic PII spans derived from (doc_id) —
# the same fixture-augmentation discipline as the multimodal codec
# payloads — and then runs the real detection + redaction pipeline over
# the augmented text.  Both engines construct the identical augmented
# string, so the oracle adjudicates the regex detection, the redaction
# rewrite, and the audit rollup end to end.

PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\d{3}-\d{3}-\d{4}"
PII_SSN_RE = r"\d{3}-\d{2}-\d{4}"
PII_IP_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"


@query(
    "pipeline_pii_scrub",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id, lang,
             text
             || CASE WHEN doc_id % 3 = 0
                  THEN ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com' ELSE '' END
             || CASE WHEN doc_id % 4 = 0
                  THEN ' call 415-555-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                  THEN ' ssn 123-45-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END
             || CASE WHEN doc_id % 7 = 0
                  THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
                       || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                  ELSE '' END AS t
      FROM documents),
    scrubbed AS (
      SELECT doc_id, lang, t,
             len(regexp_extract_all(t, '{PII_EMAIL_RE}')) AS n_emails,
             len(regexp_extract_all(t, '{PII_PHONE_RE}')) AS n_phones,
             len(regexp_extract_all(t, '{PII_SSN_RE}')) AS n_ssns,
             len(regexp_extract_all(t, '{PII_IP_RE}')) AS n_ips,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(t, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{PII_PHONE_RE}', '<PHONE>', 'g'),
                 '{PII_SSN_RE}', '<SSN>', 'g'),
               '{PII_IP_RE}', '<IP>', 'g') AS red
      FROM aug)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_emails + n_phones + n_ssns + n_ips > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
           CAST(SUM(n_emails) AS BIGINT) AS n_emails,
           CAST(SUM(n_phones) AS BIGINT) AS n_phones,
           CAST(SUM(n_ssns) AS BIGINT) AS n_ssns,
           CAST(SUM(n_ips) AS BIGINT) AS n_ips,
           CAST(SUM(length(t) - length(red)) AS BIGINT) AS chars_delta
    FROM scrubbed GROUP BY 1
    """,
)
def pipeline_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level PII audit ROLLUP — the governance report a scrub job
    emits, complementing :func:`pii_redact` (which returns the per-doc
    rewritten rows for two detector types): four detectors (emails,
    NANP-style phone numbers, SSNs, IPv4 literals), CONDITIONAL injection
    (doc_id mod-classes, so coverage varies per doc instead of every doc
    carrying every type), chained ``regexp_replace`` redaction into typed
    placeholders, and a per-language rollup: doc/PII counts, how many
    docs carried any PII at all, and the redaction length delta
    (negative when a placeholder is longer than the span it replaced).

    Scale shape: detection and redaction are per-row codegen regex ops —
    shuffle-free, embarrassingly parallel, no Python in the loop; the
    rollup is one partial+final aggregate keyed on the (tiny) language
    domain.  The regexes stay inside the Java-regex/RE2 COMMON SUBSET
    (no lookaround, no backrefs) so the exact same patterns run on both
    engines — also the portability contract a production scrubber needs
    across scan engines.
    """
    d = load_spread(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        "lang",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(
                    F.lit(" call 415-555-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" ssn 123-45-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" host 10."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".0."),
                    ((F.col("doc_id") * 7) % 256).cast("string"),
                ),
            ).otherwise(""),
        ).alias("t"),
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.col("t"), PII_EMAIL_RE, "<EMAIL>"
                ),
                PII_PHONE_RE,
                "<PHONE>",
            ),
            PII_SSN_RE,
            "<SSN>",
        ),
        PII_IP_RE,
        "<IP>",
    )
    scrubbed = aug.select(
        "lang",
        F.col("t"),
        F.regexp_count(F.col("t"), F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(PII_PHONE_RE)).alias("n_phones"),
        F.regexp_count(F.col("t"), F.lit(PII_SSN_RE)).alias("n_ssns"),
        F.regexp_count(F.col("t"), F.lit(PII_IP_RE)).alias("n_ips"),
        red.alias("red"),
    )
    pii_total = (
        F.col("n_emails") + F.col("n_phones") + F.col("n_ssns") + F.col("n_ips")
    )
    return scrubbed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((pii_total > 0).cast("long")).alias("docs_with_pii"),
        F.sum("n_emails").cast("long").alias("n_emails"),
        F.sum("n_phones").cast("long").alias("n_phones"),
        F.sum("n_ssns").cast("long").alias("n_ssns"),
        F.sum("n_ips").cast("long").alias("n_ips"),
        F.sum(F.length("t") - F.length("red")).cast("long").alias("chars_delta"),
    )


# --- bigram-LM surprise scoring (CCNet-style quality filtering) --------------

LM_SURPRISE_TOP = 20


@query(
    "text_lm_surprise",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ts
      FROM documents),
    uni AS (
      SELECT u.tok AS term, CAST(COUNT(*) AS BIGINT) AS c
      FROM t, UNNEST(ts) AS u(tok) GROUP BY 1),
    big AS (
      SELECT ts[i] AS w1, ts[i + 1] AS w2, CAST(COUNT(*) AS BIGINT) AS c_xy
      FROM t, UNNEST(range(1, len(ts))) AS r(i)
      GROUP BY 1, 2),
    occ AS (
      SELECT t.doc_id, ts[i] AS w1, ts[i + 1] AS w2
      FROM t, UNNEST(range(1, len(ts))) AS r(i)),
    scored AS (
      SELECT o.doc_id,
             (length(bin(u.c)) - 1) - (length(bin(b.c_xy)) - 1) AS s
      FROM occ o
      JOIN uni u ON u.term = o.w1
      JOIN big b ON b.w1 = o.w1 AND b.w2 = o.w2),
    per_doc AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(s) AS BIGINT) AS surprise_sum,
             CAST(SUM(s) AS BIGINT) * 1000 // CAST(COUNT(*) AS BIGINT)
               AS surprise_x1000
      FROM scored GROUP BY 1)
    SELECT doc_id, n_bigrams, surprise_sum, surprise_x1000
    FROM per_doc
    ORDER BY surprise_x1000 DESC, doc_id
    LIMIT {LM_SURPRISE_TOP}
    """,
)
def text_lm_surprise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-language-model surprise scoring — the CCNet-style quality
    signal: train bigram/unigram counts ON the corpus itself, score every
    document by how surprising its bigram sequence is under that model,
    and surface the top-{LM_SURPRISE_TOP} most-surprising documents (the
    ones a perplexity-filtered training mix would inspect or drop).

    Surprise per bigram occurrence is the INTEGER floor-log2 likelihood
    ratio ``floor(log2 c(w1)) - floor(log2 c(w1 w2))`` — a monotone proxy
    for ``-log2 P(w2|w1)`` computed as ``length(bin(n)) - 1`` on exact
    counts, so NO libm logarithm ever crosses the engine boundary (the
    same determinism discipline as pmi_top_pairs' rational-form score).
    Since c(w1 w2) <= c(w1), surprise is >= 0; per-doc score is the
    integer-division mean x1000.

    Distributed shape: ONE tokenize feeds the unigram aggregate, the
    bigram aggregate, and the per-occurrence stream (all term-keyed
    shuffles with map-side partials; Zipf skew handled by AQE); the two
    count joins key on the same terms; the per-doc rollup keys on doc_id;
    the final top-k is orderBy+limit (TakeOrderedAndProject — bounded
    heaps, no global sort, no single-partition window).
    """
    docs = load_spread(spark, sf_dir, "documents")
    # ONE tokenize, materialized: `tok_table` feeds the unigram aggregate
    # and the bigram stream; `occ` is consumed twice (the bigram count AND
    # the scoring join), so it is checkpointed — without these the regex
    # tokenize+explode (the query's dominant cost) would run three times
    tok_table = docs.select(
        "doc_id", _tokens(F.col("text")).alias("ts")
    ).localCheckpoint(eager=False)
    t = tok_table.filter(F.size("ts") >= 2)
    toks = tok_table.select(F.explode(F.col("ts")).alias("term"))
    uni = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    pair_structs = F.zip_with(
        F.slice(F.col("ts"), 1, F.size("ts") - 1),
        F.slice(F.col("ts"), 2, F.size("ts") - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    occ = (
        t.select("doc_id", F.explode(pair_structs).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .localCheckpoint(eager=False)
    )
    big = occ.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))

    def flog2(col):
        return F.length(F.bin(col)) - 1

    scored = (
        occ.join(uni, occ["w1"] == uni["term"])
        .join(big, ["w1", "w2"])
        .select(
            "doc_id", (flog2(F.col("c")) - flog2(F.col("c_xy"))).alias("s")
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("s").cast("long").alias("surprise_sum"),
        F.expr("CAST(sum(s) * 1000 div count(1) AS BIGINT)").alias(
            "surprise_x1000"
        ),
    )
    return per_doc.orderBy(
        F.desc("surprise_x1000"), F.asc("doc_id")
    ).limit(LM_SURPRISE_TOP)


# --------------------------------------------------------------------------
# DSIR-style importance selection (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling")
# --------------------------------------------------------------------------

DSIR_BUCKETS = 64  # hashed bigram feature space (the paper's 10^4, scaled
                   # to the fixture vocabulary; a constant, never data-sized)
DSIR_TARGET_LANG = "en"  # the "target distribution" exemplar corpus
DSIR_Q20 = 1048576  # 2^20 fixed-point scale for the integer ratio weights


@query(
    "sample_importance_dsir",
    oracle=f"""
    WITH ts AS (SELECT doc_id, lang,
                       regexp_split_to_array(text, '\\s+') AS ts
                FROM documents),
    occ AS (
      SELECT doc_id, lang,
             ((strpos('0123456789abcdef', substr(md5(bg), 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(md5(bg), 2, 1)) - 1))
             % {DSIR_BUCKETS} AS b
      FROM (SELECT doc_id, lang, ts[i.i] || ' ' || ts[i.i + 1] AS bg
            FROM ts, LATERAL (SELECT unnest(range(1, len(ts))) AS i) i)),
    stats AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS rb,
             CAST(SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS tb
      FROM occ GROUP BY 1),
    tot AS (SELECT SUM(rb) AS r, SUM(tb) AS t FROM stats),
    soc AS (
      SELECT o.doc_id, o.lang,
             (s.tb + 1) * {DSIR_Q20} // (s.rb + 1) AS w
      FROM occ o JOIN stats s USING (b)),
    doc AS (SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   CAST(SUM(w) AS BIGINT) AS sw
            FROM soc GROUP BY 1, 2)
    SELECT doc_id, lang, n_bigrams,
           CAST(sw - n_bigrams
                * ((t.t + {DSIR_BUCKETS}) * {DSIR_Q20}
                   // (t.r + {DSIR_BUCKETS})) AS BIGINT) AS dsir_score,
           CAST(CASE WHEN sw - n_bigrams
                          * ((t.t + {DSIR_BUCKETS}) * {DSIR_Q20}
                             // (t.r + {DSIR_BUCKETS})) >= 0
                     THEN 1 ELSE 0 END AS INT) AS kept
    FROM doc, tot t
    """,
)
def sample_importance_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance selection (Xie et al. 2023): score every
    document by how much more likely its hashed-bigram features are under
    a TARGET distribution (the DSIR_TARGET_LANG sub-corpus) than under the raw
    corpus, and keep documents whose importance ratio is >= 1 — the
    derandomized, temperature-0 form of the paper's Gumbel-top-k
    importance RESAMPLING (randomized selection swaps the threshold for
    per-doc Gumbel noise; the feature/weight machinery is identical).

    Pipeline, all engine-portable integer arithmetic:

    1. **Features** — word bigrams hashed into DSIR_BUCKETS buckets via
       the md5-two-nibble integer (the sample_split recipe — identical
       hex on both engines; xxhash64 has no DuckDB twin).
    2. **Distributions** — one 64-row bucket aggregate yields the raw
       occurrence counts and (via a conditional sum in the same pass)
       the target counts; Laplace +1 smoothing.
    3. **Ratio weights** — per-occurrence fixed-point likelihood ratio
       ``(T_b+1)·2^20 div (R_b+1)`` (integer floor-div, portable for
       non-negative operands — the dq_ks_drift recipe).  A floor-log2
       product form (the paper's log-domain sum, via the bin()-length
       idiom) was MEASURED first and rejected: with T_b <= R_b every
       per-occurrence term floors to <= -1 and the +-0.5-bit floor bias
       swamps the ~0.3-bit per-gram signal — every document scored
       kept=0.  The arithmetic-mean ratio keeps 20 fractional bits, so
       the per-bucket signal survives integerization.
    4. **Selection** — kept = dsir_score >= 0, where the score is the
       weight sum minus ``n_bigrams`` times the corpus-mean weight
       ``(T+B)·2^20 div (R+B)``: a document is kept when its average
       bucket ratio exceeds the global ratio (importance >= 1).  A pure
       per-row predicate — selection needs NO global rank/sort (the
       paper's Gumbel top-k would be a global order; the threshold form
       is the shuffle-free production variant).  At sf0.01 the target
       language keeps 141/218 docs vs 18-32 of 64-75 for each other
       language — the 2x selectivity gap a soft reweighting buys on a
       shared-vocabulary fixture.
       Integer headroom: weights stay < 2^21 and the sums < n·2^21 —
       int64-safe past 2^40 bigrams per document; bucket counts are
       safe to 2^43 occurrences per bucket before (T_b+1)·2^20 nears
       int64 (shard the bucket space long before that).

    Scale shape: one scan → bigram explode (char-linear) → 64-row
    bucket aggregate broadcast back onto the occurrence stream → one
    doc-keyed aggregate.  No global window, no data-sized model state —
    the bucket table is the entire learned model (the paper's point).
    Documents with fewer than two tokens carry no features and are
    absent by construction (both engines)."""
    d = load_spread(spark, sf_dir, "documents")
    ts = d.select("doc_id", "lang", _tokens(F.col("text")).alias("ts"))
    # sequence(1, n) DESCENDS when n < 1, so guard the 1-token edge the
    # way DuckDB's exclusive range(1, len) handles it for free
    bg = ts.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "CASE WHEN size(ts) < 2 THEN array()"
                " ELSE transform(sequence(1, size(ts) - 1),"
                " i -> element_at(ts, i) || ' ' || element_at(ts, i + 1))"
                " END"
            )
        ).alias("bg"),
    )
    md5 = F.md5(F.col("bg").cast("binary"))

    def nib(i: int):
        return F.instr(F.lit("0123456789abcdef"), F.substring(md5, i, 1)) - 1

    occ = bg.select(
        "doc_id",
        "lang",
        F.pmod(nib(1) * 16 + nib(2), F.lit(DSIR_BUCKETS)).alias("b"),
    )
    stats = occ.groupBy("b").agg(
        F.count(F.lit(1)).alias("rb"),
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
        ).alias("tb"),
    )
    tot = stats.agg(
        F.sum("rb").alias("r"), F.sum("tb").alias("t")
    )
    # fixed-point ratio weight; div truncates toward zero == DuckDB's //
    # floor for these strictly non-negative operands (playbook rule)
    soc = occ.join(F.broadcast(stats), "b").select(
        "doc_id",
        "lang",
        F.expr(f"(tb + 1) * {DSIR_Q20} div (rb + 1)").alias("w"),
    )
    doc = soc.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("w").alias("sw"),
    )
    norm = F.expr(
        f"(t + {DSIR_BUCKETS}) * {DSIR_Q20} div (r + {DSIR_BUCKETS})"
    )
    score = (F.col("sw") - F.col("n_bigrams") * norm).cast("long")
    return doc.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "lang",
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        score.alias("dsir_score"),
        F.when(score >= 0, 1).otherwise(0).cast("int").alias("kept"),
    )


@query(
    "pipeline_temperature_mix",
    oracle="""
    WITH per AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(regexp_split_to_array(text, '\\s+'))
                      ) AS BIGINT) AS tokens
      FROM documents GROUP BY 1),
    w AS (
      SELECT lang, n_docs, tokens,
             CAST(FLOOR(SQRT(CAST(tokens AS DOUBLE))) AS BIGINT) AS k0
      FROM per),
    iw AS (  -- guarded integer sqrt: exact for any int64 either engine
      SELECT lang, n_docs, tokens,
             CASE WHEN k0 * k0 > tokens THEN k0 - 1
                  WHEN (k0 + 1) * (k0 + 1) <= tokens THEN k0 + 1
                  ELSE k0 END AS wgt
      FROM w),
    tot AS (
      SELECT lang, n_docs, tokens, wgt,
             CAST(SUM(wgt) OVER () AS BIGINT) AS wsum,
             CAST(SUM(tokens) OVER () // 2 AS BIGINT) AS b
      FROM iw),
    base AS (
      SELECT lang, n_docs, tokens, wgt, b,
             (b * wgt) // wsum AS q0,
             (b * wgt) % wsum AS rem,
             b - CAST(SUM((b * wgt) // wsum) OVER () AS BIGINT) AS extra
      FROM tot),
    rk AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, lang ASC) AS rr
      FROM base)
    SELECT lang, n_docs, tokens,
           CAST(wgt AS BIGINT) AS weight,
           CAST(q0 + CASE WHEN rr <= extra THEN 1 ELSE 0 END AS BIGINT)
             AS quota_tokens,
           CAST(1000000 * (q0 + CASE WHEN rr <= extra THEN 1 ELSE 0 END)
                // greatest(tokens, 1) AS BIGINT) AS factor_ppm,
           CAST((q0 + CASE WHEN rr <= extra THEN 1 ELSE 0 END)
                // greatest(tokens, 1) AS BIGINT) AS full_epochs
    FROM rk
    """,
)
def pipeline_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-SAMPLED data mixture (the multilingual-LM standard,
    alpha = 1/2): per-language sampling weights proportional to
    tokens^alpha flatten the natural distribution — low-resource
    languages are UPSAMPLED (factor_ppm > 1e6, full_epochs >= 1 means
    whole-corpus repeats), the complement of
    ``pipeline_mixture_cap_rebalance``'s no-repetition water-filling.

    Exactness: tokens^(1/2) is the GUARDED integer sqrt — floor(sqrt(x))
    via libm, then the classic +/-1 correction against k² <= x < (k+1)²,
    so the weight is the true isqrt on BOTH engines regardless of how
    their sqrt rounds near perfect squares; the token budget (half the
    corpus, the cap_rebalance convention) splits by largest remainder
    (fin_prorate discipline: base b·w div W, extras to the biggest
    remainders, ties lang ASC), so sum(quota_tokens) == budget EXACTLY
    (pinned in tests) and every downstream number is one integer
    division.

    Scale shape: one corpus scan into a per-lang partial+final aggregate;
    every window runs over the LANGUAGE-sized table — metadata-sized no
    matter the corpus, same as the other mixture queries."""
    d = load_spread(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_tokens(F.col("text")))).alias("tokens"),
    )
    k0 = F.floor(F.sqrt(F.col("tokens").cast("double"))).cast("long")
    iw = per.withColumn("k0", k0).withColumn(
        "wgt",
        F.when(F.col("k0") * F.col("k0") > F.col("tokens"), F.col("k0") - 1)
        .when(
            (F.col("k0") + 1) * (F.col("k0") + 1) <= F.col("tokens"),
            F.col("k0") + 1,
        )
        .otherwise(F.col("k0")),
    )
    tot = iw.select(
        "lang",
        "n_docs",
        "tokens",
        "wgt",
        F.sum("wgt").over(W.partitionBy()).alias("wsum"),
        F.expr("sum(tokens) over () div 2").alias("b"),
    )
    base = tot.select(
        "*",
        F.expr("(b * wgt) div wsum").alias("q0"),
        ((F.col("b") * F.col("wgt")) % F.col("wsum")).alias("rem"),
    ).withColumn(
        "extra",
        F.col("b") - F.sum("q0").over(W.partitionBy()),
    )
    rr = F.row_number().over(W.orderBy(F.desc("rem"), F.asc("lang")))
    quota = F.col("q0") + F.when(F.col("rr") <= F.col("extra"), 1).otherwise(0)
    return (
        base.withColumn("rr", rr)
        .select(
            "lang",
            "n_docs",
            "tokens",
            F.col("wgt").cast("long").alias("weight"),
            quota.cast("long").alias("quota_tokens"),
            F.expr(
                "1000000 * (q0 + CASE WHEN rr <= extra THEN 1 ELSE 0 END)"
                " div greatest(tokens, 1)"
            ).cast("long").alias("factor_ppm"),
            F.expr(
                "(q0 + CASE WHEN rr <= extra THEN 1 ELSE 0 END)"
                " div greatest(tokens, 1)"
            ).cast("long").alias("full_epochs"),
        )
    )


# --------------------------------------------------------------------------
# BM25 ranked retrieval over a bounded query panel (VERDICT r11 ask #5)
# --------------------------------------------------------------------------

BM25_PANEL = 8    # probe documents (the 8 smallest doc_ids — bounded at any N)
BM25_QTERMS = 3   # query terms per probe: its top tf·idf keywords
BM25_TOP_K = 5    # ranked results returned per query

# k1 = 3/2 and b = 3/4 as exact rationals (Robertson/Sparck Jones BM25,
# the no-libm discipline): with dl/avgdl = dl·N/T the per-term weight
#   tf·(k1+1) / (tf + k1·(1 − b + b·dl·N/T))
# clears denominators to   20·tf·T / (8·tf·T + 3·T + 9·dl·N)
# — all integers.  idf uses the POSITIVE rational smoothing (2N+1)/(2df+1)
# (monotone-decreasing in df like the classic (N−df+½)/(df+½) form but
# never negative, which sidesteps the floor-vs-truncate divergence of
# negative integer division between engines — the move-pass lesson).
_BM25_IDF_PPM = "(2 * n_docs + 1) * 1000000 div (2 * df + 1)"
_BM25_TFNORM_PPM = "(20 * tf * t_toks) * 1000000 div (8 * tf * t_toks + 3 * t_toks + 9 * dl * n_docs)"


# module-level so retrieval_rrf_fusion's oracle can compose it verbatim
BM25_ORACLE = f"""
    WITH tf AS (
      SELECT doc_id, tok AS term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok
            FROM documents)
      GROUP BY 1, 2),
    dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(dl) AS BIGINT) AS t_toks FROM dl),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    probe AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT {BM25_PANEL}),
    qsel AS (
      SELECT p.doc_id AS query_doc, tf.term,
             ROW_NUMBER() OVER (
               PARTITION BY p.doc_id
               ORDER BY tf.tf * ((2 * s.n_docs + 1) * 1000000 // (2 * d.df + 1)) DESC,
                        tf.term ASC) AS qrk
      FROM probe p
      JOIN tf ON tf.doc_id = p.doc_id
      JOIN df d ON d.term = tf.term
      CROSS JOIN stats s),
    q AS (SELECT query_doc, term FROM qsel WHERE qrk <= {BM25_QTERMS}),
    scored AS (
      SELECT q.query_doc, tf.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_terms,
             CAST(SUM(
               (((2 * s.n_docs + 1) * 1000000 // (2 * d.df + 1))
                * ((20 * tf.tf * s.t_toks) * 1000000
                   // (8 * tf.tf * s.t_toks + 3 * s.t_toks
                       + 9 * dl.dl * s.n_docs))) // 1000000
             ) AS BIGINT) AS score_mppm
      FROM q
      JOIN tf ON tf.term = q.term
      JOIN df d ON d.term = q.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
      GROUP BY 1, 2)
    SELECT query_doc, CAST(rk AS INT) AS rank, doc_id, score_mppm,
           CAST(n_terms AS INT) AS n_terms,
           CAST(CASE WHEN doc_id = query_doc THEN 1 ELSE 0 END AS INT)
             AS is_self
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_doc
                                       ORDER BY score_mppm DESC, doc_id ASC)
                      AS rk
          FROM scored) t
    WHERE rk <= {BM25_TOP_K}
    """


@query("text_bm25_topk", oracle=BM25_ORACLE)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson & Sparck Jones; the Okapi scoring
    every lexical search stack ships) over a bounded query panel — the
    text-retrieval sibling of the embedding evals: each of the
    {BM25_PANEL} probe documents queries the corpus with its own top
    tf·idf keywords and gets its BM25 top-{BM25_TOP_K}.

    Exactness: ALL integer arithmetic.  k1=3/2 and b=3/4 clear
    denominators (see the constants above), idf is the positive rational
    smoothing (2N+1)/(2df+1) scaled to ppm by one truncating division,
    and the per-term score idf_ppm·tfnorm_ppm div 1e6 sums as exact
    int64s — order-independent across partial aggregation, and the
    nested truncations are the SAME expressions on both engines.  Bounds:
    every intermediate ≤ ~1e16 at fixture scale (int64-safe; at corpus
    sizes where 20·tf·T·1e6 approaches 2^63 the scoring moves to
    decimal, which both engines widen exactly).

    Self-retrieval is the built-in sanity check ``is_self`` exposes: a
    probe scoring its own top keywords should rank itself highly
    (pinned observationally in tests).

    Scale shape: one explode → (doc, term) tf with map-side combine, a
    vocab-sized df reduction, a doc-sized dl rollup, a 1-row stats
    broadcast; the query panel (panel×terms rows, bounded constants) is
    a broadcast against the tf POSTINGS — per-query work is the postings
    of {BM25_QTERMS} terms, never the corpus; the final top-k is a
    panel-partitioned bounded window.  This is the inverted-index plan
    ``text_inverted_index`` documents, composed end-to-end.
    [REF] parity: ranked retrieval composes the reference's per-key
    aggregate + join surface (ClickThru.java:98-168) at search-engine
    semantics."""
    from pyspark.sql.window import Window

    d = load_spread(spark, sf_dir, "documents")
    # tf feeds FOUR consumers (dl, df, the query-panel join, the scoring
    # join); materialize it once — at 100 TB this checkpoint IS the
    # inverted-index build the docstring describes, not an extra cost
    tf = (
        d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("t_toks")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    probe = d.select("doc_id").orderBy("doc_id").limit(BM25_PANEL)
    wq = Window.partitionBy("query_doc").orderBy(
        F.desc("qscore"), F.asc("term")
    )
    q = (
        probe.withColumnRenamed("doc_id", "query_doc")
        .join(tf, F.col("query_doc") == tf["doc_id"])
        .join(df, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_doc",
            "term",
            (F.col("tf") * F.expr(_BM25_IDF_PPM)).alias("qscore"),
        )
        .withColumn("qrk", F.row_number().over(wq))
        .filter(F.col("qrk") <= BM25_QTERMS)
        .select("query_doc", "term")
    )
    scored = (
        F.broadcast(q)
        .join(tf, "term")
        .join(df, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_doc",
            "doc_id",
            F.expr(
                f"(({_BM25_IDF_PPM}) * ({_BM25_TFNORM_PPM})) div 1000000"
            ).alias("term_mppm"),
        )
        .groupBy("query_doc", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("term_mppm").alias("score_mppm"),
        )
    )
    wr = Window.partitionBy("query_doc").orderBy(
        F.desc("score_mppm"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= BM25_TOP_K)
        .select(
            "query_doc",
            F.col("rk").cast("int").alias("rank"),
            "doc_id",
            "score_mppm",
            F.col("n_terms").cast("int").alias("n_terms"),
            F.when(F.col("doc_id") == F.col("query_doc"), 1)
            .otherwise(0)
            .cast("int")
            .alias("is_self"),
        )
    )


# --------------------------------------------------------------------------
# UTF-8 structural validation — the ingest gate (RFC 3629 / Unicode 15 §3.9)
# --------------------------------------------------------------------------
#
# Web-scraped corpora arrive as BYTES; the first thing a pipeline does is
# validate/classify the encoding.  This is a REAL from-spec validator (no
# codecs module): lead-byte ranges, continuation counts, overlong minima
# (0x80 / 0x800 / 0x10000), the CESU/surrogate exclusion (U+D800-DFFF),
# and the U+10FFFF ceiling — with the "skip the maximal subpart" resync
# policy on error (Unicode §3.9 best practice: an invalid sequence
# consumes its lead plus any immediately following continuation bytes).
# The synthesizer plants exactly one law-controlled malformation class
# per document (or none), so every output column has a closed-form
# oracle while the validator exercises the full rule table.

UTF8_CLASSES = 5  # doc_id % 5: 0 valid, 1 lone cont, 2 truncated,
#                   3 overlong/invalid lead, 4 surrogate half


def synthesize_utf8(seed: int, cls: int) -> bytes:
    """ASCII run + one optional malformation + valid 2/3/4-byte runs."""
    a = 8 + seed % 9
    k2 = 2 + seed % 3
    k3 = 1 + seed % 2
    out = bytearray((32 + (3 * i + seed) % 95) for i in range(a))
    if cls == 1:
        out.append(0x80 + seed % 0x40)  # lone continuation byte
    elif cls == 2:
        out += bytes((0xE2, 0x82))  # truncated 3-byte lead...
        out.append(0x41)  # ...resync lands on ASCII 'A'
    elif cls == 3:
        out += bytes((0xC0, 0xAF))  # overlong '/': invalid lead C0
    elif cls == 4:
        out += bytes((0xED, 0xA0, 0x80))  # U+D800 surrogate half
    for i in range(k2):
        cp = 0xA0 + (seed + 37 * i) % 0x60
        out += bytes((0xC0 | (cp >> 6), 0x80 | (cp & 0x3F)))
    for i in range(k3):
        cp = 0x2000 + 64 * i + seed % 64
        out += bytes(
            (0xE0 | (cp >> 12), 0x80 | ((cp >> 6) & 0x3F), 0x80 | (cp & 0x3F))
        )
    cp = 0x10000 + (seed % 0x400) * 17
    out += bytes(
        (
            0xF0 | (cp >> 18),
            0x80 | ((cp >> 12) & 0x3F),
            0x80 | ((cp >> 6) & 0x3F),
            0x80 | (cp & 0x3F),
        )
    )
    return bytes(out)


def validate_utf8(payload: bytes) -> dict:
    """Full-rule structural walk; returns per-class codepoint counts,
    error count, and the first error's byte offset (-1 if clean)."""
    i = 0
    n = len(payload)
    n_ascii = n_2b = n_3b = n_4b = n_errors = 0
    first_error = -1

    def err(pos: int) -> int:
        nonlocal n_errors, first_error
        n_errors += 1
        if first_error < 0:
            first_error = pos
        # maximal-subpart resync: skip lead + following continuations
        j = pos + 1
        while j < n and 0x80 <= payload[j] <= 0xBF:
            j += 1
        return j

    while i < n:
        b0 = payload[i]
        if b0 < 0x80:
            n_ascii += 1
            i += 1
            continue
        if 0x80 <= b0 <= 0xBF or b0 in (0xC0, 0xC1) or b0 >= 0xF5:
            i = err(i)  # stray continuation / overlong lead / >U+10FFFF
            continue
        if b0 < 0xE0:
            need, lo, hi, nb = 1, 0x80, 0xBF, 2
        elif b0 < 0xF0:
            # E0: second byte A0-BF (overlong); ED: 80-9F (surrogates)
            need, nb = 2, 3
            lo = 0xA0 if b0 == 0xE0 else 0x80
            hi = 0x9F if b0 == 0xED else 0xBF
        else:
            # F0: second byte 90-BF (overlong); F4: 80-8F (ceiling)
            need, nb = 3, 4
            lo = 0x90 if b0 == 0xF0 else 0x80
            hi = 0x8F if b0 == 0xF4 else 0xBF
        if i + need >= n:  # truncated sequence at end of input
            i = err(i)
            continue
        b1 = payload[i + 1]
        if not (lo <= b1 <= hi):
            i = err(i)
            continue
        ok = True
        for k in range(2, need + 1):
            bk = payload[i + k]
            if not (0x80 <= bk <= 0xBF):
                ok = False
                break
        if not ok:
            i = err(i)
            continue
        if nb == 2:
            n_2b += 1
        elif nb == 3:
            n_3b += 1
        else:
            n_4b += 1
        i += need + 1
    return {
        "n_bytes": n,
        "n_codepoints": n_ascii + n_2b + n_3b + n_4b,
        "n_ascii": n_ascii,
        "n_2b": n_2b,
        "n_3b": n_3b,
        "n_4b": n_4b,
        "n_errors": n_errors,
        "first_error": first_error,
        "valid": 1 if n_errors == 0 else 0,
    }


UTF8_ORACLE_SQL = """
    WITH spec AS (
      SELECT doc_id, doc_id % 256 AS s, CAST(doc_id % 5 AS INT) AS cls,
             8 + doc_id % 256 % 9 AS a,
             2 + doc_id % 256 % 3 AS k2,
             1 + doc_id % 256 % 2 AS k3
      FROM documents)
    SELECT doc_id,
           CAST(a + CASE cls WHEN 1 THEN 1 WHEN 2 THEN 3
                             WHEN 3 THEN 2 WHEN 4 THEN 3 ELSE 0 END
                + 2 * k2 + 3 * k3 + 4 AS BIGINT) AS n_bytes,
           CAST(a + CASE WHEN cls = 2 THEN 1 ELSE 0 END + k2 + k3 + 1
                AS BIGINT) AS n_codepoints,
           CAST(a + CASE WHEN cls = 2 THEN 1 ELSE 0 END AS BIGINT) AS n_ascii,
           CAST(k2 AS BIGINT) AS n_2b,
           CAST(k3 AS BIGINT) AS n_3b,
           CAST(1 AS BIGINT) AS n_4b,
           CAST(CASE WHEN cls = 0 THEN 0 ELSE 1 END AS BIGINT) AS n_errors,
           CAST(CASE WHEN cls = 0 THEN -1 ELSE a END AS BIGINT) AS first_error,
           CAST(CASE WHEN cls = 0 THEN 1 ELSE 0 END AS INT) AS valid
    FROM spec
    """


@query("text_utf8_validate", oracle=UTF8_ORACLE_SQL)
def text_utf8_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """From-spec UTF-8 structural validation (RFC 3629 / Unicode §3.9) —
    the byte-level ingest gate every web-scrape pipeline runs before any
    text op: per blob, codepoint counts by encoded width, malformation
    count, the first error's byte offset, and the valid verdict.  The
    validator implements the FULL rule table — lead ranges (C0/C1 and
    F5+ rejected outright), per-lead second-byte windows (E0/A0-BF,
    ED/80-9F excluding surrogates, F0/90-BF, F4/80-8F capping U+10FFFF),
    continuation counts, and Unicode's maximal-subpart resync — while
    the law plants exactly one malformation class per document (lone
    continuation, truncated lead, overlong, surrogate half, or none), so
    every column has a closed-form oracle.  tests pin the validator
    against Python's strict codec on all synthesized payloads AND on the
    classic Markus Kuhn decoder-torture cases.

    Scale: shuffle-free Arrow-batched mapInPandas, one linear pass per
    blob — at 100 TB this runs as the first stage of ingest, fused with
    the scan."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _synth(s: pd.Series, cls: pd.Series) -> pd.Series:
        return pd.Series(
            [
                synthesize_utf8(int(si), int(ci))
                for si, ci in zip(s, cls)
            ]
        )

    # deliberately NOT spread: the per-row Python work here is light
    # (synth from two ints + one short validate pass), and the measured
    # A/B at sf0.1 read 0.8 s unspread vs 2.1-3.4 s spread — 32-way
    # fan-out just multiplies Python-worker spin-up for sub-batch-sized
    # partitions (guide §4.2: keep batches large enough to amortize)
    d = load_table(spark, sf_dir, "documents")
    assets = d.select(
        "doc_id",
        (F.col("doc_id") % 256).cast("int").alias("s_spec"),
        (F.col("doc_id") % UTF8_CLASSES).cast("int").alias("cls_spec"),
    ).withColumn("payload", _synth(F.col("s_spec"), F.col("cls_spec")))

    def batch(batches):
        for pdf in batches:
            feats = [validate_utf8(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out["valid"] = out["valid"].astype("int32")
            yield out

    schema = (
        "doc_id bigint, n_bytes bigint, n_codepoints bigint, n_ascii bigint,"
        " n_2b bigint, n_3b bigint, n_4b bigint, n_errors bigint,"
        " first_error bigint, valid int"
    )
    return assets.select("doc_id", "payload").mapInPandas(batch, schema=schema)


# --------------------------------------------------------------------------
# Kneser-Ney smoothed bigram LM — the classic LM every perplexity filter
# descends from (Kneser & Ney 1995; Chen & Goodman 1999's interpolated form)
# --------------------------------------------------------------------------

KN_DISCOUNT_NUM, KN_DISCOUNT_DEN = 3, 4  # D = 3/4, the standard discount
KN_TOP = 20


def _kn_oracle() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, i.i AS pos, ts[i.i] AS w
      FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ts
            FROM documents),
           LATERAL (SELECT unnest(range(1, len(ts) + 1)) AS i) i),
    bg AS (
      SELECT a.w AS w1, b.w AS w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM toks a JOIN toks b
        ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      GROUP BY 1, 2),
    ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
                   CAST(COUNT(*) AS BIGINT) AS n1p_fwd
            FROM bg GROUP BY 1),
    cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p_bwd
             FROM bg GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1p_all FROM bg),
    scored AS (
      SELECT bg.w1, bg.w2, bg.c12, ctx.c1, ctx.n1p_fwd, cont.n1p_bwd,
             t.n1p_all,
             CAST((GREATEST({KN_DISCOUNT_DEN} * bg.c12
                            - {KN_DISCOUNT_NUM}, 0) * t.n1p_all
                   + {KN_DISCOUNT_NUM} * ctx.n1p_fwd * cont.n1p_bwd)
                  * 1000000
                  // ({KN_DISCOUNT_DEN} * ctx.c1 * t.n1p_all)
                  AS BIGINT) AS kn_ppm
      FROM bg JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN tot t)
    SELECT w1, w2, c12, c1, n1p_fwd, n1p_bwd, kn_ppm
    FROM (SELECT *, ROW_NUMBER() OVER (
            ORDER BY c12 DESC, w1, w2) AS rk FROM scored) s
    WHERE rk <= {KN_TOP}
    """


@query("text_kneser_ney_bigrams", oracle=_kn_oracle())
def text_kneser_ney_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities in EXACT integers —
    the smoothing that made n-gram LMs work (Kneser & Ney 1995; the
    interpolated form of Chen & Goodman 1999) and the ancestor of every
    perplexity-based quality filter:

        p(w2|w1) = max(c12 − D, 0)/c1 + D·N1+(w1·)/c1 · N1+(·w2)/N1+(··)

    with D = {KN_DISCOUNT_NUM}/{KN_DISCOUNT_DEN}.  The continuation
    probability N1+(·w2)/N1+(··) — "how many contexts does w2 complete",
    not "how often does w2 occur" — is the insight that fixed the
    'san francisco' pathology of Katz backoff.  Over the common
    denominator 4·c1·N1+(··) the numerator
    (4c12 − 3)⁺·N1+(··) + 3·N1+(w1·)·N1+(·w2) is an exact int64, and
    kn_ppm is one truncating division (int64-safe while
    4·c1·N1+(··)·1e6 < 2^63 ≈ corpora under ~10^6 bigram types × 10^6
    context count; past that the quotient widens to DECIMAL exactly).

    The normalization Σ_w2 p(w2|w1) = 1 holds EXACTLY in this integer
    form for every context whose observed w2 set is complete —
    test-pinned by summing the un-truncated rationals over a full
    context (the property that distinguishes real KN from an ad-hoc
    discount).

    Output: the top {KN_TOP} bigrams by count (total tie-break) with
    all count components, so the hash pins the full model surface, not
    one number.

    Scale shape: bigram counts via one self-join on (doc, pos+1) — at
    100 TB this is the posexplode + shifted-join pattern keyed on doc;
    context/continuation tables are vocabulary-sized reductions of the
    bigram table; the final top-k is bounded.  No floats anywhere."""
    from pyspark.sql.window import Window

    d = load_spread(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), r"\s+")).alias(
            "pos", "w"
        ),
    )
    a = toks.alias("a")
    b = toks.alias("b")
    # the bigram table feeds FOUR consumers (ctx, cont, tot, the scoring
    # join); without a cut each re-derives the corpus self-join — measured
    # 14 exchanges / 8 scans in the composed plan.  One eager checkpoint
    # materializes the vocab²-bounded count table instead (at 100 TB this
    # materialization IS the bigram model build).
    bg = (
        a.join(
            b,
            (F.col("b.doc_id") == F.col("a.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1),
        )
        .groupBy(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=True)
    )
    ctx = bg.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1p_fwd")
    )
    cont = bg.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_bwd"))
    tot = bg.agg(F.count(F.lit(1)).alias("n1p_all"))
    dnum, dden = KN_DISCOUNT_NUM, KN_DISCOUNT_DEN
    scored = (
        bg.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "n1p_fwd",
            "n1p_bwd",
            F.expr(
                f"CAST((GREATEST({dden} * c12 - {dnum}, 0) * n1p_all"
                f" + {dnum} * n1p_fwd * n1p_bwd) * 1000000"
                f" div ({dden} * c1 * n1p_all) AS BIGINT)"
            ).alias("kn_ppm"),
        )
    )
    w = Window.orderBy(F.desc("c12"), F.asc("w1"), F.asc("w2"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= KN_TOP)
        .drop("rk")
    )
