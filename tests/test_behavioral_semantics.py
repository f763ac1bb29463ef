"""Semantic unit tests on literal data for the fold-based operators —
behaviors the fixture parity can't isolate (ordering sensitivity, strict
subsequence matching, empty/singleton groups)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _events(spark, rows):
    """rows: (event_id, user_id, minutes_offset, event_type, value).

    ``ts`` is written as long NANOSECONDS — the physical layout of the
    events fixture (TIMESTAMP(NANOS) surfaces as long under the
    ``nanosAsLong`` conf that ``catalog.load_table`` sets)."""
    base_ns = int(dt.datetime(2000, 1, 3, tzinfo=dt.timezone.utc).timestamp()) * 10**9
    data = [
        (eid, base_ns + m * 60 * 10**9, uid, et, float(v), "{}")
        for (eid, uid, m, et, v) in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )


def test_funnel_requires_order(spark, tmp_path):
    """purchase BEFORE view must not advance the funnel; the strict
    subsequence view→click→purchase only counts in-order progress."""
    import hadoopmapreduce_spark.operators.windows as W

    df = _events(
        spark,
        [
            # user 1: perfect funnel in order
            (1, 1, 0, "view", 1),
            (2, 1, 5, "click", 1),
            (3, 1, 9, "purchase", 1),
            # user 2: purchase first, then view — stage stops at 1
            (4, 2, 0, "purchase", 1),
            (5, 2, 5, "view", 1),
            # user 3: view then purchase, no click — stage stops at 1
            (6, 3, 0, "view", 1),
            (7, 3, 5, "purchase", 1),
            # user 4: noise only
            (8, 4, 0, "error", 1),
        ],
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {
        r["user_id"]: r["funnel_stage"]
        for r in W.funnel_steps_per_user(spark, str(tmp_path)).collect()
    }
    assert out == {1: 3, 2: 1, 3: 1, 4: 0}


def test_funnel_ties_break_on_event_id(spark, tmp_path):
    """Same-timestamp events order by event_id — a click and a view at the
    identical instant resolve deterministically (view has lower id here,
    so the funnel advances through both)."""
    import hadoopmapreduce_spark.operators.windows as W

    df = _events(spark, [(1, 1, 0, "view", 1), (2, 1, 0, "click", 1)])
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = W.funnel_steps_per_user(spark, str(tmp_path)).collect()
    assert out[0]["funnel_stage"] == 2


def test_ewma_recursion_matches_manual(spark, tmp_path):
    """EWMA seeded with the first value, then acc*(1-a)+x*a per event —
    verified against a hand-rolled Python fold on the same ordering."""
    import hadoopmapreduce_spark.operators.windows as W

    vals = [10.0, 20.0, 5.0, 40.0]
    df = _events(
        spark, [(i, 1, i, "view", v) for i, v in enumerate(vals)]
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    row = W.ewma_user_value(spark, str(tmp_path)).collect()[0]
    expect = vals[0]
    for v in vals[1:]:
        expect = expect * (1 - W.EWMA_ALPHA) + v * W.EWMA_ALPHA
    assert row["ewma_value"] == expect
    assert row["n_events"] == len(vals)


def test_ewma_singleton_group_is_seed(spark, tmp_path):
    import hadoopmapreduce_spark.operators.windows as W

    df = _events(spark, [(1, 7, 0, "view", 42.5)])
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    row = W.ewma_user_value(spark, str(tmp_path)).collect()[0]
    assert row["ewma_value"] == 42.5 and row["n_events"] == 1


def test_median_odd_and_even_groups(spark, tmp_path):
    """Odd group → middle element; even group → mean of the middle two."""
    import hadoopmapreduce_spark.operators.aggregates as A

    rows = [
        # segment ODD: 3 rows, balances 1, 2, 9 → median 2
        (1, "c1", 0, 1.0, "ODD"),
        (2, "c2", 0, 2.0, "ODD"),
        (3, "c3", 0, 9.0, "ODD"),
        # segment EVEN: 4 rows, 1, 2, 3, 10 → median 2.5
        (4, "c4", 0, 1.0, "EVEN"),
        (5, "c5", 0, 2.0, "EVEN"),
        (6, "c6", 0, 3.0, "EVEN"),
        (7, "c7", 0, 10.0, "EVEN"),
    ]
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    out = {
        r["segment"]: (r["median_acctbal"], r["n_rows"])
        for r in A.agg_median_exact(spark, str(tmp_path)).collect()
    }
    assert out == {"ODD": (2.0, 3), "EVEN": (2.5, 4)}


def test_contamination_flags_copied_docs(spark, tmp_path):
    """A training doc sharing a full 5-gram with a benchmark doc gets a
    nonzero contamination fraction; an unrelated doc gets zero; docs
    shorter than the gram size drop out."""
    import hadoopmapreduce_spark.operators.textops as T

    bench_text = "alpha beta gamma delta epsilon zeta"
    dirty = "intro words then alpha beta gamma delta epsilon closing"
    clean = "one two three four five six seven eight nine ten"
    short = "too short"
    rows = [
        (T.CONTAM_MOD, bench_text),  # doc_id % CONTAM_MOD == 0 → benchmark
        (1, dirty),
        (2, clean),
        (3, short),
    ]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        r["doc_id"]: r["n_contaminated"]
        for r in T.contamination_check(spark, str(tmp_path)).collect()
    }
    assert out[1] == 1  # the shared "alpha..epsilon" 5-gram
    assert out[2] == 0
    assert 3 not in out  # below gram size → no grams, no row


def test_hll_union_estimate_within_bound(spark, sf_dir):
    """Merged-sketch estimates must track the exact distinct count (HLL
    lgK=12 standard error ≈ 1.6%; assert a lax 5% to avoid flakiness)."""
    import hadoopmapreduce_spark.operators.aggregates as A
    from hadoopmapreduce_spark.catalog import load_table
    from pyspark.sql import functions as F

    est = {
        r["returnflag"]: r["approx_orders"]
        for r in A.agg_hll_sketch_union(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(0.05 * n, 3), (k, est[k], n)


def test_cms_estimates_bound_exact_counts(spark, sf_dir):
    """Count-Min guarantees: est >= exact always; overestimate bounded by
    eps*N (eps = e/W) with overwhelming probability at d=4."""
    import math

    from hadoopmapreduce_spark.operators.aggregates import (
        agg_cms_heavy_hitters,
    )
    from hadoopmapreduce_spark.catalog import load_table

    rows = agg_cms_heavy_hitters(spark, sf_dir).collect()
    assert rows, "no heavy hitters returned"
    n_total = load_table(spark, sf_dir, "events").count()
    eps = math.e / 1024
    for r in rows:
        assert r.est_n >= r.exact_n, (r.user_id, r.est_n, r.exact_n)
        assert r.est_n <= r.exact_n + eps * n_total, (r.user_id, r.est_n)


def test_bloom_false_positive_rate_within_theory(spark, sf_dir):
    """The explicit bloom's false-positive rate must sit near the k=1
    theoretical bound (fill ratio = 1-exp(-n/m) ~= n/m for small fill):
    probing keys KNOWN to be absent should pass at roughly n_set/m, far
    below 5x the bound — a broken hash or mask math shows up as a
    dramatically higher rate."""
    from pyspark.sql import functions as F

    from hadoopmapreduce_spark.catalog import load_table
    from hadoopmapreduce_spark.operators.joins import BLOOM_BITS

    dim = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") == 10)
        .select("p_partkey")
    )
    n_set = dim.count()
    slots = dim.select(
        F.pmod(F.xxhash64("p_partkey"), F.lit(BLOOM_BITS)).alias("s")
    ).distinct()
    # absent keys: shift the keyspace far past any real partkey
    absent = dim.select((F.col("p_partkey") + 10_000_000).alias("k"))
    hits = (
        absent.select(F.pmod(F.xxhash64("k"), F.lit(BLOOM_BITS)).alias("s"))
        .join(slots, "s")
        .count()
    )
    fpr = hits / max(1, n_set)
    bound = n_set / BLOOM_BITS  # k=1 fill ratio
    assert fpr <= 5 * bound + 0.05, (fpr, bound, n_set)


def test_multiprobe_bloom_fp_rate_within_theory(spark, sf_dir):
    """k=3 bloom: probing absent keys must pass all three probes at roughly
    the theoretical (1 - e^(-kn/m))^k — far below the k=1 fill ratio, which
    is the whole point of multi-probe.  A mask/word math bug (e.g. probes
    accidentally correlated) shows up as a rate near the k=1 bound."""
    import math

    from pyspark.sql import functions as F

    from hadoopmapreduce_spark.catalog import load_table
    from hadoopmapreduce_spark.operators.joins import BLOOM_BITS, BLOOM_K

    dim = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select("s_suppkey")
    )
    n_set = dim.count()
    slots = dim.select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64("s_suppkey", F.lit(i)), F.lit(BLOOM_BITS)
                    )
                    for i in range(BLOOM_K)
                ]
            )
        ).alias("s")
    ).distinct()
    slot_set = {r["s"] for r in slots.collect()}  # ≤ 3·n_set ints — tiny
    # absent keys: far past any real suppkey; widen the probe pool so the
    # measured rate has resolution even when n_set is small
    absent = spark.range(20_000).select((F.col("id") + 50_000_000).alias("k"))
    probe = absent.select(
        "k",
        *[
            F.pmod(F.xxhash64("k", F.lit(i)), F.lit(BLOOM_BITS)).alias(f"s{i}")
            for i in range(BLOOM_K)
        ],
    ).collect()
    fp = sum(
        1
        for r in probe
        if all(r[f"s{i}"] in slot_set for i in range(BLOOM_K))
    )
    fpr = fp / len(probe)
    fill = 1.0 - math.exp(-BLOOM_K * n_set / BLOOM_BITS)
    theory = fill**BLOOM_K
    assert fpr <= 5 * theory + 0.01, (fpr, theory, n_set)
    # and it must beat the k=1 bound when the filter is meaningfully loaded
    if n_set >= 32:
        assert fpr < n_set / BLOOM_BITS, (fpr, n_set / BLOOM_BITS)


def test_weighted_quantile_literal_semantics(spark, monkeypatch):
    """Pin the lower-weighted-quantile rule on hand-computable data:
    prices 10/20/30 with weights 1/1/2 → W=4; q=.25 → cum(10)=1 ≥ 1;
    q=.5 → cum(20)=2 ≥ 2; q=.75 → cum(30)=4 ≥ 3."""
    from pyspark.sql import functions as F

    import hadoopmapreduce_spark.operators.aggregates as ag

    li = spark.createDataFrame(
        [("A", 10.0, 1.0), ("A", 20.0, 1.0), ("A", 30.0, 2.0)],
        "l_returnflag string, l_extendedprice double, l_quantity double",
    )
    monkeypatch.setattr(
        "hadoopmapreduce_spark.operators.aggregates.load_table",
        lambda spark_, sf_dir, name: li,
    )
    rows = {
        r["q"]: r["wquantile"]
        for r in ag.agg_weighted_quantile_exact(spark, "x").collect()
    }
    assert rows == {0.25: 10.0, 0.5: 20.0, 0.75: 30.0}


def test_interval_overlap_matches_naive_join(spark, monkeypatch):
    """Differential check on synthetic intervals: the bucketed+canonical
    algorithm must count exactly the pairs the naive theta-join counts —
    including intervals spanning many promo weeks (the canonical-bucket
    dedup's hard case) and zero-length intervals."""
    from pyspark.sql import functions as F

    import hadoopmapreduce_spark.operators.joins as jn

    # deterministic spread: ship dates across 1993-1994, lengths 0..27
    rows = [
        (i, f"1993-{1 + (i * 7) % 12:02d}-{1 + (i * 3) % 28:02d}", float((i * 11) % 28))
        for i in range(300)
    ]
    li = spark.createDataFrame(
        rows, "l_orderkey long, d string, l_quantity double"
    ).select(F.col("d").cast("date").alias("l_shipdate"), "l_quantity")
    monkeypatch.setattr(
        "hadoopmapreduce_spark.operators.joins.load_table",
        lambda spark_, sf_dir, name: li,
    )
    bucketed = {
        (r["week_start"], r["n_overlapping"])
        for r in jn.join_interval_overlap(spark, "x").collect()
    }
    # naive: cross join + overlap predicate, counted per week
    anchor = F.lit(jn.IVL_ANCHOR).cast("date")
    iv = li.select(
        F.col("l_shipdate").alias("s"),
        F.date_add("l_shipdate", F.pmod(F.col("l_quantity").cast("int"), F.lit(28))).alias("e"),
    )
    weeks = (
        spark.range(jn.IVL_WEEKS)
        .filter(F.col("id") % 4 == 0)
        .select(
            F.date_add(anchor, (F.col("id") * 7).cast("int")).alias("ws"),
            F.date_add(anchor, (F.col("id") * 7 + 6).cast("int")).alias("we"),
        )
    )
    naive = {
        (r["ws"], r["n"])
        for r in iv.crossJoin(weeks)
        .filter((F.col("s") <= F.col("we")) & (F.col("ws") <= F.col("e")))
        .groupBy("ws")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert bucketed == naive
