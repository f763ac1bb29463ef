"""Property-based tests (hypothesis): the deterministic-numeric layer and
the sequential-fold operators hold their contracts on adversarial inputs,
not just the fixtures.

Each example batches many generated cases into ONE Spark job (a local[8]
round trip costs ~0.5 s, so per-case jobs would be prohibitive)."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from hadoopmapreduce_spark.functions.numeric import davg, dsum, lavg, lsum
from hadoopmapreduce_spark.operators.windows import (
    EWMA_ALPHA,
    FUNNEL_STEPS,
    ewma_fold,
    funnel_fold,
)

# doubles that survive a decimal(18,4) cast: bounded magnitude, no NaN/inf
_vals = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.lists(_vals, min_size=1, max_size=40), min_size=1, max_size=12))
def test_lsum_equals_dsum_within_bound(spark, batches):
    """The long-scaled fast path must be bit-identical to the decimal path
    for any input within its documented bound — on the same partitioning."""
    rows = [(i, v) for i, vs in enumerate(batches) for v in vs]
    df = spark.createDataFrame(rows, "grp int, x double")
    out = (
        df.groupBy("grp")
        .agg(
            # strategy worst case: 40 values of |x| <= 1e6 per group → 4e7,
            # far inside lsum's 9.0e11 exactness window at scale 4
            dsum("x", 4).alias("d"),
            lsum("x", 4, max_group_sum=4e7).alias("l"),
            davg("x", 6).alias("da"),
            lavg("x", 6, max_group_sum=4e7).alias("la"),
        )
        .collect()
    )
    for r in out:
        assert r["d"] == r["l"], f"grp {r['grp']}: {r['d']!r} != {r['l']!r}"
        # within the bound the scaled sums are identical doubles, so the
        # averages (sum / same count) must be too — keeps lavg's contract
        # exercised now that production call sites use davg
        assert r["da"] == r["la"], f"grp {r['grp']}: {r['da']!r} != {r['la']!r}"


@settings(max_examples=5, deadline=None)
@given(st.lists(st.lists(_vals, min_size=1, max_size=30), min_size=1, max_size=12))
def test_ewma_fold_matches_python_model(spark, batches):
    df = spark.createDataFrame(
        [(i, vs) for i, vs in enumerate(batches)], "i int, vals array<double>"
    )
    out = {r["i"]: r["e"] for r in df.select("i", ewma_fold(F.col("vals")).alias("e")).collect()}
    for i, vs in enumerate(batches):
        expect = vs[0]
        for v in vs[1:]:
            expect = expect * (1 - EWMA_ALPHA) + v * EWMA_ALPHA
        assert out[i] == expect and math.isfinite(out[i])


_evt = st.sampled_from(list(FUNNEL_STEPS) + ["signup", "error"])


@settings(max_examples=5, deadline=None)
@given(st.lists(st.lists(_evt, min_size=0, max_size=25), min_size=1, max_size=15))
def test_funnel_fold_matches_python_model(spark, batches):
    df = spark.createDataFrame(
        [(i, ts) for i, ts in enumerate(batches)], "i int, types array<string>"
    )
    out = {
        r["i"]: int(r["s"])
        for r in df.select("i", funnel_fold(F.col("types")).alias("s")).collect()
    }
    for i, ts in enumerate(batches):
        stage = 0
        for t in ts:
            if stage < 3 and t == FUNNEL_STEPS[stage]:
                stage += 1
        assert out[i] == stage


@settings(max_examples=5, deadline=None)
@given(st.lists(st.lists(_evt, min_size=0, max_size=25), min_size=1, max_size=15))
def test_funnel_fold_monotone_under_extension(spark, batches):
    """Appending events can only advance the funnel, never regress it."""
    df = spark.createDataFrame(
        [(i, ts, ts + ["purchase", "view", "click"]) for i, ts in enumerate(batches)],
        "i int, a array<string>, b array<string>",
    )
    rows = df.select(
        funnel_fold(F.col("a")).alias("sa"), funnel_fold(F.col("b")).alias("sb")
    ).collect()
    for r in rows:
        assert int(r["sb"]) >= int(r["sa"])


@settings(max_examples=5, deadline=None)
@given(
    st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=1,
        max_size=20,
    )
)
def test_triangle_count_matches_bruteforce(spark, pairs):
    """Degree-oriented adjacency-intersection census == the O(n^3) python
    count on arbitrary small graphs (clique-ish, sparse, disconnected)."""
    from itertools import combinations

    from hadoopmapreduce_spark.operators.graph import triangle_count

    edges = {(min(u, v), max(u, v)) for u, v in pairs}
    nodes = sorted({n for e in edges for n in e})
    expect = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if (a, b) in edges and (a, c) in edges and (b, c) in edges
    )
    df = spark.createDataFrame(sorted(edges), "u long, v long")
    row = triangle_count(df).collect()[0]
    assert row.n_triangles == expect, (sorted(edges), row.n_triangles, expect)
    assert row.n_edges == len(edges) and row.n_nodes == len(nodes)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
                min_size=1, max_size=50))
def test_morton_key_bijective_and_monotone_in_blocks(spark, points):
    """One Spark job per example: the codegen Morton key must equal the
    python interleave for arbitrary 16-bit inputs (bijectivity follows)."""
    from hadoopmapreduce_spark.operators.layout import _z_spark

    def py_z(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(points, "x long, y long").withColumn(
        "z", F.expr(_z_spark("x", "y"))
    )
    for r in df.collect():
        assert r.z == py_z(r.x, r.y)
