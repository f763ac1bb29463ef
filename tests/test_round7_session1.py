"""Round-7 first-session additions: ADVICE fixes + the schema-evolution
determinism hardening.

Covers:
* textkv reader strips AT MOST ONE trailing ``\\r`` (LineRecordReader
  parity — ``rstrip("\\r\\n")`` ate unbounded runs and truncated values
  legitimately ending in CR),
* ``register_textkv`` respects an explicit user disable of
  ``spark.sql.python.filterPushdown.enabled`` instead of clobbering it,
* ``scan_schema_evolution_union`` aggregates INTEGER CENTS so no
  double→DECIMAL cast parity is exposed to the driver's DuckDB build
  (the r6 hash-fail class), and uses a fresh scratch dir.
"""

from __future__ import annotations

import os

import pytest


def test_bench_outlier_adjudication_logic():
    """bench.py self-adjudicates in-suite outliers (>1.3x the prior
    sidecar) with a fresh-process standalone re-run — exercise the
    selection logic with subprocess faked out (no JVM)."""
    import importlib.util
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(repo, "bench.py")
    )
    b = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(b)

    class FakeProc:
        stdout = json.dumps({"query": "x", "best": 1.11}) + "\n"

    orig = b.subprocess.run
    b.subprocess.run = lambda *a, **k: FakeProc
    try:
        timings = {"slow_q": 2.0, "fast_q": 0.1, "steady_q": 3.0}
        prior = {
            "sf": 0.1,
            "queries": {"slow_q": 1.0, "fast_q": 0.01, "steady_q": 2.9},
        }
        out = b.adjudicate_outliers(timings, prior, "0.1")
        # fast_q is under the 0.75s floor, steady_q under the 1.3x ratio
        assert set(out) == {"slow_q"}, out
        assert out["slow_q"] == {
            "in_suite": 2.0,
            "prior": 1.0,
            "standalone": 1.11,
        }
        # guards: different sf protocol / no prior sidecar → no re-runs
        assert b.adjudicate_outliers(timings, prior, "0.001") == {}
        assert b.adjudicate_outliers(timings, {}, "0.1") == {}
    finally:
        b.subprocess.run = orig


def test_textkv_strips_exactly_one_trailing_cr(spark, tmp_path):
    """A raw line ``k\\tv\\r\\r\\n`` must read back with value ``v\\r`` —
    exactly one CR stripped before the newline, never an unbounded
    rstrip.  (Note the reader's documented contract: records terminate
    on \\n / \\r\\n only; a BARE \\r is data — deliberately narrower than
    Hadoop's LineReader, which also splits on lone \\r, because this
    format's writer only emits \\n terminators.)"""
    from hadoopmapreduce_spark.sources.textkv_source import register_textkv

    register_textkv(spark)
    d = tmp_path / "cr_edge"
    d.mkdir()
    (d / "part-0.txt").write_bytes(
        b"a\tplain\n" b"b\tone_cr\r\n" b"c\ttwo_cr\r\r\n" b"d\tmid\rcr\n"
    )
    got = {
        r["key"]: r["value"]
        for r in spark.read.format("textkv").load(str(d)).collect()
    }
    assert got == {
        "a": "plain",
        "b": "one_cr",  # \r\n terminator: CR belongs to the terminator
        "c": "two_cr\r",  # only ONE \r stripped; the inner one is data
        "d": "mid\rcr",  # embedded CR untouched
    }


def test_register_textkv_respects_explicit_pushdown_disable(spark):
    key = "spark.sql.python.filterPushdown.enabled"
    from hadoopmapreduce_spark.sources.textkv_source import register_textkv

    before = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "false")
        register_textkv(spark)
        assert spark.conf.get(key) == "false", "explicit disable clobbered"
        spark.conf.unset(key)
        register_textkv(spark)
        assert spark.conf.get(key) == "true", "unset not defaulted to enabled"
    finally:
        if before is None:
            spark.conf.set(key, "true")  # restore the session default path
        else:
            spark.conf.set(key, before)


def test_schema_evolution_revenue_is_integer_cents(spark, sf_dir, oracle_con):
    """The r6 driver red: hash mismatch on a double→DECIMAL(18,2) cast sum.
    The query now aggregates ROUND(o_totalprice*100) AS BIGINT on both
    engines — assert the schema carries no decimal/double column and the
    oracle matches exactly."""
    from hadoopmapreduce_spark import registry
    from hadoopmapreduce_spark.oracle import compare

    registry.load_all()
    name = "scan_schema_evolution_union"
    df = registry.QUERIES[name](spark, sf_dir)
    types = dict(df.dtypes)
    assert types["revenue_cents"] == "bigint"
    assert types["n_orders"] == "bigint"
    rep = compare(name, df, oracle_con, registry.ORACLES[name])
    assert rep.ok, rep.detail


def test_schema_evolution_scratch_is_fresh(spark, sf_dir):
    """fresh=True must actually CLEAR pre-existing scratch state when the
    query runs (the r6-red staleness hypothesis).  The query reads only
    its two explicit snapshot paths — both rewritten with overwrite — so
    the observable fresh=True guarantee is that ANY stale content in the
    scratch root (partial writes, old snapshot layouts) is gone after a
    run, and the result is unchanged by whatever was there before."""
    from hadoopmapreduce_spark import registry
    from hadoopmapreduce_spark.catalog import work_dir

    registry.load_all()
    name = "scan_schema_evolution_union"
    baseline = {
        r["priority"]: (r["n_orders"], r["revenue_cents"])
        for r in registry.QUERIES[name](spark, sf_dir).collect()
    }
    # plant rogue content in the scratch root (NOT fresh, simulating the
    # leftovers of an older run with a different snapshot layout)
    tmp = work_dir("schema_evo", sf_dir)
    rogue_dir = os.path.join(tmp, "snap=3")
    os.makedirs(rogue_dir, exist_ok=True)
    rogue_file = os.path.join(tmp, "stale-partial.tmp")
    open(rogue_file, "w").write("stale")
    again = {
        r["priority"]: (r["n_orders"], r["revenue_cents"])
        for r in registry.QUERIES[name](spark, sf_dir).collect()
    }
    # fresh=True cleared the planted state before the run…
    assert not os.path.exists(rogue_dir)
    assert not os.path.exists(rogue_file)
    # …and the result is byte-identical to the unpolluted baseline
    assert again == baseline


def test_work_dir_fresh_clears_existing_content(sf_dir):
    """work_dir(..., fresh=True) removes everything a prior run left."""
    from hadoopmapreduce_spark.catalog import work_dir

    path = work_dir("fresh_probe", sf_dir)
    leftover = os.path.join(path, "leftover.txt")
    open(leftover, "w").write("x")
    again = work_dir("fresh_probe", sf_dir, fresh=True)
    assert again == path
    assert os.path.isdir(path) and not os.path.exists(leftover)
