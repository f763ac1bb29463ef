"""The local correctness gate: every registered query with an oracle must
hash-match its DuckDB twin at sf0.001 (the driver repeats this at sf0.01).

Queries without an oracle still get a smoke run (non-empty schema, executes).
"""

from __future__ import annotations

import pytest

from hadoopmapreduce_spark import registry

registry.load_all()

WITH_ORACLE = sorted(n for n in registry.QUERIES if n in registry.ORACLES)
ROWS_ONLY = sorted(n for n in registry.QUERIES if n not in registry.ORACLES)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(name, spark, sf_dir, oracle_con):
    from hadoopmapreduce_spark.oracle import compare

    df = registry.QUERIES[name](spark, sf_dir)
    report = compare(name, df, oracle_con, registry.ORACLES[name])
    # exact equality required: the driver's gate is an exact value hash, so
    # close-but-not-exact locally would NOT predict driver green
    assert report.ok and report.exact_values, f"{name}: {report.detail or 'values close but not bit-exact'}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_smoke(name, spark, sf_dir):
    df = registry.QUERIES[name](spark, sf_dir)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_hugeint_guard_catches_uncast_sum(oracle_con):
    """A deliberately uncast integer SUM (DuckDB → HUGEINT) must fail fast.

    pandas flattens int128, so compare() alone can't see the difference —
    but the driver's value hash can; this class caused every hash mismatch
    in rounds 1 and 3."""
    from hadoopmapreduce_spark.oracle import assert_no_hugeint

    with pytest.raises(AssertionError, match="HUGEINT"):
        assert_no_hugeint(
            oracle_con, "SELECT SUM(o_orderkey) AS s FROM orders", "probe"
        )
    # the cast form passes
    assert_no_hugeint(
        oracle_con, "SELECT CAST(SUM(o_orderkey) AS BIGINT) AS s FROM orders", "probe"
    )


def test_q22_non_vacuous(spark, sf_dir):
    """q22 must produce rows at every local SF — a hash match on an empty
    result proves nothing (round-2 finding)."""
    df = registry.QUERIES["q22_sales_opportunity"](spark, sf_dir)
    assert df.count() > 0


def test_never_adjudicated_queries_sit_in_driver_window():
    """The driver adjudicates the FIRST 50 of queries() per round; any
    registered query with no verdict in any committed CORRECTNESS_r*.json
    must therefore be inside that window, or it can never get a verdict.
    Fails when someone registers a query without fronting it."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    adjudicated: set[str] = set()
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        adjudicated.update(json.load(open(path)).keys())
    window = list(registry.ordered_queries())[:50]
    missing = [
        q
        for q in registry.QUERIES
        if q not in adjudicated
        and q not in window
        and q not in registry.ADJUDICATION_DEFERRED
    ]
    assert not missing, (
        f"never-adjudicated queries outside the 50-query driver window: "
        f"{missing} — add them to ADJUDICATION_PRIORITY (or, if the window "
        f"is full, document them in ADJUDICATION_DEFERRED)"
    )
    stale = [
        q for q in registry.ADJUDICATION_DEFERRED if q in adjudicated
    ]
    assert not stale, f"deferred queries already adjudicated: {stale}"
