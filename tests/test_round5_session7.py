"""Behavioral invariants for the seventh round-5 session's operators —
the classifier/dataset-eval family (evals.py).  Properties the
differential oracle cannot express: the Mann-Whitney pairwise identity,
gains-table conservation, probe-panel membership."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_auc_matches_pairwise_definition(spark, sf_dir):
    """The rank-identity AUC must equal the textbook pairwise count:
    2U = 2*#{(p,n): s_p > s_n} + #{(p,n): s_p = s_n}.  Quadratic cross
    join — the differential referee, run only at sf0.001 corpus size."""
    from hadoopmapreduce_spark.operators.evals import (
        _scored_docs,
        eval_auc_rank,
    )

    row = eval_auc_rank(spark, sf_dir).collect()[0]
    scored = _scored_docs(spark, sf_dir)
    pos = scored.filter("pos = 1").select(F.col("score_ppm").alias("sp"))
    neg = scored.filter("pos = 0").select(F.col("score_ppm").alias("sn"))
    pair = pos.crossJoin(neg).agg(
        F.sum(F.when(F.col("sp") > F.col("sn"), 2)
              .when(F.col("sp") == F.col("sn"), 1)
              .otherwise(0)).alias("u2"),
        F.count(F.lit(1)).alias("n_pairs"),
    ).collect()[0]
    assert row["n_pos"] * row["n_neg"] == pair["n_pairs"]
    assert row["u2"] == pair["u2"], (
        f"rank-identity 2U={row['u2']} != pairwise 2U={pair['u2']}"
    )
    assert 0 <= row["auc_ppm"] <= 1_000_000


def test_gains_table_conserves_and_accumulates(spark, sf_dir):
    """Decile positives must sum to the corpus total, docs split evenly
    (NTILE: sizes differ by at most 1), capture is nondecreasing and ends
    at exactly 1e6 ppm."""
    from hadoopmapreduce_spark.operators.evals import (
        _scored_docs,
        eval_gains_deciles,
    )

    rows = sorted(
        eval_gains_deciles(spark, sf_dir).collect(), key=lambda r: r["bin"]
    )
    assert [r["bin"] for r in rows] == list(range(1, 11))
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    totals = _scored_docs(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").alias("p")
    ).collect()[0]
    assert sum(sizes) == totals["n"]
    assert sum(r["n_pos"] for r in rows) == totals["p"]
    caps = [r["cum_capture_ppm"] for r in rows]
    assert caps == sorted(caps)
    assert caps[-1] == 1_000_000


def test_knn_noise_audit_covers_exactly_the_probe_panel(spark, sf_dir):
    """One verdict per panel member (vec_id % PROBE_MOD == 1, capped to
    the fixed audit budget), vote counts within [1, k], and the suspect
    flag consistent with the label pair."""
    from hadoopmapreduce_spark.catalog import load_table
    from hadoopmapreduce_spark.operators.evals import (
        NOISE_K,
        PANEL_MAX,
        PROBE_CAP,
        PROBE_MOD,
        eval_knn_label_noise,
    )

    out = eval_knn_label_noise(spark, sf_dir).collect()
    panel = {
        r["vec_id"]
        for r in load_table(spark, sf_dir, "embeddings")
        .filter(
            (F.col("vec_id") % PROBE_MOD == 1) & (F.col("vec_id") < PROBE_CAP)
        )
        .select("vec_id")
        .collect()
    }
    assert len(panel) <= PANEL_MAX
    assert {r["probe_id"] for r in out} == panel
    assert len(out) == len(panel)
    for r in out:
        assert 1 <= r["n_votes"] <= NOISE_K
        assert r["is_suspect"] == int(r["knn_label"] != r["own_label"])


def test_ndcg_bounds_and_noise_consistency(spark, sf_dir):
    """Per-probe: dcg <= idcg, ndcg in [0, 1e6] (NULL only when n_rel = 0),
    and cross-operator consistency with the label-noise audit — when the
    majority neighbor label IS the own label, the vote count equals the
    relevant-neighbor count, since both count own-label rows in the same
    shared top-k."""
    from hadoopmapreduce_spark.operators.evals import (
        eval_knn_label_noise,
        eval_ndcg_label_match,
    )

    ndcg = {r["probe_id"]: r for r in eval_ndcg_label_match(spark, sf_dir).collect()}
    noise = {r["probe_id"]: r for r in eval_knn_label_noise(spark, sf_dir).collect()}
    assert set(ndcg) == set(noise)
    for pid, r in ndcg.items():
        assert r["dcg_ppm"] <= r["idcg_ppm"]
        if r["n_rel"] == 0:
            assert r["ndcg_ppm"] is None and r["dcg_ppm"] == 0
        else:
            assert 0 <= r["ndcg_ppm"] <= 1_000_000
        v = noise[pid]
        if v["is_suspect"] == 0:
            assert v["n_votes"] == r["n_rel"], (
                f"probe {pid}: majority own-label votes {v['n_votes']} != "
                f"relevant count {r['n_rel']}"
            )


def test_calibration_bins_partition_the_corpus(spark, sf_dir):
    """Bins cover the corpus exactly once, each bin's mean score sits
    inside the bin's score range, and the gap is the advertised identity."""
    from hadoopmapreduce_spark.operators.evals import (
        CALIB_BINS,
        _scored_docs,
        eval_calibration_bins,
    )

    rows = eval_calibration_bins(spark, sf_dir).collect()
    n_corpus = _scored_docs(spark, sf_dir).count()
    assert sum(r["n_docs"] for r in rows) == n_corpus
    width = 1_000_000 // CALIB_BINS
    for r in rows:
        lo = (r["bin"] - 1) * width
        hi = 1_000_000 if r["bin"] == CALIB_BINS else r["bin"] * width - 1
        assert lo <= r["mean_score_ppm"] <= hi
        assert r["gap_ppm"] == abs(r["mean_score_ppm"] - r["pos_rate_ppm"])


def test_clustering_coefficient_invariants(spark, sf_dir):
    """Every reported node: degree >= 2, 0 <= tri_n <= C(d,2), cc_ppm is
    the exact integer formula, cc <= 1e6, and the 20 rows arrive in the
    declared total order."""
    from hadoopmapreduce_spark.operators.graph import (
        graph_clustering_coefficient,
    )

    rows = graph_clustering_coefficient(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        d = r["degree"]
        assert d >= 2
        assert 0 <= r["tri_n"] <= d * (d - 1) // 2
        assert r["cc_ppm"] == (2_000_000 * r["tri_n"]) // (d * (d - 1))
        assert r["cc_ppm"] <= 1_000_000
    keys = [(-r["cc_ppm"], -r["tri_n"], r["node"]) for r in rows]
    assert keys == sorted(keys)


def test_xml_roundtrip_writes_real_xml(spark, sf_dir):
    """The sink must be genuine row-tagged XML on disk (not a renamed
    columnar file) and preserve the exact row count."""
    import glob
    import os

    from hadoopmapreduce_spark.catalog import load_table, work_dir
    from hadoopmapreduce_spark.operators.layout import scan_xml_roundtrip

    agg = scan_xml_roundtrip(spark, sf_dir).collect()
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r["n_orders"] for r in agg) == n_orders
    parts = glob.glob(
        os.path.join(work_dir("xml", sf_dir), "orders_xml", "part-*")
    )
    assert parts, "no XML part files written"
    with open(parts[0]) as f:
        head = f.read(4096)
    assert "<order>" in head and "<o_orderkey>" in head


def test_snapshot_expire_prunes_filesystem_and_keeps_latest(spark, sf_dir):
    """After the op: exactly SNAP_RETAIN version dirs remain, they are the
    HIGHEST-numbered ones, and the reported state equals an independent
    aggregate of the full purchase stream (expiry never touched live
    data)."""
    import os

    from pyspark.sql import functions as F

    from hadoopmapreduce_spark.catalog import load_table, work_dir
    from hadoopmapreduce_spark.operators.layout import (
        SNAP_RETAIN,
        SNAP_VERSIONS,
        maintenance_snapshot_expire,
    )

    row = maintenance_snapshot_expire(spark, sf_dir).collect()[0]
    base = work_dir("snap_expire", sf_dir)
    kept = sorted(
        int(d.split("_v")[1])
        for d in os.listdir(base)
        if d.startswith("snap_v")
    )
    assert len(kept) == SNAP_RETAIN
    assert kept == list(range(SNAP_VERSIONS - SNAP_RETAIN + 1, SNAP_VERSIONS + 1))
    direct = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(
            F.countDistinct("user_id").alias("u"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    assert row["n_users"] == direct["u"]
    assert row["n_purchases"] == direct["n"]
    assert row["versions_written"] == SNAP_VERSIONS
    assert row["versions_retained"] == SNAP_RETAIN


def test_mixture_rebalance_conserves_budget_and_never_upsamples(spark, sf_dir):
    """sum(quota) == total_tokens div 2 exactly; no language's quota
    exceeds its supply (factor <= 1e6); full languages keep everything;
    capped languages land within one token of a common waterline."""
    from hadoopmapreduce_spark.operators.textops import (
        pipeline_mixture_cap_rebalance,
    )

    rows = pipeline_mixture_cap_rebalance(spark, sf_dir).collect()
    total = sum(r["tokens"] for r in rows)
    assert sum(r["quota_tokens"] for r in rows) == total // 2
    capped_quotas = []
    for r in rows:
        assert 0 <= r["quota_tokens"] <= r["tokens"]
        assert r["factor_ppm"] <= 1_000_000
        if r["is_capped"] == 0:
            assert r["quota_tokens"] == r["tokens"]
            assert r["factor_ppm"] == 1_000_000 or r["tokens"] == 0
        else:
            capped_quotas.append(r["quota_tokens"])
    if capped_quotas:
        assert max(capped_quotas) - min(capped_quotas) <= 1
        # the waterline sits above every full language's supply
        full_max = max(
            (r["tokens"] for r in rows if r["is_capped"] == 0), default=0
        )
        assert min(capped_quotas) >= full_max


def test_pr_sweep_monotone_and_consistent_with_auc_population(spark, sf_dir):
    """As the threshold rises, predicted-positives (tp+fp) shrink and tp
    is non-increasing; recall is non-increasing; tp+fn is the constant
    positive count and matches eval_auc_rank's n_pos; F1 obeys the
    integer identity."""
    from hadoopmapreduce_spark.operators.evals import (
        eval_auc_rank,
        eval_pr_threshold_sweep,
    )

    rows = sorted(
        eval_pr_threshold_sweep(spark, sf_dir).collect(),
        key=lambda r: r["threshold_ppm"],
    )
    n_pos = eval_auc_rank(spark, sf_dir).collect()[0]["n_pos"]
    assert len(rows) == 9
    prev_pred, prev_tp = None, None
    for r in rows:
        assert r["n_tp"] + r["n_fn"] == n_pos
        pred = r["n_tp"] + r["n_fp"]
        if prev_pred is not None:
            assert pred <= prev_pred and r["n_tp"] <= prev_tp
        prev_pred, prev_tp = pred, r["n_tp"]
        denom = 2 * r["n_tp"] + r["n_fp"] + r["n_fn"]
        if denom:
            assert r["f1_ppm"] == (2_000_000 * r["n_tp"]) // denom


def test_time_decay_attribution_conserves_and_matches_linear_structure(spark, sf_dir):
    """Every purchase emits exactly 1e6 micro-credits (total = purchases
    x 1e6); the credit STRUCTURE (which touches, how many, who gets
    'none') is identical to the linear variant — only the split differs."""
    from pyspark.sql import functions as F

    from hadoopmapreduce_spark.catalog import load_table
    from hadoopmapreduce_spark.operators.windows import (
        event_attribution_linear,
        event_attribution_time_decay,
    )

    decay = {r["touch_type"]: r for r in event_attribution_time_decay(spark, sf_dir).collect()}
    linear = {r["touch_type"]: r for r in event_attribution_linear(spark, sf_dir).collect()}
    n_purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert sum(r["micro_credit"] for r in decay.values()) == n_purchases * 1_000_000
    assert set(decay) == set(linear)
    for k in decay:
        assert decay[k]["n_credits"] == linear[k]["n_credits"]
    if "none" in decay:
        assert decay["none"]["micro_credit"] == linear["none"]["micro_credit"]


def test_rolling_trend_window_bounds_and_point_recompute(spark, sf_dir):
    """Window support stays within [7, 28]; one (type, day) point is
    re-derived from the daily series by a sequential integer recompute —
    the differential referee for the windowed moments."""
    from pyspark.sql import functions as F

    from hadoopmapreduce_spark.catalog import load_table
    from hadoopmapreduce_spark.operators.timeseries import ts_rolling_trend_28d

    rows = ts_rolling_trend_28d(spark, sf_dir).collect()
    assert rows
    assert all(7 <= r["n_days"] <= 28 for r in rows)
    pick = max(rows, key=lambda r: (r["event_type"], r["day"]))
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == pick["event_type"]
    )
    daily = (
        ev.groupBy(
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("x")
        )
        .agg(
            (F.sum(F.col("value").cast("decimal(18,4)")) * 10000)
            .cast("long")
            .alias("y")
        )
        .collect()
    )
    x0 = min(r["x"] for r in daily)
    d = (pick["day"] - __import__("datetime").date(1970, 1, 1)).days - x0
    win = [(r["x"] - x0, r["y"]) for r in daily if d - 27 <= r["x"] - x0 <= d]
    n = len(win)
    assert n == pick["n_days"]
    sx = sum(x for x, _ in win)
    sy = sum(y for _, y in win)
    sxy = sum(x * y for x, y in win)
    sxx = sum(x * x for x, y in win)
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    expect = 0 if den == 0 else (1 if num >= 0 else -1) * (abs(num) * 1_000_000 // den)
    assert pick["slope_ppm_tenk_per_day"] == expect


def test_pyds_replay_is_genuinely_multi_batch(spark, sf_dir):
    """The rate-limited Python streaming source must split the replay into
    multiple micro-batches: the appended partials hold more rows than one
    batch's per-type rollup could produce, and a checkpoint directory with
    committed offsets exists."""
    import os

    from hadoopmapreduce_spark.catalog import work_dir
    from hadoopmapreduce_spark.streaming.windowed import streaming_pyds_replay

    out = streaming_pyds_replay(spark, sf_dir).collect()
    n_types = len(out)
    assert n_types > 0
    base = work_dir("pyds_replay", sf_dir)
    partials = spark.read.parquet(os.path.join(base, "partials"))
    assert partials.count() > n_types, (
        "partials hold one rollup per type — the replay ran as a single "
        "micro-batch; the chunked rate limit is not splitting"
    )
    commits = os.path.join(base, "_ckpt", "commits")
    assert os.path.isdir(commits) and len(os.listdir(commits)) >= 2
