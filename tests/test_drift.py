"""t-digest sketch accuracy + KS/PSI drift detection, end to end."""

from __future__ import annotations

import numpy as np
import pytest

from hdfs_anomaly_detection_spark.constraints import ValidationRunner, Drift
from hdfs_anomaly_detection_spark.fixtures import FixtureConfig, clean_transcripts
from hdfs_anomaly_detection_spark.sketch import TDigest, build_partition_digests, metric_frame
from hdfs_anomaly_detection_spark.sketch.drift import compute_baselines, ks_statistic, psi


def test_tdigest_quantiles_uniform():
    rng = np.random.default_rng(42)
    vals = rng.uniform(0, 1, 50_000)
    d = TDigest.from_values(vals)
    qs = np.array([0.01, 0.25, 0.5, 0.75, 0.99])
    est = d.quantile(qs)
    exact = np.quantile(vals, qs)
    assert np.max(np.abs(est - exact)) < 0.01
    assert len(d.means) < 250  # compression bound ~2*delta


def test_tdigest_merge_equals_whole():
    rng = np.random.default_rng(7)
    vals = rng.lognormal(3, 1, 40_000)
    parts = [TDigest.from_values(v) for v in np.array_split(vals, 8)]
    merged = TDigest.merge_all(parts)
    whole = TDigest.from_values(vals)
    qs = np.linspace(0.05, 0.95, 19)
    rel = np.abs(merged.quantile(qs) - whole.quantile(qs)) / whole.quantile(qs)
    assert np.max(rel) < 0.05
    assert merged.n == len(vals)


def test_ks_and_psi_sensitivity():
    rng = np.random.default_rng(0)
    a = TDigest.from_values(rng.normal(0, 1, 30_000))
    b = TDigest.from_values(rng.normal(0, 1, 30_000))
    c = TDigest.from_values(rng.normal(1.0, 1, 30_000))
    assert ks_statistic(a, b) < 0.03
    assert ks_statistic(a, c) > 0.3
    assert psi(a, b) < 0.02
    assert psi(a, c) > 0.5


def test_partition_digests_match_exact_quantiles(spark):
    cfg = FixtureConfig(n_conversations=300)
    fact = clean_transcripts(spark, cfg)
    mf = metric_frame(fact, "text_length", n_buckets=4)
    digests = build_partition_digests(mf, "text_length").toPandas()
    assert set(digests["part_id"]) == set(range(4))
    pdf = mf.toPandas()
    for _, r in digests.iterrows():
        d = TDigest(np.asarray(r["means"]), np.asarray(r["weights"]), int(r["n"]),
                    float(r["vmin"]), float(r["vmax"]))
        vals = pdf[pdf["part_id"] == r["part_id"]]["value"].to_numpy()
        assert d.n == len(vals)
        est = d.quantile(np.array([0.5]))[0]
        assert abs(est - np.quantile(vals, 0.5)) / np.quantile(vals, 0.5) < 0.1


def test_drift_detected_end_to_end(spark):
    clean_cfg = FixtureConfig(n_conversations=400)
    drifted_cfg = FixtureConfig(n_conversations=400, length_drift_factor=1.5)
    clean = clean_transcripts(spark, clean_cfg)
    baselines = compute_baselines(clean, ["text_length", "turn_count"], n_buckets=4)

    checks = [
        Drift("drift_text_length_ks", metric="text_length", method="ks", threshold=0.1),
        Drift("drift_turn_count_psi", metric="turn_count", method="psi", threshold=0.1),
    ]
    # same data vs baseline → all pass
    ok = ValidationRunner(checks, n_buckets=4, baselines=baselines).run(clean)
    verd = ok.verdicts.toPandas()
    assert verd[verd["check_id"] == "drift_text_length_ks"]["passed"].all()
    assert verd[verd["check_id"] == "drift_turn_count_psi"]["passed"].all()
    # dataset-level rolled-up verdict: merged digests under part_id=-1
    # (SchemaConformance's global convention), one per drift check
    glob = verd[verd["part_id"] == -1]
    assert sorted(glob["check_id"]) == ["drift_text_length_ks", "drift_turn_count_psi"]
    assert glob["passed"].all() and (glob["n_rows"] > 0).all()

    # drifted lengths → text_length fails everywhere, turn_count still passes
    drifted = clean_transcripts(spark, drifted_cfg)
    bad = ValidationRunner(checks, n_buckets=4, baselines=baselines).run(drifted)
    verd = bad.verdicts.toPandas()
    tl = verd[verd["check_id"] == "drift_text_length_ks"]
    assert not tl["passed"].any()
    assert (tl["statistic"] > 0.1).all()
    tc = verd[verd["check_id"] == "drift_turn_count_psi"]
    assert tc["passed"].all()
    # the global -1 rows agree: drifted metric fails dataset-wide, the
    # undrifted one passes dataset-wide
    glob = verd[verd["part_id"] == -1].set_index("check_id")
    assert not glob.loc["drift_text_length_ks", "passed"]
    assert glob.loc["drift_turn_count_psi", "passed"]


def test_global_drift_on_subset_run_uses_baseline_slice(spark):
    """Review-found: an incremental/subset run must compare its
    partitions against THEIR baseline slice, not the whole-dataset
    baseline merge — otherwise the subset's composition alone
    fabricates (or masks) drift in the part_id=-1 row."""
    cfg = FixtureConfig(n_conversations=400)
    clean = clean_transcripts(spark, cfg)
    baselines = compute_baselines(clean, ["text_length"], n_buckets=8)
    checks = [Drift("d", metric="text_length", method="ks", threshold=0.1)]

    from hdfs_anomaly_detection_spark.constraints import ValidationRunner
    from hdfs_anomaly_detection_spark.constraints.runner import part_id_expr

    # validate ONLY two partitions of the SAME (undrifted) data: the
    # global verdict must pass — under the old whole-baseline merge the
    # statistic compared 2 partitions vs 8 and depended on composition
    sub = clean.filter(part_id_expr(n_buckets=8).isin([2, 5]))
    res = ValidationRunner(checks, n_buckets=8, baselines=baselines).run(sub)
    verd = res.verdicts.toPandas()
    glob = verd[verd["part_id"] == -1]
    assert len(glob) == 1
    assert glob.iloc[0]["passed"] and glob.iloc[0]["statistic"] < 0.05
    res.unpersist()


# --------------------------------------------------------- exact KS (r5)


def _np_ks(a: np.ndarray, b: np.ndarray) -> float:
    """Independent oracle: exact two-sample KS via sorted ECDFs."""
    xs = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(np.sort(a), xs, side="right") / len(a)
    cb = np.searchsorted(np.sort(b), xs, side="right") / len(b)
    return float(np.max(np.abs(ca - cb)))


def test_exact_ks_matches_numpy_oracle(spark):
    from hdfs_anomaly_detection_spark.sketch import exact_ks_by_group

    rng = np.random.default_rng(11)
    rows_a, rows_b = [], []
    truth = {}
    for g in range(3):
        a = rng.normal(g, 1.0, 4000).round(2)
        b = rng.normal(g + 0.3 * g, 1.0 + 0.1 * g, 3500).round(2)
        truth[g] = round(_np_ks(a, b), 6)
        rows_a += [(g, float(x)) for x in a]
        rows_b += [(g, float(x)) for x in b]
    base = spark.createDataFrame(rows_a, "grp int, v double")
    cur = spark.createDataFrame(rows_b, "grp int, v double")
    got = {
        r["grp"]: (r["ks_stat"], r["n_base"], r["n_cur"])
        for r in exact_ks_by_group(base, cur, "v", ["grp"]).collect()
    }
    assert set(got) == set(truth)
    for g in truth:
        assert got[g][0] == pytest.approx(truth[g], abs=2e-6)
        assert (got[g][1], got[g][2]) == (4000, 3500)


def test_exact_ks_null_values_and_missing_groups(spark):
    from hdfs_anomaly_detection_spark.sketch import exact_ks_by_group

    base = spark.createDataFrame(
        [(0, 1.0), (0, 2.0), (0, None), (1, 5.0)], "grp int, v double"
    )
    cur = spark.createDataFrame(
        [(0, 1.0), (0, None), (2, 9.0)], "grp int, v double"
    )
    out = exact_ks_by_group(base, cur, "v", ["grp"]).collect()
    # group 1 (base-only) and 2 (cur-only) yield no row; nulls excluded
    assert len(out) == 1 and out[0]["grp"] == 0
    assert (out[0]["n_base"], out[0]["n_cur"]) == (2, 1)
    # ECDFs: base {1:.5, 2:1}, cur {1:1} -> max gap .5 at x=1
    assert out[0]["ks_stat"] == pytest.approx(0.5)


def test_tdigest_ks_tracks_exact_ks(spark):
    # the approximate (t-digest) path and the exact path must agree
    # within sketch tolerance on the same data — binds
    # v_drift_text_length to q_ks_exact
    from hdfs_anomaly_detection_spark.sketch import exact_ks_by_group

    rng = np.random.default_rng(23)
    a = rng.lognormal(4.0, 0.6, 30_000).round(0)
    b = rng.lognormal(4.15, 0.65, 30_000).round(0)
    exact = _np_ks(a, b)
    approx = ks_statistic(TDigest.from_values(a), TDigest.from_values(b))
    assert approx == pytest.approx(exact, abs=0.02)
    # and the distributed exact path agrees with numpy exactly
    base = spark.createDataFrame([(0, float(x)) for x in a], "grp int, v double")
    cur = spark.createDataFrame([(0, float(x)) for x in b], "grp int, v double")
    got = exact_ks_by_group(base, cur, "v", ["grp"]).collect()[0]["ks_stat"]
    assert got == pytest.approx(exact, abs=2e-6)
