"""Physical-plan regression guards for the clustered validation plan.

The scale story depends on plan SHAPE, not just results: one full-frame
exchange, no text columns in any shuffle, dims broadcast or SMJ'd by
size. These tests pin that shape so a future change that silently
reintroduces an exchange (e.g. the eqNullSafe coalesce-wrapping regression)
fails CI instead of only showing up as a 2x slowdown at scale.
"""

import re

import pytest
from pyspark.sql import functions as F

from hdfs_anomaly_detection_spark.constraints import (
    TextEquals,
    ValidationRunner,
    default_transcript_checks,
)
from hdfs_anomaly_detection_spark.fixtures import (
    FixtureConfig,
    build_fixture,
    clean_transcripts,
)


@pytest.fixture(scope="module")
def flagged_plan(spark):
    cfg = FixtureConfig(n_conversations=400)
    fx = build_fixture(spark, cfg)
    runner = ValidationRunner(
        default_transcript_checks() + [TextEquals("text_equals")],
        n_buckets=8,
        dims={"conversations": fx.conversations, "tools": fx.tools},
        reference=clean_transcripts(spark, cfg).select(
            "conv_id", "turn_idx", F.xxhash64("text").alias("canon_hash")
        ),
    )
    # tiny fixtures would auto-broadcast every side and hide the at-scale
    # SMJ shape; explicit hints (tools) still broadcast
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        flagged, _ = runner._flagged(fx.fact)
        plan = flagged._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    return plan


def test_single_full_frame_exchange(flagged_plan):
    # fact 1x + ref-hashes 1x + conversations dim 1x + 12-row tools dedup;
    # the ref-equality SMJ, conv-dim SMJ, and ordering window must NOT add
    # exchanges of their own
    n_shuffles = len(re.findall(r"(?<!Broadcast)(?<!Reused)Exchange hash", flagged_plan)) + len(
        re.findall(r"Exchange RoundRobin", flagged_plan)
    )
    assert n_shuffles <= 4, f"plan regressed to {n_shuffles} shuffles:\n{flagged_plan[:4000]}"


def test_no_text_column_in_exchanges(flagged_plan):
    # the narrow frame must not carry the transcript text through a shuffle
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", flagged_plan):
        assert "text#" not in m.group(1)


def test_tools_dim_broadcast_and_large_dims_smj(flagged_plan):
    assert "BroadcastExchange" in flagged_plan  # hinted 12-row tools dim
    assert "SortMergeJoin" in flagged_plan  # conversations dim + reference


def test_drift_rides_narrow_frame(spark, tmp_path, monkeypatch):
    """A Drift check must NOT re-scan the fact table: its metric is
    pre-computed into the persisted narrow frame and the digest pass
    reads that. The `metric_frame` fallback (a fresh fact projection) is
    poisoned so any regression to the two-scan plan fails loudly."""
    from hdfs_anomaly_detection_spark.constraints import Drift
    from hdfs_anomaly_detection_spark.sketch import drift as drift_mod
    from hdfs_anomaly_detection_spark.sketch.drift import compute_baselines

    cfg = FixtureConfig(n_conversations=100)
    clean = clean_transcripts(spark, cfg)
    baselines = compute_baselines(clean, ["text_length", "turn_count"], n_buckets=8)
    path = str(tmp_path / "fact")
    clean.write.parquet(path)
    fact = spark.read.parquet(path)

    def poisoned(*a, **k):
        raise AssertionError("Drift re-scanned fact (metric_frame fallback used)")

    monkeypatch.setattr(drift_mod, "metric_frame", poisoned)
    from hdfs_anomaly_detection_spark.constraints import Freshness
    from hdfs_anomaly_detection_spark.fixtures import EPOCH_BASE

    runner = ValidationRunner(
        default_transcript_checks(dims=False)
        + [
            Drift("drift_len", metric="text_length", method="ks", threshold=0.2),
            Drift("drift_turns", metric="turn_count", method="psi", threshold=0.25),
            # ts rides the narrow frame (MonotonicOrder tiebreak), so the
            # freshness max-ts aggregate must come from the cache too
            Freshness("fresh", ts_col="ts", max_age_seconds=10**9,
                      as_of=EPOCH_BASE + 10**6),
        ],
        n_buckets=8,
        baselines=baselines,
    )
    res = runner.run(fact)
    # every consumer (violations explode, uniqueness, drift digests)
    # reads the persisted narrow frame, not a fresh parquet scan (the
    # plan text repeats the cached relation's inner scan, so assert the
    # cache node rather than counting scan strings)
    plan = res.violations._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan, plan[:4000]
    verd = res.verdicts.toPandas()
    drift_rows = verd[verd["check_id"].isin(["drift_len", "drift_turns"])]
    # same data as baseline ⇒ KS/PSI ≈ 0 ⇒ all drift verdicts pass
    assert len(drift_rows) > 0 and drift_rows["passed"].all()
    fresh = verd[verd["check_id"] == "fresh"]
    assert len(fresh) > 0 and fresh["passed"].all()
    assert (fresh["statistic"] > 0).all()  # staleness vs fixed as_of
    res.unpersist()


def test_unreferenced_cluster_key_plans(spark):
    """A documented cluster_key that no check references must still be
    carried into the narrow frame (r1 ADVICE: used to raise
    AnalysisException at repartition time)."""
    cfg = FixtureConfig(n_conversations=50)
    fact = clean_transcripts(spark, cfg).withColumn(
        "shard", F.substring("conv_id", 6, 4)
    )
    runner = ValidationRunner(
        default_transcript_checks(dims=False), n_buckets=8, cluster_key="shard"
    )
    res = runner.run(fact)
    assert res.violations.count() == 0
    res.unpersist()


def test_window_reuses_join_sort(flagged_plan):
    # the ordering window must sit directly above the join output without
    # its own Sort+Exchange pair: count Sort operators — 2 SMJs need at
    # most 4 (both sides each), window adds 0 or reuses
    n_sorts = flagged_plan.count("Sort [")
    assert n_sorts <= 5, f"unexpected extra sorts ({n_sorts}):\n{flagged_plan[:4000]}"


def test_centroid_outliers_partial_window_group_limit(spark):
    """centroid_outliers must never ship a label's FULL distance set to
    one reducer (few labels => full-frame skew, VERDICT r2). The rank
    filter adjacent to the window lets Catalyst plan a Partial
    WindowGroupLimit BELOW the exchange — map-side per-label top-k, so
    the label reducer receives <= k x n_partitions rows. Pin that node:
    a refactor breaking filter-over-window adjacency loses the pruning
    and must fail here."""
    from hdfs_anomaly_detection_spark.stats import centroid_outliers

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = (
            centroid_outliers(df, k=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    # toString prints root first: the map-side (Partial) prune must
    # appear AFTER (= below) the label exchange, the Final one above it
    m_partial = re.search(r"WindowGroupLimit \[label#\d+\].*row_number\(\), 3, Partial", plan)
    m_final = re.search(r"WindowGroupLimit \[label#\d+\].*row_number\(\), 3, Final", plan)
    m_exch = re.search(r"Exchange hashpartitioning\(label#\d+, \d+\)", plan)
    assert m_partial and m_final and m_exch, plan[:4000]
    assert m_final.start() < m_exch.start() < m_partial.start(), plan[:4000]


def test_topk_per_group_partial_window_group_limit(spark):
    """q_topk_per_group keeps the rank filter adjacent to its window, so
    every input partition is pruned to its local per-group top-k
    map-side (Partial WindowGroupLimit below the exchange) — same scale
    guarantee as centroid_outliers, pinned for the driver query too."""
    from hdfs_anomaly_detection_spark.plans.driver_queries import QUERIES

    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = (
            QUERIES["q_topk_per_group"](spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    m_partial = re.search(r"WindowGroupLimit .*row_number\(\), 3, Partial", plan)
    m_exch = re.search(r"Exchange hashpartitioning\(c_nationkey#\d+, \d+\)", plan)
    assert m_partial and m_exch, plan[:3000]
    assert m_exch.start() < m_partial.start(), plan[:3000]
