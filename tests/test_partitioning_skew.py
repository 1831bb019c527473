"""Skew handling: salted uniqueness across many input splits, hot-key
detection, and size-aware repartitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdfs_anomaly_detection_spark.constraints import Unique, ValidationRunner
from hdfs_anomaly_detection_spark.plans.partitioning import (
    hot_conversations,
    turn_count_aware_repartition,
)


def test_salted_unique_counts_hot_key_exactly(spark):
    """One key duplicated 10k times, spread over 32 input splits: the
    two-phase salted aggregation must report count=10000 exactly (salt
    boundaries must not split or double-count)."""
    hot = spark.range(10_000).select(
        F.lit("conv_hot").alias("conv_id"), F.lit(7).alias("turn_idx")
    )
    cold = spark.range(1000).select(
        F.format_string("conv_%d", F.col("id")).alias("conv_id"),
        F.lit(0).alias("turn_idx"),
    )
    df = hot.unionByName(cold).repartition(32)
    res = ValidationRunner([Unique("u", columns=("conv_id", "turn_idx"))], n_buckets=8).run(df)
    viol = res.violations.toPandas()
    assert len(viol) == 1
    assert viol.iloc[0]["conv_id"] == "conv_hot"
    assert viol.iloc[0]["detail"] == "duplicate key count=10000"


def test_salted_equals_unsalted(spark):
    df = spark.range(5000).select(
        F.format_string("conv_%d", F.pmod(F.col("id"), F.lit(700))).alias("conv_id"),
        F.pmod(F.col("id"), F.lit(5)).cast("int").alias("turn_idx"),
    )
    a = (
        ValidationRunner([Unique("u", salted=True)], n_buckets=8)
        .run(df).violations.toPandas()
    )
    b = (
        ValidationRunner([Unique("u", salted=False)], n_buckets=8)
        .run(df).violations.toPandas()
    )
    key = ["conv_id", "turn_idx", "detail"]
    assert sorted(map(tuple, a[key].values.tolist())) == sorted(
        map(tuple, b[key].values.tolist())
    )


def test_hot_conversation_detection(spark):
    hot = spark.range(50_000).select(F.lit("conv_hot").alias("conv_id"))
    cold = spark.range(10_000).select(
        F.format_string("conv_%d", F.pmod(F.col("id"), F.lit(500))).alias("conv_id")
    )
    df = hot.unionByName(cold)
    found = hot_conversations(df, threshold_rows=20_000, sample_fraction=0.1).toPandas()
    assert "conv_hot" in set(found["conv_id"])
    assert len(found) == 1


def test_turn_count_aware_repartition(spark):
    df = spark.range(100_000).select(
        F.format_string("conv_%d", F.pmod(F.col("id"), F.lit(997))).alias("conv_id"),
        F.col("id").alias("turn_idx"),
    )
    out = turn_count_aware_repartition(df, target_rows_per_task=10_000, sample_fraction=0.2)
    n = out.rdd.getNumPartitions()
    assert 8 <= n <= 16  # ~100k/10k = 10, clamped at min 8


def test_lsh_hot_band_aqe_skew_split(spark):
    """Planted degenerate LSH band bucket (300 identical docs collide in
    EVERY band): AQE's OptimizeSkewedJoin must split the hot (band, bh)
    bucket of the banded self-join (skew=true in the final plan) and the
    candidate set must still be the exact all-pairs of the flood.
    Guidance for real corpora lives in minhash_lsh_candidate_pairs'
    docstring: exact-dedup first; the quadratic bucket output itself is
    inherent to identical docs."""
    from hdfs_anomaly_detection_spark.operators import minhash_lsh_candidate_pairs

    n_hot = 300
    hot = spark.range(n_hot).select(
        F.col("id").alias("doc_id"),
        F.lit("the same exact document text repeated for every row").alias("text"),
    )
    cold = spark.range(1000, 1400).select(
        F.col("id").alias("doc_id"),
        F.format_string(
            "unique filler document %d with its own distinct words %d", "id", "id"
        ).alias("text"),
    )
    docs = hot.unionByName(cold).repartition(16)

    conf = spark.conf
    old = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # tiny thresholds so the planted bucket counts as skewed at test scale
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # keep the SMJ
    try:
        pairs = minhash_lsh_candidate_pairs(docs, verify_threshold=0.9)
        got = pairs.toPandas()
        plan = pairs._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in old.items():
            conf.set(k, v)

    # correctness under the split: exactly the all-pairs of the flood
    flood = got[(got["id_a"] < n_hot) & (got["id_b"] < n_hot)]
    assert len(flood) == n_hot * (n_hot - 1) // 2
    assert (flood["est_jaccard"] == 1.0).all()
    # and the final adaptive plan really split the hot bucket
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan[:4000]
