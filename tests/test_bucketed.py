"""Bucketed-storage joins: the exchange-free layout for repeated
validation runs over the same fact table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdfs_anomaly_detection_spark.fixtures import (
    FixtureConfig,
    build_fixture,
)
from hdfs_anomaly_detection_spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed(spark):
    # warehouse.dir is a static conf; use the session default and drop
    # the tables afterwards
    fx = build_fixture(spark, FixtureConfig(n_conversations=200))
    write_bucketed(fx.fact, "b_fact", n_buckets=8)
    write_bucketed(
        fx.conversations, "b_convs", n_buckets=8
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_fact")
    spark.sql("DROP TABLE IF EXISTS b_convs")


def test_bucketed_join_has_no_exchange(bucketed):
    spark = bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fact = read_bucketed(spark, "b_fact")
        dim = read_bucketed(spark, "b_convs")
        joined = fact.join(dim, "conv_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: the SMJ reads both sides with ZERO shuffles
        assert "SortMergeJoin" in plan, plan[:3000]
        assert "Exchange" not in plan, plan[:3000]
        # and the result is correct
        n = joined.count()
        assert n == fact.join(dim.hint("shuffle_hash"), "conv_id").count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_has_no_exchange(bucketed):
    spark = bucketed
    fact = read_bucketed(spark, "b_fact")
    agg = fact.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:3000]
    assert agg.count() == fact.select("conv_id").distinct().count()


def test_pre_clustered_validation_zero_fact_exchange(bucketed):
    """ValidationRunner(pre_clustered=True) over a bucketed fact: the
    scan's bucket partitioning replaces the runner's own repartition,
    so the flagged plan (row predicates + ordering window) runs with
    ZERO exchanges — the engine's last full-frame shuffle moved into
    storage. Results must equal the plain-path run exactly."""
    from hdfs_anomaly_detection_spark.constraints import (
        MonotonicOrder,
        NotNull,
        ValidationRunner,
    )

    spark = bucketed
    fact = read_bucketed(spark, "b_fact")
    checks = [
        NotNull("not_null_text", column="text"),
        MonotonicOrder("turn_order"),
    ]

    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        pre = ValidationRunner(checks, n_buckets=8, pre_clustered=True)
        flagged, _ = pre._flagged(fact)
        plan = flagged._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:3000]
        assert "Window" in plan  # the ordering window really is there

        # the explicit-repartition path is only elided by the planner
        # when shuffle.partitions happens to EQUAL the bucket count;
        # with the common mismatch (shuffle partitions != buckets) it
        # re-shuffles — exactly what pre_clustered avoids
        plain = ValidationRunner(checks, n_buckets=8)
        old_sp = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "16")
        try:
            flagged2, _ = plain._flagged(fact)
            plan2 = flagged2._jdf.queryExecution().executedPlan().toString()
            assert "Exchange hashpartitioning" in plan2
            flagged3, _ = ValidationRunner(
                checks, n_buckets=8, pre_clustered=True
            )._flagged(fact)
            plan3 = flagged3._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan3, plan3[:3000]
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old_sp)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)

    # identical violations either way
    a = pre.run(fact)
    b = plain.run(fact)
    key = ["part_id", "check_id", "conv_id", "turn_idx"]
    av = a.violations.select(*key).toPandas().sort_values(key).reset_index(drop=True)
    bv = b.violations.select(*key).toPandas().sort_values(key).reset_index(drop=True)
    assert av.equals(bv)
    a.unpersist()
    b.unpersist()
