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
