"""Distributed global row-number vs the single-partition window oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from hdfs_anomaly_detection_spark.operators import global_row_number

SF = "/root/testdata/sf0.001"


def test_global_row_number_matches_window(spark):
    """Range-exchange + offsets + map numbering == the global window
    row_number, on a total order (desc price, asc key tiebreak)."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    got = (
        global_row_number(
            orders, [F.desc("o_totalprice"), F.asc("o_orderkey")], rank_col="rk"
        )
        .select("o_orderkey", "rk")
        .toPandas()
        .sort_values("rk")
    )
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    exp = (
        orders.select("o_orderkey", F.row_number().over(w).alias("rk"))
        .toPandas()
        .sort_values("rk")
    )
    assert list(got["o_orderkey"]) == list(exp["o_orderkey"])
    assert list(got["rk"]) == list(range(1, len(exp) + 1))


def test_global_row_number_no_single_partition_exchange(spark):
    """The whole point: the plan must contain a RANGE exchange and no
    Exchange SinglePartition (the global window's scale-killer)."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    out = global_row_number(
        orders, [F.desc("o_totalprice"), F.asc("o_orderkey")], num_partitions=8
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange rangepartitioning" in plan, plan[:3000]
    assert "Exchange SinglePartition" not in plan, plan[:3000]
    out.count()


def test_global_row_number_skew_and_empty(spark):
    """Skewed sort key (90% identical values, tiebreak totalizes) still
    numbers 1..n with near-even partitions; empty input yields empty."""
    df = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0.0))
        .otherwise(F.col("id").cast("double"))
        .alias("v"),
        F.col("id"),
    )
    got = (
        global_row_number(df, [F.asc("v"), F.asc("id")], num_partitions=8)
        .toPandas()
        .sort_values("rk")
    )
    assert list(got["rk"]) == list(range(1, 5001))
    # within equal v, ids ascend (tiebreak respected)
    zero = got[got["v"] == 0.0]
    assert list(zero["id"]) == sorted(zero["id"])

    empty = global_row_number(df.limit(0), [F.asc("v"), F.asc("id")])
    assert empty.count() == 0
    assert "rk" in empty.columns
