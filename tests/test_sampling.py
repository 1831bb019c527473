"""Stratified sampling / rebalancing vs an independent hashlib oracle."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from hdfs_anomaly_detection_spark.operators import (
    rebalance_downsample,
    stratified_sample,
    stratified_sample_hash,
)

SF = "/root/testdata/sf0.001"
FRACTIONS = {"A": 0.3, "N": 0.1, "R": 0.6}


@pytest.fixture(scope="module")
def lineitem(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    return df, df.toPandas()


def _u01(orderkey, linenumber) -> float:
    # \x01 separator mirrors operators/sampling._SEP (composite keys
    # like (12,3) vs (1,23) must hash independently — ADVICE r2)
    h = hashlib.md5(f"{orderkey}\x01{linenumber}".encode()).hexdigest()
    return int(h[:8], 16) / 2**32


def test_composite_keys_hash_independently(lineitem):
    """(12, 3) and (1, 23) concatenate identically without a separator;
    with \\x01 their draws must differ (regression for ADVICE r2)."""
    df, _ = lineitem
    spark = df.sparkSession
    pairs = spark.createDataFrame([(12, 3), (1, 23)], "a bigint, b bigint")
    from hdfs_anomaly_detection_spark.operators.sampling import _key, uniform01

    us = [r[0] for r in pairs.select(uniform01(_key(("a", "b")))).collect()]
    assert us[0] != us[1]


def test_hash_sample_matches_hashlib_oracle(lineitem):
    df, pdf = lineitem
    got = stratified_sample_hash(
        df, "l_returnflag", FRACTIONS, key_cols=("l_orderkey", "l_linenumber")
    ).toPandas()
    keep = pdf.apply(
        lambda r: _u01(r["l_orderkey"], r["l_linenumber"])
        < FRACTIONS.get(r["l_returnflag"], 0.0),
        axis=1,
    )
    expected = set(zip(pdf[keep]["l_orderkey"], pdf[keep]["l_linenumber"]))
    assert set(zip(got["l_orderkey"], got["l_linenumber"])) == expected
    assert len(expected) > 0


def test_hash_sample_is_partitioning_invariant(lineitem):
    """The kept row set must be a pure function of the data — identical
    under any physical layout (the cluster-stability property native
    sampleBy lacks)."""
    df, _ = lineitem
    a = stratified_sample_hash(
        df, "l_returnflag", FRACTIONS, key_cols=("l_orderkey", "l_linenumber")
    )
    b = stratified_sample_hash(
        df.repartition(17, "l_partkey"),
        "l_returnflag",
        FRACTIONS,
        key_cols=("l_orderkey", "l_linenumber"),
    )
    assert a.count() == b.count()
    assert a.join(b, ["l_orderkey", "l_linenumber"], "left_anti").count() == 0


def test_native_sampleby_rates_and_seed(lineitem):
    df, pdf = lineitem
    s1 = stratified_sample(df, "l_returnflag", FRACTIONS, seed=42).toPandas()
    s2 = stratified_sample(df, "l_returnflag", FRACTIONS, seed=42).toPandas()
    # same seed + same layout => identical draw
    assert len(s1) == len(s2)
    base = pdf.groupby("l_returnflag").size()
    got = s1.groupby("l_returnflag").size()
    for flag, frac in FRACTIONS.items():
        rate = got.get(flag, 0) / base[flag]
        assert rate == pytest.approx(frac, abs=0.08)


def test_rebalance_downsample_balances_classes(lineitem):
    df, pdf = lineitem
    out = rebalance_downsample(
        df, "l_returnflag", key_cols=("l_orderkey", "l_linenumber"), target_ratio=1.0
    ).toPandas()
    counts = out.groupby("l_returnflag").size()
    mn = pdf.groupby("l_returnflag").size().min()
    for flag in FRACTIONS:
        assert counts[flag] == pytest.approx(mn, rel=0.15)
    # empty frame passes through
    empty = df.filter(F.lit(False))
    assert rebalance_downsample(
        empty, "l_returnflag", key_cols=("l_orderkey",)
    ).count() == 0
