"""Column stats vs an independent pandas oracle."""

from __future__ import annotations

import pandas as pd
import pytest

from hdfs_anomaly_detection_spark.fixtures import FixtureConfig, corrupted_transcripts
from hdfs_anomaly_detection_spark.stats import column_stats, length_histogram


@pytest.fixture(scope="module")
def fact(spark):
    cfg = FixtureConfig(n_conversations=200, null_text_rate=0.03, null_role_rate=0.02)
    df = corrupted_transcripts(spark, cfg)
    return df, df.toPandas()


def _val(stats: pd.DataFrame, column: str, stat: str) -> float:
    sel = stats[(stats["column"] == column) & (stats["stat"] == stat)]
    assert len(sel) == 1
    return float(sel["value"].iloc[0])


def test_null_counts_and_rates(fact):
    df, pdf = fact
    stats = column_stats(df).toPandas()
    n = len(pdf)
    for c in ["text", "role", "tool", "conv_id"]:
        assert _val(stats, c, "n_null") == pdf[c].isna().sum()
        assert _val(stats, c, "null_rate") == pytest.approx(pdf[c].isna().mean())
        assert _val(stats, c, "n_rows") == n


def test_numeric_min_max_avg(fact):
    df, pdf = fact
    stats = column_stats(df, columns=["turn_idx"]).toPandas()
    assert _val(stats, "turn_idx", "min") == pdf["turn_idx"].min()
    assert _val(stats, "turn_idx", "max") == pdf["turn_idx"].max()
    assert _val(stats, "turn_idx", "avg") == pytest.approx(pdf["turn_idx"].mean())


def test_string_length_stats(fact):
    df, pdf = fact
    stats = column_stats(df, columns=["text"]).toPandas()
    lens = pdf["text"].dropna().str.len()
    assert _val(stats, "text", "min_length") == lens.min()
    assert _val(stats, "text", "max_length") == lens.max()
    assert _val(stats, "text", "avg_length") == pytest.approx(lens.mean())


def test_approx_distinct_accuracy(fact):
    df, pdf = fact
    stats = column_stats(df, columns=["conv_id"]).toPandas()
    exact = pdf["conv_id"].nunique()
    approx = _val(stats, "conv_id", "approx_distinct")
    assert abs(approx - exact) / exact < 0.1


def test_grouped_stats(fact):
    df, pdf = fact
    stats = column_stats(df, columns=["text"], group_by=["role"]).toPandas()
    for role, g in pdf.groupby("role"):
        sel = stats[(stats["role"] == role) & (stats["column"] == "text") & (stats["stat"] == "n_null")]
        assert float(sel["value"].iloc[0]) == g["text"].isna().sum()


def test_length_histogram_vs_pandas(fact):
    df, pdf = fact
    hist = length_histogram(df, "text", bin_width=100).toPandas().set_index("bucket_lo")["n"]
    expected = (pdf["text"].dropna().str.len() // 100 * 100).value_counts()
    assert sorted(hist.index) == sorted(expected.index)
    for b in expected.index:
        assert hist[b] == expected[b]


def test_vector_centroid_stats_vs_numpy(spark):
    import numpy as np

    from hdfs_anomaly_detection_spark.stats import (
        centroid_outliers,
        centroid_spread_stats,
        label_centroids,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pdf = df.toPandas()
    mats = {
        lbl: np.vstack(g["embedding"].map(np.asarray)).astype(float)
        for lbl, g in pdf.groupby("label")
    }
    cents = {lbl: m.mean(axis=0) for lbl, m in mats.items()}

    got_c = label_centroids(df).toPandas().set_index("label")
    for lbl, c in cents.items():
        np.testing.assert_allclose(np.asarray(got_c.loc[lbl, "centroid"]), c, atol=1e-9)
        assert got_c.loc[lbl, "n"] == len(mats[lbl])

    got_s = centroid_spread_stats(df).toPandas().set_index("label")
    for lbl, m in mats.items():
        dists = np.linalg.norm(m - cents[lbl], axis=1)
        assert got_s.loc[lbl, "avg_dist"] == pytest.approx(dists.mean(), abs=1e-3)
        assert got_s.loc[lbl, "max_dist"] == pytest.approx(dists.max(), abs=1e-3)

    got_o = centroid_outliers(df, k=2).toPandas()
    for lbl, g in pdf.groupby("label"):
        dists = np.linalg.norm(mats[lbl] - cents[lbl], axis=1)
        ids = g["vec_id"].to_numpy()
        order = sorted(zip(np.round(dists, 6), -ids), reverse=True)
        expect = [-i for _, i in order[:2]]
        sel = got_o[got_o["label"] == lbl].sort_values("rk")
        assert list(sel["vec_id"]) == expect


def test_centroid_outliers_layout_invariant(spark):
    """The two-stage top-k uses spark_partition_id in stage 1; the
    RESULT must still be a pure function of the data (per-label top-k =
    top-k of the union of per-partition top-ks, any partitioning)."""
    from hdfs_anomaly_detection_spark.stats import centroid_outliers

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = centroid_outliers(df, k=3).toPandas().sort_values(["label", "rk"])
    b = (
        centroid_outliers(df.repartition(7, "vec_id"), k=3)
        .toPandas()
        .sort_values(["label", "rk"])
    )
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
