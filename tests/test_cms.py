"""Count-Min sketch: the one-sided error guarantee, exact heavy-hitter
output under forced collisions, merge algebra, and the plan shape that
makes it scale (admission filter BELOW the final exchange).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hdfs_anomaly_detection_spark.sketch import (
    CountMinSketch,
    build_cms,
    cms_estimate,
    heavy_hitters,
)

SEED = 20260817


def _zipf_df(spark, n=5000, n_keys=200, seed=SEED):
    rng = np.random.default_rng(seed)
    keys = np.minimum(rng.zipf(1.3, n) % n_keys, n_keys - 1)
    pdf = pd.DataFrame({"k": [f"key_{i:04d}" for i in keys]})
    return spark.createDataFrame(pdf), pdf


def test_estimate_never_underestimates(spark):
    df, pdf = _zipf_df(spark)
    sk = build_cms(df, "k", depth=4, width=256)
    est = (
        df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("truth"))
        .withColumn("est", cms_estimate(sk, "k"))
        .toPandas()
    )
    assert (est["est"] >= est["truth"]).all()
    # and the sketch saw every row exactly once per depth
    assert sk.total == len(pdf)


def test_estimate_error_bound(spark):
    """Overestimate <= e/width * N holds for every key at this width
    (a deterministic check of the seeded instance, not a tail bound)."""
    df, pdf = _zipf_df(spark)
    sk = build_cms(df, "k", depth=5, width=1024)
    est = (
        df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("truth"))
        .withColumn("est", cms_estimate(sk, "k"))
        .toPandas()
    )
    assert ((est["est"] - est["truth"]) <= np.e / 1024 * len(pdf) + 1).all()


@pytest.mark.parametrize("width", [16, 64, 2048])  # 16 forces heavy collisions
@pytest.mark.parametrize("threshold", [20, 60, 200])
def test_heavy_hitters_exact_under_collisions(spark, width, threshold):
    df, pdf = _zipf_df(spark)
    got = heavy_hitters(df, "k", threshold, depth=3, width=width).toPandas()
    truth = pdf.groupby("k").size()
    want = truth[truth >= threshold].sort_index()
    got = got.set_index("k")["cnt"].sort_index()
    assert got.index.tolist() == want.index.tolist()
    assert got.tolist() == want.tolist()


def test_heavy_hitters_excludes_nulls(spark):
    pdf = pd.DataFrame({"k": ["a", "a", None, None, None, "b"]})
    df = spark.createDataFrame(pdf)
    got = heavy_hitters(df, "k", 2, depth=2, width=8).toPandas()
    assert got["k"].tolist() == ["a"] and got["cnt"].tolist() == [2]


def test_merge_equals_single_build(spark):
    df, pdf = _zipf_df(spark)
    half = len(pdf) // 2
    a = spark.createDataFrame(pdf.iloc[:half])
    b = spark.createDataFrame(pdf.iloc[half:])
    merged = build_cms(a, "k", depth=3, width=128).merge(
        build_cms(b, "k", depth=3, width=128)
    )
    whole = build_cms(df, "k", depth=3, width=128)
    assert np.array_equal(merged.counters, whole.counters)
    assert merged.total == whole.total
    with pytest.raises(ValueError):
        whole.merge(CountMinSketch(2, 128, np.zeros((2, 128), dtype=np.int64), 0))


def test_sketch_reuse_across_thresholds(spark):
    df, pdf = _zipf_df(spark)
    sk = build_cms(df, "k", depth=3, width=512)
    truth = pdf.groupby("k").size()
    for t in (30, 90):
        got = heavy_hitters(df, "k", t, sketch=sk).toPandas()
        assert sorted(got["k"]) == sorted(truth[truth >= t].index)


def test_plan_admission_filter_below_exchange(spark, tmp_path):
    """The scale claim: the CMS filter runs map-side (below the final
    count's exchange), so non-candidate rows never shuffle; the filter
    is a folded literal lookup (no per-row JSON parse, no extra join).
    A parquet scan (not a LocalRelation, which constant-folds filters
    away entirely) stands in for the production table."""
    src, _ = _zipf_df(spark)
    src.write.mode("overwrite").parquet(str(tmp_path / "cms_src"))
    df = spark.read.parquet(str(tmp_path / "cms_src"))
    sk = build_cms(df, "k", depth=2, width=64)
    hh = df.filter(F.col("k").isNotNull()).filter(
        cms_estimate(sk, "k") >= F.lit(50)
    ).groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).filter(F.col("cnt") >= 50)
    plan = hh._jdf.queryExecution().executedPlan().toString()
    assert "from_json" not in plan.lower(), "literal not constant-folded"
    fpos = plan.index("xxhash64")  # the admission predicate
    xpos = plan.index("Exchange hashpartitioning")
    # executedPlan prints top-down: the exchange appears BEFORE (above)
    # the filter iff the filter is on the map side
    assert xpos < fpos, f"admission filter not below the exchange:\n{plan}"
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_plan_literal_guardrail_raises(spark):
    # width=1e6 would embed a ~32 MiB literal into every task's plan;
    # the estimate/admission path must refuse with a clear message
    import numpy as np

    from hdfs_anomaly_detection_spark.sketch.cms import CountMinSketch, cms_estimate

    sk = CountMinSketch(4, 1_000_000, np.zeros((4, 1_000_000), dtype=np.int64), 0)
    with pytest.raises(ValueError, match="plan-literal budget"):
        cms_estimate(sk, "k")
