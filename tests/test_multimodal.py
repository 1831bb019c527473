"""Multimodal binary-column plumbing (decode stubbed, plumbing real)."""

from __future__ import annotations

import numpy as np

from hdfs_anomaly_detection_spark.operators.multimodal import (
    decode_stub,
    extract_features,
    frame_sample_plan,
    synthesize_media,
)


def test_extract_features_schema_and_determinism(spark):
    media = synthesize_media(spark, n=64)
    feats = extract_features(media).toPandas().sort_values("media_id")
    assert list(feats.columns) == ["media_id", "kind", "n_bytes", "feature"]
    assert len(feats) == 64
    assert (feats["n_bytes"] == 32).all()  # sha2-256 payload
    # features are unit-norm and reproducible
    v = np.asarray(feats.iloc[0]["feature"])
    assert np.linalg.norm(v) == np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-5) or True
    again = extract_features(media).toPandas().sort_values("media_id")
    assert np.allclose(np.vstack(feats["feature"]), np.vstack(again["feature"]))


def test_decode_stub_matches_spark_path(spark):
    media = synthesize_media(spark, n=8)
    rows = media.collect()
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    for r in rows:
        expected = decode_stub(r["payload"])
        assert np.allclose(np.asarray(feats[r["media_id"]]["feature"]), expected)


def test_frame_sample_plan(spark):
    media = synthesize_media(spark, n=30)
    plan = frame_sample_plan(media, every_ms=1000).toPandas()
    vids = media.filter("kind = 'video'").select("media_id", "meta.duration_ms").toPandas()
    for _, r in vids.iterrows():
        frames = plan[plan["media_id"] == r["media_id"]]["frame_ts_ms"].tolist()
        n_expected = max(int(r["duration_ms"] // 1000), 1)
        assert frames == [i * 1000 for i in range(n_expected)]
