"""Multimodal columns: REAL BMP/WAV decode paths (pure NumPy/stdlib),
stub fallback for undecodable codecs, and the frame-sampling plan."""

from __future__ import annotations

import numpy as np
import pytest

from hdfs_anomaly_detection_spark.operators.multimodal import (
    audio_features,
    decode_bmp,
    decode_stub,
    decode_wav,
    encode_bmp,
    encode_wav_pcm16,
    extract_features,
    frame_sample_plan,
    image_features,
    resize_nearest,
    synthesize_media,
)


# ----------------------------------------------------------- codec roundtrip


def test_bmp_roundtrip_exact_pixels():
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 5), (7, 2), (16, 16)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_wav_roundtrip_exact_samples():
    rng = np.random.default_rng(11)
    samp = (rng.standard_normal(1234) * 5000).astype(np.int16)
    rate, back = decode_wav(encode_wav_pcm16(samp, 16000))
    assert rate == 16000
    assert np.array_equal(back, samp)


def test_y4m_roundtrip_exact_planes():
    from hdfs_anomaly_detection_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
    )

    rng = np.random.default_rng(5)
    for n, h, w in [(1, 1, 1), (3, 2, 4), (4, 3, 7)]:
        fr = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_y4m(encode_y4m(fr)), fr)


def test_y4m_rejects_garbage_and_degenerate():
    from hdfs_anomaly_detection_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
    )

    with pytest.raises(ValueError):
        decode_y4m(b"NOT A VIDEO\n")
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W0 H2 F25:1 Ip A1:1 C444\n")
    with pytest.raises(ValueError):  # chroma-subsampled stream unsupported
        decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C420\nFRAME\n" + b"\x00" * 6)
    good = encode_y4m(np.zeros((1, 2, 2, 3), dtype=np.uint8))
    hdr = good.find(b"\n") + 1
    with pytest.raises(ValueError):  # corrupt frame marker
        decode_y4m(good[:hdr] + b"XRAME" + good[hdr + 5 :])


def test_decoders_reject_garbage():
    with pytest.raises(ValueError):
        decode_bmp(b"NOTABMP" + b"\x00" * 64)
    with pytest.raises(Exception):
        decode_wav(b"\x01\x02\x03")


def test_bmp_rejects_degenerate_dimensions():
    """A width<=0 / height==0 header must raise (routing the payload to
    the decoded=false fallback) instead of emitting NaN features with
    decoded=true (ADVICE r2)."""
    import struct

    px = np.zeros((2, 2, 3), dtype=np.uint8)
    payload = bytearray(encode_bmp(px))
    for w, h in [(0, 2), (-3, 2), (2, 0)]:
        bad = bytearray(payload)
        struct.pack_into("<ii", bad, 18, w, h)
        with pytest.raises(ValueError):
            decode_bmp(bytes(bad))


def test_resize_nearest_matches_index_oracle():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8)
    out = resize_nearest(img, 5, 7)
    assert out.shape == (5, 7, 3)
    for y in range(5):
        for x in range(7):
            assert np.array_equal(out[y, x], img[y * 10 // 5, x * 14 // 7])


# ------------------------------------------------------------- spark e2e


@pytest.fixture(scope="module")
def feats(spark):
    media = synthesize_media(spark, n=60)
    return media, extract_features(media).toPandas().sort_values("media_id")


def test_feature_schema_and_split(feats):
    _, f = feats
    assert list(f.columns) == [
        "media_id", "kind", "codec", "n_bytes", "width", "height",
        "n_samples", "sample_rate", "n_frames", "feature", "decoded",
    ]
    assert len(f) == 60
    # images + audio really decode; y4m video decodes for real (r3),
    # compressed-container stub rows stay honestly flagged
    assert f[f["kind"] == "image"]["decoded"].all()
    assert f[f["kind"] == "audio"]["decoded"].all()
    vid = f[f["kind"] == "video"]
    assert vid[vid["codec"] == "y4m"]["decoded"].all()
    assert (vid[vid["codec"] == "y4m"]["n_frames"] > 0).all()
    assert not vid[vid["codec"] == "stub"]["decoded"].any()
    assert len(vid[vid["codec"] == "y4m"]) > 0 and len(vid[vid["codec"] == "stub"]) > 0


def test_image_rows_match_local_decode(feats):
    media, f = feats
    rows = {r["media_id"]: r for r in media.filter("kind = 'image'").collect()}
    for mid, r in rows.items():
        img = decode_bmp(bytes(r["payload"]))
        sel = f[f["media_id"] == mid].iloc[0]
        assert (sel["height"], sel["width"]) == img.shape[:2]
        np.testing.assert_allclose(
            np.asarray(sel["feature"]), image_features(img), rtol=1e-6
        )
        # metadata agrees with the actually-decoded dimensions
        assert r["meta"]["width"] == sel["width"]
        assert r["meta"]["height"] == sel["height"]


def test_audio_rows_match_local_decode(feats):
    media, f = feats
    rows = {r["media_id"]: r for r in media.filter("kind = 'audio'").collect()}
    for mid, r in rows.items():
        rate, samp = decode_wav(bytes(r["payload"]))
        sel = f[f["media_id"] == mid].iloc[0]
        assert sel["sample_rate"] == rate == 8000
        assert sel["n_samples"] == len(samp)
        np.testing.assert_allclose(
            np.asarray(sel["feature"]), audio_features(samp, rate), rtol=1e-6
        )


def test_video_rows_match_local_decode(feats):
    from hdfs_anomaly_detection_spark.operators.multimodal import (
        decode_y4m,
        video_features,
    )

    media, f = feats
    for r in media.filter("kind = 'video' AND meta.codec = 'y4m'").collect():
        frames = decode_y4m(bytes(r["payload"]))
        sel = f[f["media_id"] == r["media_id"]].iloc[0]
        assert sel["n_frames"] == frames.shape[0]
        assert (sel["height"], sel["width"]) == frames.shape[1:3]
        assert r["meta"]["duration_ms"] == frames.shape[0] * 40  # 25 fps
        np.testing.assert_allclose(
            np.asarray(sel["feature"]), video_features(frames), rtol=1e-6
        )


def test_stub_fallback_matches_python(feats):
    media, f = feats
    stubs = media.filter("kind = 'video' AND meta.codec = 'stub'").collect()
    assert len(stubs) > 0
    for r in stubs:
        sel = f[f["media_id"] == r["media_id"]].iloc[0]
        np.testing.assert_allclose(
            np.asarray(sel["feature"]), decode_stub(bytes(r["payload"])), rtol=1e-6
        )


def test_extract_features_deterministic(spark, feats):
    media, f = feats
    again = extract_features(media).toPandas().sort_values("media_id")
    assert np.allclose(np.vstack(f["feature"]), np.vstack(again["feature"]))


def test_frame_sample_plan(spark):
    media = synthesize_media(spark, n=30)
    plan = frame_sample_plan(media, every_ms=1000).toPandas()
    vids = media.filter("kind = 'video'").select("media_id", "meta.duration_ms").toPandas()
    assert len(vids) > 0
    for _, r in vids.iterrows():
        frames = plan[plan["media_id"] == r["media_id"]]["frame_ts_ms"].tolist()
        n_expected = max(int(r["duration_ms"] // 1000), 1)
        assert frames == [i * 1000 for i in range(n_expected)]
