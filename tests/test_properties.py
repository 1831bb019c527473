"""Property-based tests (hypothesis) for the pure-python kernels:
t-digest accuracy/merge bounds, KS/PSI sanity, codec roundtrips, and
quantizer determinism. No SparkSession needed — these run fast and
cover the numeric edge cases example tests miss."""

from __future__ import annotations

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hdfs_anomaly_detection_spark.operators.multimodal import (
    decode_bmp,
    decode_wav,
    decode_y4m,
    encode_bmp,
    encode_wav_pcm16,
    encode_y4m,
)
from hdfs_anomaly_detection_spark.operators.similarity import _kmeans_fit
from hdfs_anomaly_detection_spark.sketch.drift import ks_statistic, psi
from hdfs_anomaly_detection_spark.sketch.tdigest import TDigest

finite = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False)


@given(st.lists(finite, min_size=1, max_size=1500), st.sampled_from([0.1, 0.5, 0.9, 0.99]))
@settings(max_examples=60, deadline=None)
def test_tdigest_quantile_rank_error(xs, q):
    arr = np.asarray(xs, dtype=float)
    d = TDigest.from_values(arr)
    est = float(d.quantile(np.array([q]))[0])
    assert arr.min() <= est <= arr.max()
    # rank of the estimate brackets q within the digest's resolution
    hi = (arr <= est).mean()
    lo = (arr < est).mean()
    assert lo - 0.1 <= q <= hi + 0.1


@given(st.lists(finite, min_size=1, max_size=600), st.lists(finite, min_size=1, max_size=600))
@settings(max_examples=40, deadline=None)
def test_tdigest_merge_matches_union(a, b):
    full = np.asarray(a + b, dtype=float)
    merged = TDigest.merge_all(
        [TDigest.from_values(np.asarray(a, float)), TDigest.from_values(np.asarray(b, float))]
    )
    assert merged.n == len(full)
    for q in (0.25, 0.5, 0.75):
        est = float(merged.quantile(np.array([q]))[0])
        assert full.min() <= est <= full.max()
        hi = (full <= est).mean()
        lo = (full < est).mean()
        assert lo - 0.12 <= q <= hi + 0.12


@given(st.lists(finite, min_size=2, max_size=500))
@settings(max_examples=40, deadline=None)
def test_ks_psi_self_comparison_is_null(xs):
    d = TDigest.from_values(np.asarray(xs, float))
    k = ks_statistic(d, d)
    assert 0.0 <= k <= 1e-9
    assert abs(psi(d, d)) <= 1e-9


@given(st.lists(finite, min_size=2, max_size=400), st.lists(finite, min_size=2, max_size=400))
@settings(max_examples=40, deadline=None)
def test_ks_bounded_and_symmetric(a, b):
    da = TDigest.from_values(np.asarray(a, float))
    db = TDigest.from_values(np.asarray(b, float))
    k1, k2 = ks_statistic(da, db), ks_statistic(db, da)
    assert 0.0 <= k1 <= 1.0
    assert abs(k1 - k2) <= 1e-12


@given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**31 - 1))
@settings(max_examples=50, deadline=None)
def test_bmp_roundtrip_any_shape(h, w, seed):
    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


@given(st.integers(0, 4000), st.sampled_from([8000, 16000, 44100]), st.integers(0, 2**31 - 1))
@settings(max_examples=50, deadline=None)
def test_wav_roundtrip_any_length(n, rate, seed):
    samp = (
        np.random.default_rng(seed).integers(-32768, 32768, size=n).astype(np.int16)
    )
    got_rate, got = decode_wav(encode_wav_pcm16(samp, rate))
    assert got_rate == rate and np.array_equal(got, samp)


@given(st.binary(min_size=0, max_size=200))
@settings(max_examples=80, deadline=None)
def test_bmp_decoder_never_hangs_or_segfaults(payload):
    """Garbage in → ValueError/struct.error out (the exact exceptions
    extract_features catches), never anything else."""
    try:
        decode_bmp(b"BM" + payload)
    except (ValueError, struct.error):
        pass


@given(st.integers(0, 2**31 - 1), st.integers(2, 12))
@settings(max_examples=25, deadline=None)
def test_kmeans_deterministic(seed, k):
    sample = np.random.default_rng(seed).standard_normal((200, 8))
    c1 = _kmeans_fit(sample.copy(), k, seed=42)
    c2 = _kmeans_fit(sample.copy(), k, seed=42)
    assert np.array_equal(c1, c2)
    assert c1.shape == (k, 8)


# --------------------------------------------------------------- simhash

_token = st.text(
    alphabet=st.characters(blacklist_categories=("Zs", "Cc", "Cs")),
    min_size=1,
    max_size=8,
)
_doc = st.one_of(
    st.none(),
    st.lists(_token, min_size=0, max_size=30).map(" ".join),
)


@given(st.lists(_doc, min_size=1, max_size=40))
@settings(max_examples=80, deadline=None)
def test_simhash_vectorized_matches_reference_loop(texts):
    """The bit-plane bincount kernel (r3) must be bit-identical to the
    straightforward per-row/per-token vote loop for arbitrary unicode
    tokens, repeats, empties and nulls."""
    import hashlib

    import pandas as pd

    from hdfs_anomaly_detection_spark.operators.dedup import _simhash64_batch

    def reference(text):
        if text is None:
            return 0
        acc = [0] * 64
        for tok in str(text).lower().split():
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            for i in range(64):
                acc[i] += 1 if (h >> i) & 1 else -1
        val = 0
        for i in range(64):
            if acc[i] > 0:
                val |= 1 << i
        return val - (1 << 64) if val >= (1 << 63) else val

    got = _simhash64_batch(pd.Series(texts, dtype=object)).tolist()
    assert got == [reference(t) for t in texts]


@given(
    st.integers(1, 6), st.integers(1, 9), st.integers(1, 9),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=50, deadline=None)
def test_y4m_roundtrip_any_shape(n, h, w, seed):
    fr = np.random.default_rng(seed).integers(
        0, 256, size=(n, h, w, 3), dtype=np.uint8
    )
    assert np.array_equal(decode_y4m(encode_y4m(fr)), fr)
