"""Text canonicalization / token counting / lang-id / quality scoring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdfs_anomaly_detection_spark.functions.text import (
    canonicalize,
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)


@pytest.fixture(scope="module")
def run_expr(spark):
    def go(expr, text):
        return (
            spark.createDataFrame([(text,)], "t string")
            .select(expr.alias("v"))
            .first()["v"]
        )

    return go


def test_canonicalize_masks_entities(run_expr):
    out = run_expr(
        canonicalize("t"),
        "ERROR 2024-01-02 10:11:12 node 10.0.0.1:8020 block 0xDEADBEEF size 4096",
    )
    assert "<ts>" in out and "<ip>" in out and "<hex>" in out and "<num>" in out
    assert "2024" not in out and "10.0.0.1" not in out
    assert out == out.lower()
    assert "  " not in out  # whitespace collapsed


def test_canonicalize_is_stable_under_renumbering(run_expr):
    a = run_expr(canonicalize("t"), "Sent 4096 bytes to 10.0.0.1 at 2024-01-02 10:11:12")
    b = run_expr(canonicalize("t"), "Sent 8192 bytes to 192.168.7.9 at 2025-06-07 01:02:03")
    assert a == b


def test_token_count(run_expr):
    assert run_expr(token_count("t"), "Hello, world!  This is   four") == 5
    assert run_expr(token_count("t"), "   ") == 0
    assert run_expr(token_count("t"), "one") == 1


def test_lang_id(run_expr):
    assert run_expr(lang_id("t"), "the cat sat on the mat and it was good") == "en"
    assert run_expr(lang_id("t"), "el perro y la casa que se ve en los arboles") == "es"
    assert run_expr(lang_id("t"), "der Hund und die Katze ist nicht von hier") == "de"
    assert run_expr(lang_id("t"), "le chat et la maison est dans les arbres") == "fr"
    assert run_expr(lang_id("t"), "zzz qqq xxx") == "und"


def test_quality_score_ordering(run_expr):
    good = "the quick brown fox jumps over the lazy dog and it was a good day for everyone"
    bad = "!!! ??? 12345 67890 @@@@ #### 00000 11111"
    g = run_expr(quality_score("t"), good)
    b = run_expr(quality_score("t"), bad)
    assert 0.0 <= b < g <= 1.0


def test_doc_fingerprint_canonical_equivalence(run_expr):
    a = run_expr(doc_fingerprint("t"), "sent 100 bytes at 2024-01-02 10:11:12")
    b = run_expr(doc_fingerprint("t"), "Sent 999 bytes at 2023-05-06 07:08:09")
    c = run_expr(doc_fingerprint("t"), "something entirely different")
    assert a == b != c


def test_winnow_fingerprints_match_python_oracle(spark):
    import hashlib

    from hdfs_anomaly_detection_spark.functions.text import winnow_fingerprints

    docs = [
        (1, "The quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "completely different content with no overlap whatsoever in this text"),
        (3, "zz The quick brown fox jumps over the lazy dog near the river bank yy"),
        (4, "tiny"),
        (5, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = winnow_fingerprints(df, k=8, window=16, dialect_common=True).toPandas()

    def py_winnow(text, k=8, window=16):
        t = text.lower()
        n = max(len(t) - (k - 1), 1)
        h = [int(hashlib.md5(t[i : i + k].encode()).hexdigest()[:8], 16) for i in range(n)]
        if len(h) >= window:
            return {min(h[j : j + window]) for j in range(len(h) - window + 1)}
        return {min(h)}

    for did, text in docs:
        expected = py_winnow(text)
        actual = set(got[got["id"] == did]["fp"])
        assert actual == expected, f"doc {did}"
    # overlap property: docs 1 and 3 share a long run => share fingerprints;
    # doc 2 shares none with doc 1
    f1 = set(got[got["id"] == 1]["fp"])
    f2 = set(got[got["id"] == 2]["fp"])
    f3 = set(got[got["id"] == 3]["fp"])
    assert f1 & f3 and not f1 & f2


def test_winnow_buzhash_default_path_matches_python_oracle(spark):
    """Default (production) hash family is Buzhash: chars mixed once,
    gram = XOR of rotations — replayed bit-exactly in Python over
    unsigned-64 arithmetic (r3: replaces per-gram xxhash64-of-substring
    with register-only ops)."""
    from hdfs_anomaly_detection_spark.functions.text import (
        _BUZ_MULT,
        _BUZ_SALT,
        winnow_fingerprints,
    )

    docs = [
        (1, "The quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "completely different content with no overlap whatsoever in this text"),
        (3, "zz The quick brown fox jumps over the lazy dog near the river bank yy"),
        (4, "tiny"),
        (5, ""),
        (6, "unicode chars: héllo wörld ünïcode test padding padding padding!"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = winnow_fingerprints(df, k=8, window=16).toPandas()

    M = (1 << 64) - 1

    def mix(code):
        v = code * _BUZ_MULT
        v ^= v >> 29
        return v ^ _BUZ_SALT

    def rotl(v, r):
        return v if r == 0 else ((v << r) | (v >> (64 - r))) & M

    def signed(u):
        return u - (1 << 64) if u >= (1 << 63) else u

    def py_winnow(text, k=8, window=16):
        t = text.lower()
        codes = [mix(ord(ch)) for ch in t] or [mix(0)]  # split('')→[''] ascii 0
        n = max(len(codes) - (k - 1), 1)
        h = []
        for i in range(n):
            acc = 0
            for j in range(k):
                c = codes[i + j] if i + j < len(codes) else 0
                acc ^= rotl(c, k - 1 - j)
            h.append(signed(acc))
        if len(h) >= window:
            return {min(h[j : j + window]) for j in range(len(h) - window + 1)}
        return {min(h)}

    for did, text in docs:
        assert set(got[got["id"] == did]["fp"]) == py_winnow(text), f"doc {did}"
    # the winnowing overlap property must survive the hash-family swap
    f1 = set(got[got["id"] == 1]["fp"])
    f2 = set(got[got["id"] == 2]["fp"])
    f3 = set(got[got["id"] == 3]["fp"])
    assert f1 & f3 and not f1 & f2
