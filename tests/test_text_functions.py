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
