"""TextEquals invariant: exact rows, canonicalization tolerance, and the
precomputed-reference-hash fast path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdfs_anomaly_detection_spark.constraints import TextEquals, ValidationRunner
from hdfs_anomaly_detection_spark.constraints.runner import reference_hashes
from hdfs_anomaly_detection_spark.fixtures import (
    FixtureConfig,
    clean_transcripts,
    corrupted_transcripts,
)


@pytest.fixture(scope="module")
def pair(spark):
    cfg = FixtureConfig(n_conversations=200, text_mutation_rate=0.03)
    ref = clean_transcripts(spark, cfg)
    fact = corrupted_transcripts(spark, cfg)
    return cfg, ref, fact


def test_exact_mutated_rows_detected(pair, spark):
    cfg, ref, fact = pair
    res = ValidationRunner([TextEquals("te")], reference=ref, n_buckets=8).run(fact)
    got = {
        (r["conv_id"], r["turn_idx"])
        for r in res.violations.filter("check_id = 'te'").collect()
    }
    both = fact.alias("f").join(ref.alias("r"), ["conv_id", "turn_idx"])
    expected = {
        (r["conv_id"], r["turn_idx"])
        for r in both.filter(F.col("f.text") != F.col("r.text")).collect()
    }
    assert got == expected and len(expected) > 0


def test_precomputed_hashes_identical(pair, spark):
    _, ref, fact = pair
    chk = TextEquals("te")
    direct = ValidationRunner([chk], reference=ref, n_buckets=8).run(fact)
    hashed_ref = reference_hashes(ref, chk)
    assert set(hashed_ref.columns) == {"conv_id", "turn_idx", "canon_hash"}
    via_hash = ValidationRunner([chk], reference=hashed_ref, n_buckets=8).run(fact)
    key = ["conv_id", "turn_idx"]
    a = sorted(map(tuple, direct.violations.select(*key).toPandas().values.tolist()))
    b = sorted(map(tuple, via_hash.violations.select(*key).toPandas().values.tolist()))
    assert a == b and len(a) > 0


def test_canonicalization_tolerates_entity_renumbering(spark):
    # same text modulo timestamps/numbers → canonical equal → NO violation
    ref = spark.createDataFrame(
        [("c1", 0, "sent 100 bytes at 2024-01-02 10:11:12")],
        "conv_id string, turn_idx int, text string",
    )
    fact = spark.createDataFrame(
        [("c1", 0, "Sent 999 bytes at 2023-05-06 07:08:09")],
        "conv_id string, turn_idx int, text string",
    )
    res = ValidationRunner([TextEquals("te", canonicalize=True)], reference=ref).run(fact)
    assert res.violations.count() == 0
    strict = ValidationRunner([TextEquals("te", canonicalize=False)], reference=ref).run(fact)
    assert strict.violations.count() == 1
