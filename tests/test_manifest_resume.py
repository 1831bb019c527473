"""Kill-and-resume semantics of the manifest checkpoint (SURVEY §5:
resume test — run a partition subset, re-run, assert idempotent
completion; reference analogue: the Redis skip-if-seen cache-hit path
``anomaly_detection_service.py:987-1003``)."""

from __future__ import annotations

import pandas as pd
import pytest

from hdfs_anomaly_detection_spark.constraints import (
    ValidationRunner,
    default_transcript_checks,
)
from hdfs_anomaly_detection_spark.fixtures import FixtureConfig, build_fixture
from hdfs_anomaly_detection_spark.manifest import ValidationJob

N_BUCKETS = 8


@pytest.fixture()
def setup(spark, tmp_path):
    cfg = FixtureConfig(
        n_conversations=200, null_text_rate=0.02, dup_rate=0.01, bad_role_rate=0.01
    )
    fx = build_fixture(spark, cfg)
    fact_path = str(tmp_path / "transcripts")
    fx.fact.write.mode("overwrite").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    runner = ValidationRunner(
        default_transcript_checks(dims=False), n_buckets=N_BUCKETS
    )
    job = ValidationJob(runner, str(tmp_path / "out"))
    return spark, fact, runner, job


def test_interrupted_then_resumed_equals_single_shot(setup):
    spark, fact, runner, job = setup
    # "crash" after 3 of 8 partitions
    s1 = job.run(fact, run_id="r1", max_parts=3)
    assert s1["processed"] == 3 and s1["skipped"] == 0
    # resume: picks up exactly the remaining 5
    s2 = job.run(fact, run_id="r2")
    assert s2["processed"] == 5 and s2["skipped"] == 3
    # third run: everything already done → no-op
    s3 = job.run(fact, run_id="r3")
    assert s3["processed"] == 0 and s3["skipped"] == 8

    # final outputs identical to a single-shot in-memory run
    direct = runner.run(fact)
    got_v = job.violations(spark).toPandas()
    exp_v = direct.violations.toPandas()
    key = ["part_id", "check_id", "conv_id", "turn_idx", "column", "detail"]
    got_sorted = got_v[key].astype(str).sort_values(key).reset_index(drop=True)
    exp_sorted = exp_v[key].astype(str).sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_sorted, exp_sorted)

    got_verd = job.verdicts(spark).toPandas()
    assert len(got_verd) == N_BUCKETS * len(runner.checks)

    man = job.manifest(spark).toPandas()
    assert set(man["part_id"]) == set(range(N_BUCKETS))
    assert (man["status"] == "done").all()
    assert man["part_id"].is_unique  # no partition processed twice


def test_rerun_is_idempotent_no_duplicates(setup):
    spark, fact, runner, job = setup
    job.run(fact, run_id="a")
    v1 = job.violations(spark).count()
    job.run(fact, run_id="b")  # no pending → writes nothing
    assert job.violations(spark).count() == v1


def test_changed_input_triggers_full_rerun(setup, spark, tmp_path):
    _, fact, runner, job = setup
    job.run(fact, run_id="a")
    # new input (different file set) → different fingerprint → all pending
    fx2 = build_fixture(spark, FixtureConfig(n_conversations=150, null_text_rate=0.05))
    p2 = str(tmp_path / "transcripts2")
    fx2.fact.write.mode("overwrite").parquet(p2)
    fact2 = spark.read.parquet(p2)
    s = job.run(fact2, run_id="b")
    assert s["skipped"] == 0 and s["processed"] > 0
    # violations reflect ONLY the new input (stale partitions cleared)
    direct = runner.run(fact2)
    assert job.violations(spark).count() == direct.violations.count()


def test_incremental_files_mode_recomputes_only_changed_partition(setup, spark, tmp_path):
    """Incremental revalidation (VERDICT r2): input laid out by the
    cluster-key bucket (the Iceberg-partitioned shape); after modifying
    ONE bucket's directory, re-run recomputes exactly that partition
    and the outputs equal a from-scratch run on the modified input."""
    import pyspark.sql.functions as F

    _, fact, runner, _ = setup
    p = str(tmp_path / "bucketed")
    fact.withColumn("pb", runner.pid_expr()).write.partitionBy("pb").parquet(p)
    job = ValidationJob(runner, str(tmp_path / "inc_out"))

    fact1 = spark.read.parquet(p).drop("pb")
    s1 = job.run(fact1, run_id="full")
    assert s1["processed"] == N_BUCKETS and s1["skipped"] == 0

    # unchanged input → complete no-op
    s2 = job.run(spark.read.parquet(p).drop("pb"), run_id="noop")
    assert s2["processed"] == 0 and s2["skipped"] == N_BUCKETS

    # corrupt one bucket's directory in place (new files, others untouched)
    sub = spark.read.parquet(f"{p}/pb=3").withColumn(
        "text", F.when(F.col("turn_idx") == 0, F.lit(None)).otherwise(F.col("text"))
    )
    sub.cache().count()  # read fully before overwriting the source dir
    sub.write.mode("overwrite").parquet(f"{p}/pb=3")
    sub.unpersist()

    fact3 = spark.read.parquet(p).drop("pb")
    s3 = job.run(fact3, run_id="inc")
    assert s3["processed"] == 1 and s3["skipped"] == N_BUCKETS - 1

    direct = runner.run(fact3)
    key = ["part_id", "check_id", "conv_id", "turn_idx", "column", "detail"]
    got = job.violations(spark).toPandas()[key].astype(str).sort_values(key)
    exp = direct.violations.toPandas()[key].astype(str).sort_values(key)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True)
    )
    direct.unpersist()


def test_incremental_content_mode_survives_full_rewrite(setup, spark, tmp_path):
    """Content fingerprints are layout-independent: rewriting the WHOLE
    table to a new path (every file name changes) with one
    conversation's rows modified re-runs ONLY the partition holding
    that conversation."""
    import pyspark.sql.functions as F

    _, fact, runner, _ = setup
    job = ValidationJob(
        runner, str(tmp_path / "content_out"), fingerprint_mode="content"
    )
    s1 = job.run(fact, run_id="full")
    assert s1["processed"] == N_BUCKETS

    conv = fact.select("conv_id").first()[0]
    changed = fact.withColumn(
        "text",
        F.when(F.col("conv_id") == conv, F.concat(F.col("text"), F.lit(" EDITED")))
        .otherwise(F.col("text")),
    )
    p2 = str(tmp_path / "rewritten")
    changed.write.parquet(p2)  # brand-new file set
    fact2 = spark.read.parquet(p2)

    s2 = job.run(fact2, run_id="inc")
    assert s2["processed"] == 1 and s2["skipped"] == N_BUCKETS - 1
    # the re-run partition is the one holding the edited conversation
    pid = fact2.filter(F.col("conv_id") == conv).select(
        runner.pid_expr().alias("p")
    ).first()[0]
    man = job.manifest(spark).toPandas()
    assert set(man[man["run_id"] == "inc"]["part_id"]) == {pid}


def test_files_fingerprint_scan_is_column_pruned(setup, spark, tmp_path):
    """The files-mode fingerprint scan must read ONLY the cluster-key
    column (conv_id) — never payloads: the whole point of incremental
    revalidation is that deciding what to skip costs a fraction of the
    work skipped."""
    _, fact, runner, job = setup
    plan = (
        job._files_frame(fact)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    m = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert m, plan[:2000]
    assert "ReadSchema: struct<conv_id:string>" in m[0], m[0]


def test_files_fingerprint_detects_name_stable_rewrite(setup, spark, tmp_path):
    """Review-found: a name-preserving in-place rewrite (distcp
    -overwrite, object-store PUT to the same key) must still invalidate
    the partition — the files basis carries split byte-lengths, not
    just names."""
    _, _, runner, _ = setup
    d = tmp_path / "csv_in"
    d.mkdir()
    f = d / "part-000.csv"
    f.write_text("conv_a\nconv_b\nconv_c\n")
    job = ValidationJob(runner, str(tmp_path / "fp_out"))

    fact1 = spark.read.schema("conv_id string").csv(str(d))
    fp1 = job.partition_fingerprints(fact1)

    # same file NAME, different content (and size)
    f.write_text("conv_a\nconv_b\nconv_c\nconv_added\n")
    fact2 = spark.read.schema("conv_id string").csv(str(d))
    fp2 = job.partition_fingerprints(fact2)

    changed = {p for p in fp1 if fp2.get(p) != fp1[p]}
    assert changed, "name-stable rewrite went undetected"


def test_content_mode_ignores_unvalidated_column_edit(setup, spark, tmp_path):
    """VERDICT r3 task 6: content fingerprints hash only the columns the
    checks READ. Rewriting the table (all-new files) with ONLY an
    untracked column edited must be a complete skip; editing a validated
    column in the same layout must re-run — the fingerprint basis is the
    checks' column set, not the physical row."""
    import pyspark.sql.functions as F

    from hdfs_anomaly_detection_spark.constraints import dsl

    _, fact, runner, _ = setup
    assert "meta" not in dsl.validated_columns(runner.checks)

    base = fact.withColumn("meta", F.lit("v1"))
    p1 = str(tmp_path / "meta1")
    base.write.parquet(p1)
    job = ValidationJob(
        runner, str(tmp_path / "cc_out"), fingerprint_mode="content"
    )
    s1 = job.run(spark.read.parquet(p1), run_id="full")
    assert s1["processed"] == N_BUCKETS

    # brand-new file set, only the untracked column differs → no-op
    p2 = str(tmp_path / "meta2")
    base.withColumn("meta", F.lit("v2")).write.parquet(p2)
    s2 = job.run(spark.read.parquet(p2), run_id="noop")
    assert s2["processed"] == 0 and s2["skipped"] == N_BUCKETS

    # same rewrite but a VALIDATED column changes in one conversation →
    # exactly that partition re-runs
    conv = fact.select("conv_id").first()[0]
    p3 = str(tmp_path / "meta3")
    base.withColumn("meta", F.lit("v3")).withColumn(
        "role",
        F.when(F.col("conv_id") == conv, F.lit("bogus")).otherwise(F.col("role")),
    ).write.parquet(p3)
    s3 = job.run(spark.read.parquet(p3), run_id="inc")
    assert s3["processed"] == 1 and s3["skipped"] == N_BUCKETS - 1


def test_validated_columns_covers_every_check_type():
    from hdfs_anomaly_detection_spark.constraints import dsl
    from hdfs_anomaly_detection_spark.constraints.dsl import (
        Drift,
        Freshness,
        MonotonicOrder,
        NotNull,
        RefIntegrity,
        SchemaConformance,
        TextEquals,
        Unique,
    )

    got = dsl.validated_columns(
        [
            NotNull("n", column="a"),
            Unique("u", columns=("k1", "k2")),
            RefIntegrity("r", fk=("fk1",), dim="d", pk=("pk",)),
            MonotonicOrder("m", partition_cols=("pc",), order_col="oc", tiebreak=("tb",)),
            TextEquals("t", column="txt", keys=("k1", "k3")),
            Drift("dl", metric="text_length"),
            Drift("dc", metric="turn_count"),
            Drift("dn", metric="score"),
            Freshness("f", ts_col="tsc"),
            SchemaConformance("s", expected_ddl="a string"),
        ]
    )
    # turn_count groups by conv_id; SchemaConformance reads no content
    assert got == {
        "a", "k1", "k2", "fk1", "pc", "oc", "tb", "txt", "k3", "text",
        "conv_id", "score", "tsc",
    }
