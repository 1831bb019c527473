"""End-to-end spark-submit packaging test (north_rule: "run via
spark-submit --py-files"): build dist/engine.zip with the repo's
packaging script, launch a REAL spark-submit subprocess with a scrubbed
PYTHONPATH (the zip must be the only way the package resolves), and
check the job validates a corrupted fixture, writes its outputs, and
signals violations via exit code 2."""

from __future__ import annotations

import json
import os
import subprocess

import pytest

from hdfs_anomaly_detection_spark.fixtures import FixtureConfig, build_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    cfg = FixtureConfig(n_conversations=120, null_text_rate=0.03, dup_rate=0.02)
    fx = build_fixture(spark, cfg)
    inp, conv, tools = (str(tmp_path / d) for d in ("in", "conv", "tools"))
    out = str(tmp_path / "out")
    fx.fact.write.parquet(inp)
    fx.conversations.write.parquet(conv)
    fx.tools.write.parquet(tools)

    subprocess.run(
        ["bash", f"{REPO}/scripts/build_pyfiles.sh"], check=True, capture_output=True
    )

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", f"{REPO}/dist/engine.zip",
            f"{REPO}/scripts/run_validation_job.py",
            "--input", inp,
            "--conversations", conv,
            "--tools", tools,
            "--output", out,
            "--n-buckets", "8",
        ],
        env=env,
        cwd=str(tmp_path),  # NOT the repo: the zip must provide the package
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 2, proc.stderr[-3000:]  # violations found
    summary = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert summary["processed"] == 8 and summary["skipped"] == 0

    viol = spark.read.parquet(f"{out}/violations")
    verd = spark.read.parquet(f"{out}/verdicts")
    assert viol.count() > 0
    assert verd.filter("not passed").count() > 0
    man = spark.read.parquet(f"{out}/manifest").toPandas()
    assert set(man["part_id"]) == set(range(8))
    assert (man["status"] == "done").all()
