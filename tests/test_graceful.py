"""Graceful stop-marker drain for streaming queries.

Proves the three return paths of ``await_drain`` and the property that
matters: a drain stops at an epoch boundary (every epoch in the sink
is complete) and a restart from the same checkpoint resumes exactly
after the last committed epoch — no loss, no duplicates. The reference
has no shutdown story at all (``cloud-deployment/spark_job.py:193-197``
is a bare awaitTermination); this is the cluster-safe replacement for
the SIGTERM handling a single-node service would use.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from hdfs_anomaly_detection_spark.streaming import (
    DRAINED,
    GRACE_EXPIRED,
    TERMINATED,
    await_drain,
    clear_stop,
    request_stop,
    stop_requested,
)


def _write_file(spark, path: str, file_id: int, n: int = 50) -> None:
    (
        spark.range(n)
        .select(
            F.lit(file_id).alias("file_id"),
            (F.lit(file_id * 1000) + F.col("id")).alias("row_id"),
        )
        .coalesce(1)
        .write.mode("append")
        .parquet(path)
    )


def test_marker_roundtrip(spark, tmp_path):
    marker = str(tmp_path / "_STOP")
    assert not stop_requested(spark, marker)
    request_stop(spark, marker, reason="deploy")
    assert stop_requested(spark, marker)
    clear_stop(spark, marker)
    assert not stop_requested(spark, marker)
    clear_stop(spark, marker)  # idempotent


def test_await_drain_terminated_on_own(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_file(spark, src, 0)
    marker = str(tmp_path / "_STOP")
    stream = spark.readStream.schema("file_id int, row_id long").parquet(src)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("g_term")
        .trigger(availableNow=True)
        .start()
    )
    assert await_drain(q, spark, marker, poll_secs=0.2) == TERMINATED
    assert not q.isActive
    assert spark.sql("SELECT count(*) c FROM g_term").first()["c"] == 50


def test_drain_stops_at_epoch_boundary_and_restart_resumes(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    marker = str(tmp_path / "_STOP")
    n_files = 6
    for i in range(n_files):
        _write_file(spark, src, i)

    out = str(tmp_path / "out")
    stream = (
        spark.readStream.schema("file_id int, row_id long")
        .option("maxFilesPerTrigger", 1)  # one file per epoch: bounded drain
        .parquet(src)
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")  # file sink: supports checkpoint recovery
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0.2 seconds")
        .start()
    )
    # let at least one epoch commit, then ask for the drain
    deadline = time.time() + 60
    while not any(p["numInputRows"] > 0 for p in q.recentProgress):
        assert time.time() < deadline, "no epoch committed within 60 s"
        time.sleep(0.2)
    request_stop(spark, marker)
    assert await_drain(q, spark, marker, poll_secs=0.2) == DRAINED
    assert not q.isActive

    first = spark.read.parquet(out).toPandas()
    # epoch-boundary stop: every file present in the sink is COMPLETE
    per_file = first.groupby("file_id").size()
    assert (per_file == 50).all(), f"partial epoch in sink: {per_file.to_dict()}"
    assert 0 < len(per_file) <= n_files

    # restart from the same checkpoint: exactly the unprocessed files
    # (plus one added while stopped) are delivered — no loss, no dupes
    _write_file(spark, src, n_files)
    clear_stop(spark, marker)
    q2 = (
        spark.readStream.schema("file_id int, row_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert await_drain(q2, spark, marker, poll_secs=0.2) == TERMINATED
    both = spark.read.parquet(out).toPandas()
    assert not both.duplicated().any(), "epoch replayed across the drain"
    assert len(both) == (n_files + 1) * 50, "rows lost across the drain"


class _StuckQuery:
    """Minimal StreamingQuery stand-in whose trigger never goes idle —
    forces the grace-expiry path without a 24h-trigger real query."""

    def __init__(self):
        self.isActive = True
        self.stopped = False

    @property
    def status(self):
        return {"isTriggerActive": True, "isDataAvailable": True}

    def awaitTermination(self, timeout=None):
        if timeout is None:
            return None
        time.sleep(min(timeout, 0.01))
        return not self.isActive

    def stop(self):
        self.stopped = True
        self.isActive = False


def test_grace_expired_stops_anyway(spark, tmp_path):
    marker = str(tmp_path / "_STOP")
    request_stop(spark, marker)
    q = _StuckQuery()
    t0 = time.monotonic()
    out = await_drain(q, spark, marker, poll_secs=0.05, grace_secs=0.3)
    assert out == GRACE_EXPIRED
    assert q.stopped and not q.isActive
    assert time.monotonic() - t0 < 10


def test_natural_termination_during_drain_reports_terminated(spark, tmp_path):
    """A query that finishes on its own while the drain is waiting for
    the trigger to go idle must report TERMINATED, not DRAINED — an
    orchestrator reads DRAINED as 'backlog may remain, resume later'."""
    marker = str(tmp_path / "_STOP")
    request_stop(spark, marker)

    class _FinishesItself(_StuckQuery):
        def __init__(self):
            super().__init__()
            self._done_at = time.monotonic() + 0.2

        @property
        def isActive(self):
            return time.monotonic() < self._done_at

        @isActive.setter
        def isActive(self, v):  # base __init__ assigns it
            pass

    q = _FinishesItself()
    assert await_drain(q, spark, marker, poll_secs=0.05) == TERMINATED
    assert not q.stopped  # never stopped by us — it ended on its own


def test_drain_with_no_grace_waits_for_idle(spark, tmp_path):
    """grace_secs=None waits as long as the trigger is active; once the
    fake trigger goes idle the drain completes cleanly."""
    marker = str(tmp_path / "_STOP")
    request_stop(spark, marker)

    class _IdleSoon(_StuckQuery):
        def __init__(self):
            super().__init__()
            self._idle_at = time.monotonic() + 0.3

        @property
        def status(self):
            return {"isTriggerActive": time.monotonic() < self._idle_at}

    q = _IdleSoon()
    assert await_drain(q, spark, marker, poll_secs=0.05) == DRAINED
    assert q.stopped
