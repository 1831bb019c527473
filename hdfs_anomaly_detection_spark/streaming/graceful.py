"""Graceful stop / drain for streaming validation queries.

The reference's streaming loop has no shutdown story: its job is
killed mid-batch and the next start silently replays or skips work
(hasb73/hdfs-anomaly-detection ``cloud-deployment/spark_job.py:193-197``
— a bare ``query.awaitTermination()``). OS signal handling is the
wrong tool on a cluster — signals reach the driver process only, and a
JVM shutdown hook cannot wait for an in-flight micro-batch — so the
idiomatic cluster-safe pattern is a **stop marker where the data
lives**: an operator (or orchestrator) drops a small marker file on
the shared filesystem; the driver-side monitor notices it, waits for
the in-flight trigger to go idle (i.e. the current epoch has fully
committed to the sink and the checkpoint), then stops the query. A
later restart resumes exactly after the last completed epoch.

Interplay with the rest of the engine:

* ``foreach_batch_validator`` epochs are manifest-idempotent and the
  heavy-hitter folds are epoch-watermarked, so even the unavoidable
  race (a new trigger starting between the idle check and ``stop()``)
  only causes a replayed — never a corrupted or double-counted —
  epoch. Drain makes the clean boundary the common case; idempotent
  epochs make the race window harmless.
* Backpressure is the source-side pair of this module: bound each
  epoch with ``maxFilesPerTrigger`` (files) / ``maxOffsetsPerTrigger``
  (kafka) so "wait for the in-flight trigger" is a bounded wait, not
  an unbounded one over a backlog-sized batch.

All marker IO goes through :mod:`hdfs_anomaly_detection_spark.hadoop_io`
so the same code works on ``file:``, ``hdfs://`` and ``s3a://``.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession

from hdfs_anomaly_detection_spark.hadoop_io import hadoop_fs, write_small

TERMINATED = "terminated"
DRAINED = "drained"
GRACE_EXPIRED = "grace_expired"


def request_stop(spark: SparkSession, marker_path: str, reason: str = "") -> None:
    """Ask every monitor watching ``marker_path`` to drain and stop.
    Safe to call from any process that can reach the filesystem — the
    driver never needs to receive a signal."""
    write_small(spark, marker_path, f"{time.time()}\n{reason}")


def stop_requested(spark: SparkSession, marker_path: str) -> bool:
    fs, jpath, _ = hadoop_fs(spark, marker_path)
    return bool(fs.exists(jpath))


def clear_stop(spark: SparkSession, marker_path: str) -> None:
    """Remove the marker (idempotent) so the next run starts live."""
    fs, jpath, _ = hadoop_fs(spark, marker_path)
    if fs.exists(jpath):
        fs.delete(jpath, False)


def await_drain(
    query,
    spark: SparkSession,
    marker_path: str,
    poll_secs: float = 1.0,
    grace_secs: float | None = None,
) -> str:
    """Block on ``query`` until it terminates on its own or the stop
    marker appears; on a stop request, wait for the in-flight trigger
    to go idle (last epoch committed) before stopping.

    Returns one of:

    * ``"terminated"`` — the query ended on its own, before or during
      the drain (e.g. an ``availableNow`` trigger ran out of input, or
      it failed — a query exception re-raises here exactly as
      ``awaitTermination`` would); never conflated with ``"drained"``,
      so orchestrators can rely on ``"drained"`` meaning "stopped
      early, unprocessed backlog may remain";
    * ``"drained"`` — stop marker seen, in-flight epoch completed,
      query stopped at an epoch boundary;
    * ``"grace_expired"`` — stop marker seen but the in-flight trigger
      outlived ``grace_secs``; the query is stopped anyway and the
      interrupted epoch will replay on restart (idempotently, for the
      engine's manifest-checkpointed sinks).

    ``grace_secs`` counts from the moment the stop request is seen.
    The marker is deliberately NOT cleared here: a drain that races a
    concurrent restart must stop that restart too; call
    :func:`clear_stop` when the pipeline should come back up.

    Saturated-backlog caveat: Spark has no public "stop after the
    current epoch" API, so the boundary is caught by observing the
    trigger go idle. Under a deep backlog back-to-back triggers leave
    only a millisecond-scale idle gap; the 2 ms driver-side spin below
    catches most such gaps, but when the source saturates the trigger
    continuously a clean boundary may never be observable and the
    grace kill is the designed outcome — safe exactly because the
    engine's epoch sinks are idempotent (manifest fingerprints /
    epoch-watermarked folds), so the interrupted epoch replays without
    double effects. Pair a non-idempotent custom sink with a bounded
    epoch (``maxFilesPerTrigger``/``maxOffsetsPerTrigger``) and a
    generous ``grace_secs``, or make it idempotent.
    """
    while True:
        # awaitTermination(timeout) doubles as the poll sleep and the
        # exception propagation point (streaming failures surface here)
        if query.awaitTermination(poll_secs):
            return TERMINATED
        if stop_requested(spark, marker_path):
            break
    deadline = (
        time.monotonic() + grace_secs if grace_secs is not None else None
    )
    while query.isActive and query.status.get("isTriggerActive"):
        if deadline is not None and time.monotonic() >= deadline:
            query.stop()
            query.awaitTermination()
            return GRACE_EXPIRED
        # tight spin: the idle window between back-to-back triggers can
        # be milliseconds wide; a coarse poll would sample past it
        time.sleep(0.002)
    if not query.isActive:
        # the query ended on its own while we were draining — report
        # that (and surface its exception, if any), not a clean drain
        query.awaitTermination()
        return TERMINATED
    query.stop()
    query.awaitTermination()
    return DRAINED
