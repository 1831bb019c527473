"""Structured-Streaming validation of a transcripts stream.

Reference lifecycle being reproduced (Spark-first): Kafka source →
from_json flatten → null filter → foreachBatch
(``cloud-deployment/spark_job.py:72-197``), with its 10 s processing
trigger and checkpointLocation (``:196,:54``) — but where the reference
collapsed every micro-batch to the driver (``:113`` df.collect()), we
keep the whole check pipeline inside the streaming plan:

* row-level constraint predicates and stream-static dimension joins run
  per micro-batch fully distributed (append mode);
* violation counts aggregate into event-time tumbling windows behind a
  watermark (the reference has NO late-data story — restarts silently
  skip data, ``spark_job.py:77-78``; the watermark + manifest pair is
  the fix);
* checks that need global state across the stream (Unique, ordering,
  drift) run in ``foreachBatch`` through the batch ValidationJob, so
  each epoch lands in the manifest table idempotently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hdfs_anomaly_detection_spark.constraints.dsl import (
    Check,
    InSet,
    NotNull,
    Range,
    RefIntegrity,
    Regex,
)
from hdfs_anomaly_detection_spark.constraints.runner import ValidationRunner

# checks whose plan is append-mode-safe (no global shuffle state)
STREAM_SAFE_TYPES = (NotNull, Range, InSet, Regex, RefIntegrity)


def stream_checks(checks: list[Check]) -> list[Check]:
    return [c for c in checks if isinstance(c, STREAM_SAFE_TYPES)]


def streaming_violations(
    stream_df: DataFrame,
    checks: list[Check],
    dims: dict[str, DataFrame] | None = None,
    n_buckets: int = 32,
) -> DataFrame:
    """Per-row violation stream (append mode): same plan builders as the
    batch runner — predicates + stream-static dim joins + struct-array
    explode — applied to an unbounded DataFrame. Keeps the event ``ts``
    so downstream windowing can watermark."""
    safe = stream_checks(checks)
    runner = ValidationRunner(
        safe, n_buckets=n_buckets, dims=dims or {}, carry_cols=("ts",)
    )
    flagged, flags = runner._flagged(stream_df)
    if not flags:
        raise ValueError("no stream-safe checks supplied")
    structs = [
        F.when(
            F.col(col),
            F.struct(
                F.lit(chk.name).alias("check_id"),
                F.lit(runner._column_of(chk)).alias("column"),
                runner._detail(chk, col).alias("detail"),
            ),
        )
        for chk, col in flags
    ]
    return flagged.select(
        "part_id", "conv_id", "turn_idx", "ts",
        F.explode(F.array_compact(F.array(*structs))).alias("v"),
    ).select(
        "part_id",
        F.col("v.check_id").alias("check_id"),
        "conv_id",
        "turn_idx",
        "ts",
        F.col("v.column").alias("column"),
        F.col("v.detail").alias("detail"),
    )


def windowed_violation_counts(
    violations_stream: DataFrame,
    watermark: str = "10 minutes",
    window: str = "5 minutes",
) -> DataFrame:
    """Event-time tumbling violation counts behind a watermark (append
    mode): one row per (window, part_id, check_id) once the watermark
    passes — the streaming analogue of the per-partition verdict."""
    return (
        violations_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "part_id", "check_id")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "part_id",
            "check_id",
            "n_violations",
        )
    )


def foreach_batch_validator(job) -> callable:
    """foreachBatch hook running the FULL batch validation (uniqueness,
    ordering, drift) per epoch through a manifest-checkpointed
    ValidationJob — exactly-once via the manifest fingerprint, replacing
    the reference's silently-complete epochs (``spark_job.py:144-153``).
    """

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        job.run(batch_df, run_id=f"epoch-{epoch_id}")

    return handle
