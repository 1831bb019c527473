from hdfs_anomaly_detection_spark.streaming.validate_stream import (  # noqa: F401
    STREAM_SAFE_TYPES,
    stream_checks,
    streaming_violations,
    windowed_violation_counts,
    foreach_batch_validator,
)
