from hdfs_anomaly_detection_spark.constraints.dsl import (  # noqa: F401
    Check,
    Drift,
    InSet,
    MonotonicOrder,
    NotNull,
    Range,
    RefIntegrity,
    Regex,
    TextEquals,
    Unique,
    default_transcript_checks,
)
from hdfs_anomaly_detection_spark.constraints.runner import (  # noqa: F401
    ValidationResult,
    ValidationRunner,
)
