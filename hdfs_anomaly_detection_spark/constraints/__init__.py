from hdfs_anomaly_detection_spark.constraints.dsl import (  # noqa: F401
    Check,
    Drift,
    Freshness,
    InSet,
    MonotonicOrder,
    NotNull,
    Range,
    RefIntegrity,
    Regex,
    SchemaConformance,
    TextEquals,
    Unique,
    default_transcript_checks,
)
from hdfs_anomaly_detection_spark.constraints.runner import (  # noqa: F401
    ValidationResult,
    ValidationRunner,
)
