from hdfs_anomaly_detection_spark.functions.text import (  # noqa: F401
    canonicalize,
    token_count,
)
