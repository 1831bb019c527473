from hdfs_anomaly_detection_spark.stats.column_stats import (  # noqa: F401
    column_stats,
    length_histogram,
    numeric_histogram,
)
