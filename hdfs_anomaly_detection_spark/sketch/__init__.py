from hdfs_anomaly_detection_spark.sketch.tdigest import (  # noqa: F401
    TDigest,
    build_partition_digests,
    metric_frame,
)
from hdfs_anomaly_detection_spark.sketch.cms import (  # noqa: F401
    CountMinSketch,
    build_cms,
    cms_estimate,
    heavy_hitters,
)
from hdfs_anomaly_detection_spark.sketch.drift import (  # noqa: F401
    drift_verdicts,
    exact_ks_by_group,
    ks_statistic,
    psi,
)
