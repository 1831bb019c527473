from hdfs_anomaly_detection_spark.sources.transcripts_view import (  # noqa: F401
    TRANSCRIPTS_CTE,
    load_table,
    load_transcripts,
    register_views,
)
from hdfs_anomaly_detection_spark.sources.vector_store import (  # noqa: F401
    ConcurrentWriteError,
    VectorStore,
)
