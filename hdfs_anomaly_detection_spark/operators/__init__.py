from hdfs_anomaly_detection_spark.operators.dedup import (  # noqa: F401
    exact_dup_groups,
    dedup_keep_first,
    minhash_signatures,
    minhash_lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_candidate_pairs,
)
from hdfs_anomaly_detection_spark.operators.asof import (  # noqa: F401
    asof_join,
)
from hdfs_anomaly_detection_spark.operators.interval import (  # noqa: F401
    interval_join,
)
from hdfs_anomaly_detection_spark.operators.ranking import (  # noqa: F401
    global_row_number,
)
from hdfs_anomaly_detection_spark.operators.sampling import (  # noqa: F401
    rebalance_downsample,
    seeded_shard,
    seeded_shuffle_key,
    stratified_sample,
    stratified_sample_hash,
    uniform01,
)
from hdfs_anomaly_detection_spark.operators.similarity import (  # noqa: F401
    batch_topk,
    cosine_sim_expr,
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_index,
    ivf_probe_cells_expr,
    ivf_topk,
    lsh_bucketed_topk,
)
