"""Vector-store sink: cell-partitioned table writes, partition-pruned
probes, frozen-centroid appends (SURVEY §2.1's last gap — the Qdrant
collection re-expressed as table layout)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdfs_anomaly_detection_spark.operators.similarity import cosine_topk
from hdfs_anomaly_detection_spark.sources import VectorStore

SF = "/root/testdata/sf0.001"
N_CELLS = 8


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    vs = VectorStore(str(tmp_path_factory.mktemp("vs") / "vectors"))
    n = vs.write(emb, n_centroids=N_CELLS)
    assert n == N_CELLS
    return vs, emb


def _qvec(emb):
    return [float(x) for x in emb.filter(F.col("vec_id") == 3).first()["embedding"]]


def test_full_probe_equals_brute_force(spark, store):
    """nprobe >= n_centroids probes every cell: the store's answer must
    be EXACTLY the brute-force cosine top-k over the raw frame."""
    vs, emb = store
    q = _qvec(emb)
    got = vs.query(spark, q, k=10, nprobe=N_CELLS).toPandas()
    exp = cosine_topk(emb, q, k=10).toPandas()
    assert got[["vec_id", "sim", "rk"]].values.tolist() == \
        exp[["vec_id", "sim", "rk"]].values.tolist()


def test_probe_is_partition_pruned(spark, store):
    """A small-nprobe probe must read ONLY the probed cell directories —
    the partition filter prunes before any file is opened."""
    vs, emb = store
    q = _qvec(emb)
    cents = vs.centroids()
    import numpy as np

    cells = {
        int(c)
        for c in np.argsort(((cents - np.asarray(q)) ** 2).sum(axis=1))[:2]
    }
    probe = vs.read(spark).filter(F.col("cell").isin([int(c) for c in cells]))
    # files ACTUALLY read (input_file_name reflects post-pruning scans;
    # DataFrame.inputFiles() lists the whole relation pre-pruning)
    files = {r[0] for r in probe.select(F.input_file_name()).distinct().collect()}
    all_files = {
        r[0]
        for r in vs.read(spark).select(F.input_file_name()).distinct().collect()
    }
    assert 0 < len(files) < len(all_files)
    assert all(any(f"cell={c}/" in f for c in cells) for f in files)
    # and the scan node carries the cell predicate as a PartitionFilter
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "cell" in pf, plan[:2000]


def test_append_uses_frozen_centroids(spark, store):
    """Appended vectors are assigned with the stored centroids (no
    retrain): a re-queried EXACT duplicate of an existing vector lands
    in the same cell and surfaces at sim 1.0."""
    vs, emb = store
    dup = emb.filter(F.col("vec_id") == 3).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding", "label"
    )
    vs.append(dup)
    q = _qvec(emb)
    got = vs.query(spark, q, k=2, nprobe=N_CELLS).toPandas()
    assert set(got["vec_id"]) == {3, 10_003}
    assert (got["sim"] == 1.0).all()
