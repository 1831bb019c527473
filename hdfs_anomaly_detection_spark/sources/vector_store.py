"""Cell-partitioned vector table: the engine's vector-store sink.

Reference analogue: the Qdrant collection the service upserts scored
embeddings into and probes for reuse/similarity
(``anomaly-detection-service/anomaly_detection_service.py:440-454`` and
the collection bootstrap in ``helper-scripts/qdrant_setup.py``). A
100-TB Spark pipeline doesn't want a row-at-a-time network client in an
executor loop; the Spark-native equivalent is a TABLE laid out so the
storage engine does the index's job:

* **write** — vectors are assigned their IVF coarse cell JVM-side
  (``operators.similarity.ivf_cell_expr``: K literal centroids,
  whole-stage codegen) and written ``partitionBy(cell)``. The trained
  centroids land in a tiny JSON sidecar next to the data (on Iceberg
  they would be table properties; same idea).
* **query** — the ``nprobe`` cells nearest the query vector are
  computed driver-side from the sidecar (O(K) floats), and the scan
  reads ONLY those directories: partition pruning replaces the ANN
  service's inverted lists. Inside the probed cells the exact
  brute-force ``cosine_topk`` two-stage top-k runs (plan-audited, no
  single-partition exchange).
* **append / upsert** — new vectors are assigned with the SAME frozen
  centroids (read back from the sidecar), so cells stay consistent
  without retraining. ``append`` is the ids-known-new fast path;
  ``upsert`` gives the reference's replace-by-id point semantics and
  rewrites ONLY the touched cell partitions (dynamic partition
  overwrite; a single ``MERGE INTO`` on Iceberg).

``nprobe >= n_centroids`` probes everything and is EXACTLY the
brute-force answer — the equivalence the tests pin.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdfs_anomaly_detection_spark.operators.similarity import (
    cosine_topk,
    ivf_cell_expr,
    ivf_index,
    nearest_cells,
)

_SIDECAR = "_centroids.json"


class VectorStore:
    """A partition-pruned vector table at ``path`` (parquet layout)."""

    def __init__(self, path: str) -> None:
        self.path = path.rstrip("/")

    # ------------------------------------------------------------- sidecar

    def _sidecar_path(self) -> str:
        return f"{self.path}/{_SIDECAR}"

    def _save_centroids(self, cents: np.ndarray) -> None:
        os.makedirs(self.path, exist_ok=True)
        with open(self._sidecar_path(), "w") as f:
            json.dump({"centroids": cents.tolist()}, f)

    def centroids(self) -> np.ndarray:
        with open(self._sidecar_path()) as f:
            return np.asarray(json.load(f)["centroids"], dtype=float)

    # -------------------------------------------------------------- write

    def write(
        self,
        emb: DataFrame,
        n_centroids: int = 16,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        seed: int = 42,
    ) -> int:
        """(Re)build the store: train the coarse quantizer on a bounded
        sample, assign every vector JVM-side, write partitioned by
        ``cell``. Returns the number of cells written."""
        cents, assigned = ivf_index(
            emb, n_centroids, id_col=id_col, vec_col=vec_col, seed=seed
        )
        (
            assigned.withColumnRenamed("__cell", "cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(self.path)
        )
        self._save_centroids(cents)
        return len(cents)

    def append(
        self,
        emb: DataFrame,
        vec_col: str = "embedding",
    ) -> None:
        """Append-only fast path (ids known to be new): assign vectors
        with the FROZEN centroids (no retrain — cells stay stable);
        only the touched cell directories gain files. For replace-by-id
        semantics use :meth:`upsert`."""
        cents = self.centroids()
        assigned = emb.withColumn("cell", ivf_cell_expr(vec_col, cents))
        assigned.write.mode("append").partitionBy("cell").parquet(self.path)

    def upsert(
        self,
        emb: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        """Replace-by-id upsert (the reference's Qdrant point-upsert
        semantics, ``spark_job.py:155-189``): incoming ids REPLACE any
        stored version, including one whose new embedding moves it to a
        different cell. Touched cells = cells the new rows land in ∪
        cells holding old versions of those ids (found via a left-semi
        join — never an id collect); exactly those partition
        directories are deleted and rewritten, everything else is
        untouched — including a cell the move EMPTIED, which dynamic
        partition overwrite alone would have left holding the stale row
        (a partition absent from the written data is never touched by
        it). Ids repeated WITHIN the incoming batch collapse to one
        arbitrary row first (a DataFrame has no order, so there is no
        meaningful "last write" inside a batch). The merged frame is
        localCheckpoint-materialized before the directories are
        cleared because it reads the same files it replaces; on
        Iceberg this whole method is a single ``MERGE INTO`` with no
        staging."""
        spark = emb.sparkSession
        cents = self.centroids()
        new = emb.dropDuplicates([id_col]).withColumn(
            "cell", ivf_cell_expr(vec_col, cents)
        )
        table = self.read(spark)
        ids = new.select(id_col).distinct()
        touched = {
            int(r[0])
            for r in table.join(ids, id_col, "left_semi")
            .select("cell")
            .distinct()
            .collect()
        } | {int(r[0]) for r in new.select("cell").distinct().collect()}
        cells = sorted(touched)
        kept = table.filter(F.col("cell").isin(cells)).join(ids, id_col, "left_anti")
        merged = kept.unionByName(new.select(*kept.columns)).localCheckpoint()
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        for c in cells:
            jpath = jvm.org.apache.hadoop.fs.Path(f"{self.path}/cell={c}")
            fs = jpath.getFileSystem(conf)
            if fs.exists(jpath):
                fs.delete(jpath, True)
        merged.write.mode("append").partitionBy("cell").parquet(self.path)

    # -------------------------------------------------------------- read

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    def query(
        self,
        spark: SparkSession,
        query_vec: list[float],
        k: int = 10,
        nprobe: int = 4,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Top-k by cosine within the ``nprobe`` nearest cells. The
        ``cell`` predicate hits a PARTITION column, so the scan's
        ``PartitionFilters`` prune every other directory before any
        file is opened."""
        cells = nearest_cells(self.centroids(), query_vec, nprobe)
        probe = self.read(spark).filter(F.col("cell").isin(cells))
        return cosine_topk(probe, query_vec, k, id_col, vec_col)
