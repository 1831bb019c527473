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
  rewrites ONLY the touched cell partitions, durably: the merged cells
  are staged to an underscore-prefixed directory (invisible to parquet
  reads) and swapped in AFTER the stage write commits, with a marker
  file that lets any later open finish an interrupted swap — a crash
  at any point loses nothing (a single ``MERGE INTO`` on Iceberg).

**Concurrency contract: single writer.** Qdrant serializes concurrent
point upserts server-side; this store is a directory of files with no
server, so ``write``/``append``/``upsert`` take a best-effort lock
(atomic create of a ``_WRITE_LOCK`` sentinel): a second concurrent
writer fails fast with :class:`ConcurrentWriteError` instead of
interleaving deletes and renames. A writer that crashed while holding
the lock leaves the sentinel behind — call :meth:`unlock` to break it
(the staged-swap recovery guarantees the data itself needs no repair).
The create-exclusive primitive is atomic on HDFS and the local FS;
object stores without it (S3A) get best-effort locking only — use the
Iceberg path for true multi-writer safety.

Readers never take the lock, so DURABILITY ≠ reader isolation: a read
that races a live writer's swap can observe a touched cell mid-swap
(momentarily absent) — no data is ever durably lost, but point-in-time
consistent reads under concurrent writes are Iceberg's job
(snapshot isolation), not a bare parquet directory's.

All sidecar/marker/lock IO goes through the Hadoop FileSystem API —
the store works unchanged on ``hdfs://`` / ``s3a://`` paths, not just
the local filesystem.

``nprobe >= n_centroids`` probes everything and is EXACTLY the
brute-force answer — the equivalence the tests pin.
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdfs_anomaly_detection_spark.operators.similarity import (
    cosine_topk,
    ivf_cell_expr,
    ivf_index,
    ivf_probe_cells_expr,
    nearest_cells,
    score_and_rank_topk,
)

_SIDECAR = "_centroids.json"
_STAGE = "_upsert_stage"
_MARKER = "_upsert_stage/_READY"
_LOCK = "_WRITE_LOCK"


class ConcurrentWriteError(RuntimeError):
    """A second writer tried to acquire the store's write lock."""


class VectorStore:
    """A partition-pruned vector table at ``path`` (parquet layout)."""

    def __init__(self, path: str) -> None:
        self.path = path.rstrip("/")

    # ------------------------------------------------------- hadoop fs io

    @staticmethod
    def _active_spark(spark: SparkSession | None) -> SparkSession:
        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError("no active SparkSession for VectorStore IO")
        return spark

    def _fs(self, spark: SparkSession, rel: str):
        """(FileSystem, Path) for ``{self.path}/{rel}`` via the shared
        ``hadoop_io`` helper — same filesystem the dataframes write
        through, so the sidecar/marker/lock live wherever the data
        lives (hdfs/s3a/file), never silently on driver-local disk."""
        from hdfs_anomaly_detection_spark.hadoop_io import hadoop_fs

        fs, jpath, _ = hadoop_fs(spark, f"{self.path}/{rel}" if rel else self.path)
        return fs, jpath

    def _write_small(self, spark: SparkSession, rel: str, text: str) -> None:
        from hdfs_anomaly_detection_spark.hadoop_io import write_small

        write_small(spark, f"{self.path}/{rel}", text)

    def _read_small(self, spark: SparkSession, rel: str) -> str:
        from hdfs_anomaly_detection_spark.hadoop_io import read_small

        return read_small(spark, f"{self.path}/{rel}")

    def _exists(self, spark: SparkSession, rel: str) -> bool:
        fs, jpath = self._fs(spark, rel)
        return bool(fs.exists(jpath))

    def _delete(self, spark: SparkSession, rel: str) -> None:
        fs, jpath = self._fs(spark, rel)
        if fs.exists(jpath):
            fs.delete(jpath, True)

    # ------------------------------------------------------------- sidecar

    def _save_centroids(self, spark: SparkSession, cents: np.ndarray) -> None:
        self._write_small(spark, _SIDECAR, json.dumps({"centroids": cents.tolist()}))

    def centroids(self, spark: SparkSession | None = None) -> np.ndarray:
        spark = self._active_spark(spark)
        doc = json.loads(self._read_small(spark, _SIDECAR))
        return np.asarray(doc["centroids"], dtype=float)

    # ---------------------------------------------------------------- lock

    def _acquire_lock(self, spark: SparkSession) -> None:
        fs, jpath = self._fs(spark, _LOCK)
        root_fs, root = self._fs(spark, "")
        root_fs.mkdirs(root)
        # create-fail-if-exists: on HDFS the namenode create is atomic
        # and on the local FS the race loser gets False or a
        # FileAlreadyExistsException from the non-overwriting create —
        # either way exactly one writer proceeds. Object stores without
        # atomic create-exclusive (S3A) make this BEST-EFFORT only
        # (the class docstring says so); for true multi-writer safety
        # use the Iceberg path, whose commits are the lock.
        try:
            ok = bool(fs.createNewFile(jpath))
        except Exception as e:  # py4j-wrapped FileAlreadyExistsException
            if "exist" not in str(e).lower():
                raise  # a real IO failure, not a lost race
            ok = False
        if not ok:
            raise ConcurrentWriteError(
                f"another writer holds {self.path}/{_LOCK}; VectorStore is "
                "single-writer — if the previous writer crashed, call "
                ".unlock() to break the stale lock (staged-swap recovery "
                "makes that safe for the data)"
            )

    def unlock(self, spark: SparkSession | None = None) -> None:
        """Break the write lock (use after a writer crashed; see class
        docstring for the single-writer contract)."""
        self._delete(self._active_spark(spark), _LOCK)

    # ------------------------------------------------------------ recovery

    def _recover(self, spark: SparkSession) -> None:
        """Finish (or discard) an interrupted upsert. No marker ⇒ the
        stage write never committed: drop the stage, main data intact.
        Marker present ⇒ the staged cells are complete and durable:
        replay the swap (idempotent — see ``_commit_swap``)."""
        if self._exists(spark, _MARKER):
            plan = json.loads(self._read_small(spark, _MARKER))
            self._commit_swap(spark, plan["staged"], plan["empty"])
        elif self._exists(spark, _STAGE):
            self._delete(spark, _STAGE)

    def _commit_swap(self, spark: SparkSession, staged: list[int], empty: list[int]) -> None:
        """Swap staged cell directories into place; every step is
        idempotent so a crash mid-swap is healed by replaying:

        * staged cell, stage dir present → delete dest, rename into
          place (re-running after a crash between the two just renames);
        * staged cell, stage dir gone → that cell already swapped, skip
          (its dest now holds the NEW data — must not be deleted);
        * emptied cell (upsert moved/removed every row) → delete dest
          (re-delete is a no-op)."""
        fs, _ = self._fs(spark, "")
        jvm = spark.sparkContext._jvm
        for c in empty:
            self._delete(spark, f"cell={c}")
        for c in staged:
            src = jvm.org.apache.hadoop.fs.Path(f"{self.path}/{_STAGE}/cell={c}")
            if fs.exists(src):
                dest = jvm.org.apache.hadoop.fs.Path(f"{self.path}/cell={c}")
                if fs.exists(dest):
                    fs.delete(dest, True)
                fs.rename(src, dest)
        self._delete(spark, _STAGE)

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
        ``cell``. Returns the number of cells written. Single-writer
        (see class docstring).

        The previous contents are cleared EXPLICITLY (every child of the
        store dir except the write lock) before an append-mode write —
        ``mode("overwrite")`` on the root would delete the
        ``_WRITE_LOCK`` sentinel itself mid-job, silently voiding the
        single-writer contract for the whole rebuild. Consequences to
        know: a rebuild is NOT crash-atomic (a crash mid-write leaves a
        partial store with no sidecar — rebuild again, or build into a
        fresh path and switch paths for atomicity), and ``emb`` must not
        be a frame read FROM this store's own path (the explicit clear
        removes the source files out from under the lazy scan; use
        :meth:`upsert` for self-referential rewrites)."""
        spark = emb.sparkSession
        self._acquire_lock(spark)
        try:
            self._recover(spark)  # never leave a stale swap marker behind
            cents, assigned = ivf_index(
                emb, n_centroids, id_col=id_col, vec_col=vec_col, seed=seed
            )
            fs, root = self._fs(spark, "")
            if fs.exists(root):
                for st in fs.listStatus(root):
                    if st.getPath().getName() != _LOCK:
                        fs.delete(st.getPath(), True)
            (
                assigned.withColumnRenamed("__cell", "cell")
                .write.mode("append")
                .partitionBy("cell")
                .parquet(self.path)
            )
            self._save_centroids(spark, cents)
            return len(cents)
        finally:
            self._delete(spark, _LOCK)

    def append(
        self,
        emb: DataFrame,
        vec_col: str = "embedding",
    ) -> None:
        """Append-only fast path (ids known to be new): assign vectors
        with the FROZEN centroids (no retrain — cells stay stable);
        only the touched cell directories gain files. For replace-by-id
        semantics use :meth:`upsert`. Single-writer (see class
        docstring)."""
        spark = emb.sparkSession
        self._acquire_lock(spark)
        try:
            self._recover(spark)
            cents = self.centroids(spark)
            assigned = emb.withColumn("cell", ivf_cell_expr(vec_col, cents))
            assigned.write.mode("append").partitionBy("cell").parquet(self.path)
        finally:
            self._delete(spark, _LOCK)

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
        join — never an id collect); exactly those cell partitions are
        rewritten, everything else untouched — including a cell the
        move EMPTIED (dynamic partition overwrite alone would have left
        its stale row). Ids repeated WITHIN the incoming batch collapse
        to one arbitrary row first (a DataFrame has no order, so there
        is no meaningful "last write" inside a batch).

        Durability (stage-then-swap): the merged cells are written to
        ``_upsert_stage/`` FIRST — a directory parquet reads ignore
        (underscore prefix) and whose writes never overlap the files
        being read — then a ``_READY`` marker records the staged/emptied
        cell plan, and only then are the old cell directories swapped
        out (delete + rename per cell). A crash before the marker
        leaves the store untouched (stage is discarded on next open); a
        crash after it is completed by ``_recover`` on the next
        open — no point loses data in any window, matching the
        reference's durable Qdrant upsert. Single-writer (see class
        docstring); on Iceberg this whole method is one ``MERGE INTO``."""
        spark = emb.sparkSession
        self._acquire_lock(spark)
        try:
            self._recover(spark)
            cents = self.centroids(spark)
            new = emb.dropDuplicates([id_col]).withColumn(
                "cell", ivf_cell_expr(vec_col, cents)
            )
            table = self.read(spark, _recover=False)
            ids = new.select(id_col).distinct()
            touched = {
                int(r[0])
                for r in table.join(ids, id_col, "left_semi")
                .select("cell")
                .distinct()
                .collect()
            } | {int(r[0]) for r in new.select("cell").distinct().collect()}
            cells = sorted(touched)
            kept = table.filter(F.col("cell").isin(cells)).join(
                ids, id_col, "left_anti"
            )
            merged = kept.unionByName(new.select(*kept.columns))
            stage = f"{self.path}/{_STAGE}"
            (
                merged.write.mode("overwrite")
                .partitionBy("cell")
                .parquet(stage)
            )
            # the stage write is durably committed; record the swap plan —
            # cells with staged data vs cells the upsert emptied (Spark
            # writes no directory for a partition with zero rows). ONE
            # listStatus of the stage dir discovers exactly what the
            # write produced — not O(cells) sequential exists() RPCs
            fs, stage_jpath = self._fs(spark, _STAGE)
            staged_set = {
                int(st.getPath().getName().split("=", 1)[1])
                for st in fs.listStatus(stage_jpath)
                if st.getPath().getName().startswith("cell=")
            }
            staged = [c for c in cells if c in staged_set]
            empty = [c for c in cells if c not in staged_set]
            self._write_small(
                spark, _MARKER, json.dumps({"staged": staged, "empty": empty})
            )
            self._commit_swap(spark, staged, empty)
        finally:
            self._delete(spark, _LOCK)

    # -------------------------------------------------------------- read

    def read(self, spark: SparkSession, _recover: bool = True) -> DataFrame:
        if _recover and self._exists(spark, _MARKER):
            # a leftover marker means a writer died mid-swap: finish it —
            # but only under the lock, so we never race a LIVE writer's
            # own swap (if the writer is live, it will finish). A lock
            # we CANNOT take is ambiguous — live writer about to finish,
            # or a crashed one whose half-swapped state would otherwise
            # be served silently forever — so say so loudly instead of
            # passing in silence; unlock() is the documented repair.
            try:
                self._acquire_lock(spark)
            except ConcurrentWriteError:
                import warnings

                warnings.warn(
                    f"vector store {self.path} has a pending upsert swap "
                    f"(_READY marker) AND a held write lock: if the writer "
                    f"is live this read may see touched cells mid-swap; if "
                    f"it crashed, results will keep missing swapped cells "
                    f"until .unlock() lets the next read replay the swap",
                    RuntimeWarning,
                    stacklevel=2,
                )
            else:
                try:
                    self._recover(spark)
                finally:
                    self._delete(spark, _LOCK)
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
        cells = nearest_cells(self.centroids(spark), query_vec, nprobe)
        probe = self.read(spark).filter(F.col("cell").isin(cells))
        return cosine_topk(probe, query_vec, k, id_col, vec_col)

    def query_batch(
        self,
        queries: DataFrame,
        k: int = 10,
        nprobe: int = 4,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        qid_col: str = "qid",
        qvec_col: str = "qvec",
    ) -> DataFrame:
        """Top-k for a whole TABLE of query vectors in ONE distributed
        plan — the scale path when the workload is "score a batch"
        (the reference's per-prediction loop,
        ``anomaly_detection_service.py:316-438``, issues one Qdrant
        call per line; a driver loop over :meth:`query` would do the
        same). Returns (qid, vec_id, sim, rk), k rows per query.

        Shape: each query row gets its ``nprobe`` probe cells JVM-side
        (``ivf_probe_cells_expr`` — no driver loop, no collect),
        explodes to (qid, cell) and broadcast-joins the store on the
        ``cell`` PARTITION column. The union of all queries' probe
        cells is applied as a static partition filter (one O(|cells|)
        driver reduction over the broadcast-sized query batch), so the
        scan opens only probed directories; the per-(qid, cell)
        candidate scoring then happens where the data lives, and the
        rank-filter-adjacent window plans a Partial WindowGroupLimit
        (map-side k-heap per qid) above it. ``nprobe >= n_centroids``
        is exactly the brute-force answer for every query (the
        equivalence the tests pin)."""
        spark = self._active_spark(queries.sparkSession)
        cents = self.centroids(spark)
        q = queries.select(
            F.col(qid_col).alias("qid"),
            F.col(qvec_col).alias("__qv"),
            F.explode(
                ivf_probe_cells_expr(qvec_col, cents, nprobe)
            ).alias("cell"),
        ).localCheckpoint()  # evaluate the probe assignment ONCE — the
        # collect below and the broadcast join both reuse it (queries
        # are broadcast-sized by contract, so materializing is cheap)
        # static union-of-probes partition filter: the query batch is
        # broadcast-sized by construction, so collecting its distinct
        # cells is O(n_centroids) — and it turns the join's partition
        # pruning from dynamic (DPP, runtime-dependent) into a plain
        # PartitionFilters prune the scan does before opening any file
        probed = sorted({int(r[0]) for r in q.select("cell").distinct().collect()})
        table = self.read(spark).filter(F.col("cell").isin(probed))
        return score_and_rank_topk(
            table.join(F.broadcast(q), "cell"), k, id_col, vec_col
        )
