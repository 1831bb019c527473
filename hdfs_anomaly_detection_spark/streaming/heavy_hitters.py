"""Streaming heavy hitters: Count-Min over micro-batches.

The batch operator (``sketch/cms.py``) is exact because it can re-scan
the input for the verify pass; a stream cannot be re-scanned, so the
streaming variant keeps the standard sketch-plus-candidates semantics
(Cormode & Muthukrishnan 2005 §4):

* Per micro-batch, ONE bounded aggregation builds the batch's d×w
  sketch (O(d·w) driver state, never O(keys)) and merges it into the
  running global sketch — the counter-wise merge algebra
  ``CountMinSketch.merge`` exists for exactly this.
* The batch's distinct keys are estimated against the RUNNING sketch
  (which at that moment counts every prior occurrence of the key);
  keys clearing the threshold enter the candidate table with their
  current global estimate, and existing candidates are refreshed.

Guarantees, stated honestly:

* A key whose true global count is >= threshold IS reported, provided
  it occurs at least once in some batch at-or-after crossing the
  threshold (heavy keys keep arriving by definition — a key that stops
  exactly at the threshold crossing can be missed by at most its final
  batch's contribution).
* Reported counts are CMS ESTIMATES: upper bounds, within
  e/width · N of truth with probability 1 - e^-depth. The batch
  operator's exact-verify pass needs a re-scannable input; run it over
  the landed data when exactness matters.
* False positives are possible (collision overestimates) — the same
  one-sided error as the batch admission filter, just not disposed of
  by an exact count.

Driver state is the d×w counter matrix plus the candidate dict —
bounded by design (candidates are keys estimated heavy at least once;
with a sane threshold that is the tail of the distribution, not the
key space).

Use inside ``foreachBatch`` — PASS THE EPOCH ID so replays dedupe::

    shh = StreamingHeavyHitters(key_col="user_id", threshold=1000)
    q = stream.writeStream.foreachBatch(
        lambda df, epoch: shh.update(df, epoch)).start()
    ...
    shh.current()   # {key: estimated_count} at any point

Failure semantics: foreachBatch re-delivers an epoch after a mid-batch
failure; ``update(df, epoch)`` skips epochs it has already folded
(the standard idempotency pattern), so retries never double-count.
State lives in driver memory — a query RESTART starts from zero unless
you checkpoint it yourself: call ``save(path)`` (e.g. at the end of
each update) and construct via ``load(path)`` on restart; snapshot IO
goes through the Hadoop FileSystem API (hdfs/s3a/file — same rule as
the vector-store sidecar) and the state is small: O(d·w) counters plus
the candidate dict.

Reference parity: the reference's running confusion-matrix counters
(``anomaly-detection-service/anomaly_detection_service.py:203-224``)
are the same pattern — bounded driver-side state folded per event —
generalized here to per-key frequency with sketch-bounded memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hdfs_anomaly_detection_spark.sketch.cms import (
    CountMinSketch,
    build_cms,
    cms_estimate,
)

__all__ = ["StreamingHeavyHitters"]


class StreamingHeavyHitters:
    """Cross-batch heavy-hitter tracker (see module docstring)."""

    def __init__(
        self,
        key_col: str,
        threshold: int,
        depth: int = 4,
        width: int = 2048,
    ) -> None:
        self.key_col = key_col
        self.threshold = int(threshold)
        self.depth = int(depth)
        self.width = int(width)
        self.sketch: CountMinSketch | None = None
        self.candidates: dict = {}
        self.last_epoch: int | None = None

    def update(self, batch_df: DataFrame, epoch_id: int | None = None) -> None:
        """Fold one micro-batch: merge its sketch, then admit/refresh
        candidates from the batch's distinct keys estimated against the
        merged (global-so-far) sketch. Two bounded passes over the
        PERSISTED batch (one source read) — the distinct-keys pass is
        map-side-combined, and only estimated-heavy keys reach the
        driver. Pass foreachBatch's ``epoch_id`` so a re-delivered
        epoch (mid-batch failure retry) folds exactly once."""
        if epoch_id is not None:
            if self.last_epoch is not None and epoch_id <= self.last_epoch:
                return  # replayed epoch — already folded
            self.last_epoch = int(epoch_id)
        batch_df = batch_df.persist()
        try:
            batch_sk = build_cms(
                batch_df, self.key_col, depth=self.depth, width=self.width
            )
            if batch_sk.total == 0:
                return
            self.sketch = (
                batch_sk if self.sketch is None else self.sketch.merge(batch_sk)
            )
            est = (
                batch_df.filter(F.col(self.key_col).isNotNull())
                .select(self.key_col)
                .distinct()
                .withColumn("__est", cms_estimate(self.sketch, self.key_col))
                .filter(F.col("__est") >= F.lit(self.threshold))
                .collect()
            )
            for r in est:
                self.candidates[r[self.key_col]] = int(r["__est"])
        finally:
            batch_df.unpersist()

    def current(self) -> dict:
        """{key: estimated global count} for every candidate whose
        latest refresh cleared the threshold. Estimates are upper
        bounds (one-sided CMS error)."""
        return dict(self.candidates)

    # ------------------------------------------------------- checkpointing

    @staticmethod
    def _fs(path: str):
        """(FileSystem, Path) via the Hadoop FS API — snapshots live
        wherever the query's checkpoints live (hdfs/s3a/file), never
        silently on driver-local disk (same rule as the vector-store
        sidecar). Needs an active SparkSession (a stream implies one)."""
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError("no active SparkSession for snapshot IO")
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        return jpath.getFileSystem(conf), jpath, jvm

    def save(self, path: str) -> None:
        """Snapshot sketch + candidates + epoch watermark as one JSON
        file (write-tmp-then-rename, so a crash mid-save leaves the
        previous snapshot intact) — a restarted query resumes via
        :meth:`load` instead of silently starting its counts at zero."""
        import json

        state = {
            "key_col": self.key_col,
            "threshold": self.threshold,
            "depth": self.depth,
            "width": self.width,
            "counters": None
            if self.sketch is None
            else self.sketch.counters.tolist(),
            "total": 0 if self.sketch is None else self.sketch.total,
            "candidates": list(self.candidates.items()),
            "last_epoch": self.last_epoch,
        }
        fs, jpath, jvm = self._fs(path)
        tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
        out = fs.create(tmp, True)
        try:
            out.write(bytearray(json.dumps(state).encode("utf-8")))
        finally:
            out.close()
        if fs.exists(jpath):
            fs.delete(jpath, False)
        fs.rename(tmp, jpath)

    @classmethod
    def load(cls, path: str) -> "StreamingHeavyHitters":
        """Restore a :meth:`save` snapshot."""
        import json

        import numpy as np

        fs, jpath, _ = cls._fs(path)
        inp = fs.open(jpath)
        try:
            state = json.loads(bytes(inp.readAllBytes()).decode("utf-8"))
        finally:
            inp.close()
        shh = cls(
            state["key_col"], state["threshold"], state["depth"], state["width"]
        )
        if state["counters"] is not None:
            shh.sketch = CountMinSketch(
                state["depth"],
                state["width"],
                np.asarray(state["counters"], dtype=np.int64),
                state["total"],
            )
        shh.candidates = dict(state["candidates"])
        shh.last_epoch = state["last_epoch"]
        return shh
