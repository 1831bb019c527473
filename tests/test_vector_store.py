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


def test_upsert_replaces_by_id_and_touches_only_affected_cells(spark, tmp_path):
    """Qdrant point-upsert semantics: an incoming id replaces its stored
    version even when the new embedding moves it to a different cell;
    untouched cell partitions keep their exact file lists."""
    import os

    import numpy as np

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    vs = VectorStore(str(tmp_path / "vectors"))
    vs.write(emb, n_centroids=N_CELLS)
    n0 = vs.read(spark).count()

    def files_by_cell():
        out = {}
        for c in range(N_CELLS):
            d = f"{vs.path}/cell={c}"
            out[c] = sorted(os.listdir(d)) if os.path.isdir(d) else []
        return out

    before = files_by_cell()

    e3 = emb.filter(F.col("vec_id") == 3).first()
    e7 = emb.filter(F.col("vec_id") == 7).first()
    # vec 3 takes vec 7's embedding (may hop cells); 20001 is brand new
    incoming = spark.createDataFrame(
        [(3, e7["embedding"], e3["label"]), (20001, e3["embedding"], e3["label"])],
        emb.schema,
    )
    vs.upsert(incoming)

    table = vs.read(spark)
    assert table.count() == n0 + 1  # replaced one, added one
    rows3 = table.filter(F.col("vec_id") == 3).collect()
    assert len(rows3) == 1  # no duplicate id anywhere
    assert list(rows3[0]["embedding"]) == list(e7["embedding"])

    # the new vec-3 embedding is exactly vec 7's: both surface at 1.0
    got = vs.query(spark, [float(x) for x in e7["embedding"]], k=2, nprobe=N_CELLS)
    pdf = got.toPandas()
    assert set(pdf["vec_id"]) == {3, 7} and (pdf["sim"] == 1.0).all()

    # only the cells of: old vec3, new vec3 (=vec7's), and 20001 changed
    cents = vs.centroids()

    def cell_of(v):
        return int(((cents - np.asarray(v, dtype=float)) ** 2).sum(axis=1).argmin())

    touched = {cell_of(e3["embedding"]), cell_of(e7["embedding"])}
    after = files_by_cell()
    changed = {c for c in range(N_CELLS) if before[c] != after[c]}
    assert changed <= touched and len(changed) > 0
    untouched = set(range(N_CELLS)) - touched
    assert untouched and all(before[c] == after[c] for c in untouched)


def test_upsert_clears_emptied_cell_and_collapses_batch_dups(spark, tmp_path):
    """Two review-found edge cases: (a) when an upsert moves a cell's
    ONLY row elsewhere, the emptied partition must not keep the stale
    version (dynamic overwrite alone never touches a partition absent
    from the written data); (b) ids repeated within one incoming batch
    collapse to a single stored row."""
    import numpy as np

    # craft vectors so cells are predictable: one lone far-away vector
    base = spark.createDataFrame(
        [(i, [float(i % 7), float((i * 3) % 5)] + [0.0] * 62, 0) for i in range(40)]
        + [(999, [1000.0, 1000.0] + [0.0] * 62, 0)],
        "vec_id long, embedding array<double>, label int",
    )
    vs = VectorStore(str(tmp_path / "vs"))
    vs.write(base, n_centroids=4)
    lone_cell = int(
        vs.read(spark).filter(F.col("vec_id") == 999).first()["cell"]
    )
    # the far-away vector sits alone in its cell
    assert vs.read(spark).filter(F.col("cell") == lone_cell).count() == 1

    # (a) move 999 next to the crowd; its old cell empties out
    # (b) the batch carries the id twice — must store exactly one row
    moved = spark.createDataFrame(
        [(999, [0.0, 1.0] + [0.0] * 62, 0), (999, [1.0, 0.0] + [0.0] * 62, 0)],
        "vec_id long, embedding array<double>, label int",
    )
    vs.upsert(moved)
    table = vs.read(spark)
    assert table.filter(F.col("cell") == lone_cell).count() == 0  # no stale row
    rows = table.filter(F.col("vec_id") == 999).collect()
    assert len(rows) == 1
    assert float(np.asarray(rows[0]["embedding"]).max()) <= 1.0  # new version
    assert table.count() == 41


def test_upsert_crash_mid_swap_loses_nothing(spark, tmp_path, monkeypatch):
    """Round-3 verdict weak #1: the old upsert deleted cell dirs before
    rewriting them from an in-memory localCheckpoint — a crash in that
    window lost every stored row of the touched cells. The staged-swap
    upsert must survive the WORST window: stage committed, marker
    written, every old touched-cell directory already deleted, nothing
    renamed yet — the next open replays the swap from the durable stage
    and no row is lost."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    vs = VectorStore(str(tmp_path / "vs"))
    vs.write(emb, n_centroids=N_CELLS)
    n0 = vs.read(spark).count()

    e3 = emb.filter(F.col("vec_id") == 3).first()
    e7 = emb.filter(F.col("vec_id") == 7).first()
    incoming = spark.createDataFrame(
        [(3, e7["embedding"], e3["label"]), (20001, e3["embedding"], e3["label"])],
        emb.schema,
    )

    real_swap = VectorStore._commit_swap

    def crash_after_deletes(self, spark_, staged, empty):
        # replicate the lethal prefix of the swap: delete EVERY old
        # touched-cell directory, then die before any rename
        for c in list(staged) + list(empty):
            self._delete(spark_, f"cell={c}")
        raise RuntimeError("simulated crash mid-swap")

    monkeypatch.setattr(VectorStore, "_commit_swap", crash_after_deletes)
    with pytest.raises(RuntimeError, match="simulated crash"):
        vs.upsert(incoming)
    monkeypatch.setattr(VectorStore, "_commit_swap", real_swap)

    # a fresh open heals: read() finds the marker and replays the swap
    recovered = VectorStore(vs.path)
    table = recovered.read(spark)
    assert table.count() == n0 + 1
    assert table.filter(F.col("vec_id") == 3).count() == 1
    assert list(table.filter(F.col("vec_id") == 3).first()["embedding"]) == list(
        e7["embedding"]
    )
    assert table.filter(F.col("vec_id") == 20001).count() == 1
    # stage + marker are cleaned up; a second upsert works normally
    import os

    assert not os.path.exists(f"{vs.path}/_upsert_stage")
    recovered.upsert(
        spark.createDataFrame([(20002, e3["embedding"], 0)], emb.schema)
    )
    assert recovered.read(spark).count() == n0 + 2


def test_upsert_crash_before_stage_commit_keeps_old_data(spark, tmp_path, monkeypatch):
    """A crash BEFORE the marker is written (stage incomplete) must
    leave the store exactly as it was: the next open discards the
    half-written stage and the upsert can simply be re-run."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    vs = VectorStore(str(tmp_path / "vs"))
    vs.write(emb, n_centroids=N_CELLS)
    n0 = vs.read(spark).count()
    before = {r["vec_id"] for r in vs.read(spark).select("vec_id").collect()}

    e3 = emb.filter(F.col("vec_id") == 3).first()
    incoming = spark.createDataFrame([(30001, e3["embedding"], 0)], emb.schema)

    real_write_small = VectorStore._write_small

    def crash_at_marker(self, spark_, rel, text):
        if rel.endswith("_READY"):
            raise RuntimeError("simulated crash before marker")
        return real_write_small(self, spark_, rel, text)

    monkeypatch.setattr(VectorStore, "_write_small", crash_at_marker)
    with pytest.raises(RuntimeError, match="before marker"):
        vs.upsert(incoming)
    monkeypatch.setattr(VectorStore, "_write_small", real_write_small)

    table = VectorStore(vs.path).read(spark)
    assert table.count() == n0
    assert {r["vec_id"] for r in table.select("vec_id").collect()} == before
    # upsert re-runs cleanly (stage leftovers were discarded lazily)
    vs.upsert(incoming)
    assert vs.read(spark).count() == n0 + 1


def test_second_writer_fails_fast_and_unlock_breaks_stale_lock(spark, tmp_path):
    """Single-writer contract: while one writer holds the lock a second
    write/append/upsert raises ConcurrentWriteError instead of
    interleaving deletes; unlock() breaks a stale (crashed-writer)
    lock."""
    from hdfs_anomaly_detection_spark.sources import ConcurrentWriteError

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    vs = VectorStore(str(tmp_path / "vs"))
    vs.write(emb, n_centroids=N_CELLS)

    # simulate a concurrent (or crashed) writer holding the sentinel
    vs._acquire_lock(spark)
    e3 = emb.filter(F.col("vec_id") == 3).first()
    one = spark.createDataFrame([(40001, e3["embedding"], 0)], emb.schema)
    with pytest.raises(ConcurrentWriteError, match="single-writer"):
        vs.upsert(one)
    with pytest.raises(ConcurrentWriteError):
        vs.append(one)
    with pytest.raises(ConcurrentWriteError):
        vs.write(emb, n_centroids=N_CELLS)
    # readers never take the lock
    assert vs.read(spark).count() > 0

    vs.unlock(spark)
    vs.upsert(one)
    assert vs.read(spark).filter(F.col("vec_id") == 40001).count() == 1


def test_query_batch_matches_single_query_and_prunes(spark, store):
    """query_batch over a query TABLE == .query per vector at the same
    nprobe (the no-drift contract between the driver-side and expr-side
    probe selection), full-probe batch == brute force for every query,
    and the batch scan opens ONLY the union of probed cell dirs."""
    import numpy as np

    from hdfs_anomaly_detection_spark.operators.similarity import nearest_cells

    vs, emb = store
    pdf = emb.filter(F.col("vec_id").isin([3, 11, 42])).toPandas()
    queries = spark.createDataFrame(
        [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for _, r in pdf.iterrows()
        ],
        "qid int, qvec array<double>",
    )

    got = vs.query_batch(queries, k=5, nprobe=2).toPandas()
    for _, r in pdf.iterrows():
        qv = [float(x) for x in r["embedding"]]
        single = vs.query(spark, qv, k=5, nprobe=2).toPandas()
        sub = got[got["qid"] == int(r["vec_id"])].sort_values("rk")
        assert list(sub["vec_id"]) == list(single["vec_id"])
        assert np.allclose(sub["sim"].to_numpy(), single["sim"].to_numpy())

    # nprobe >= n_centroids: every query's answer is exactly brute force
    # over the store's CURRENT contents (earlier tests may have appended)
    stored = vs.read(spark)
    got_all = vs.query_batch(queries, k=5, nprobe=N_CELLS).toPandas()
    for _, r in pdf.iterrows():
        qv = [float(x) for x in r["embedding"]]
        exact = cosine_topk(stored, qv, k=5).toPandas()
        sub = got_all[got_all["qid"] == int(r["vec_id"])].sort_values("rk")
        assert list(sub["vec_id"]) == list(exact["vec_id"])

    # partition pruning: the nprobe=2 batch reads only the probed dirs
    cents = vs.centroids(spark)
    probed = set()
    for _, r in pdf.iterrows():
        probed |= set(nearest_cells(cents, [float(x) for x in r["embedding"]], 2))
    table = vs.read(spark).filter(F.col("cell").isin(sorted(probed)))
    files = {r[0] for r in table.select(F.input_file_name()).distinct().collect()}
    for f in files:
        assert any(f"cell={c}/" in f for c in probed), f
    all_files = {
        r[0] for r in vs.read(spark).select(F.input_file_name()).distinct().collect()
    }
    assert len(files) < len(all_files)  # pruning actually dropped dirs


def test_query_batch_plan_has_window_group_limit(spark, store):
    """The per-qid top-k must plan a Partial WindowGroupLimit (map-side
    k-heap per query) — never a global sort of all scored candidates."""
    vs, emb = store
    q = emb.limit(3).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qvec"),
    )
    plan = (
        vs.query_batch(q, k=5, nprobe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    wgl_lines = [l for l in plan.splitlines() if "WindowGroupLimit" in l]
    assert any(", Partial" in l for l in wgl_lines), plan[:3000]
    assert any(", Final" in l for l in wgl_lines), plan[:3000]


def test_write_holds_lock_through_data_write(spark, tmp_path, monkeypatch):
    """Review-found: mode('overwrite') on the store root deleted the
    _WRITE_LOCK sentinel itself mid-rebuild, silently voiding the
    single-writer contract. The rebuild now clears contents explicitly
    and the lock must still exist when the data write has finished
    (observed at the _save_centroids step, which runs after it)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    vs = VectorStore(str(tmp_path / "vs"))
    seen = {}
    real_save = VectorStore._save_centroids

    def check_then_save(self, spark_, cents):
        seen["lock_after_data_write"] = self._exists(spark_, "_WRITE_LOCK")
        return real_save(self, spark_, cents)

    monkeypatch.setattr(VectorStore, "_save_centroids", check_then_save)
    vs.write(emb, n_centroids=N_CELLS)
    assert seen["lock_after_data_write"] is True
    # and the lock is released at the end
    assert not vs._exists(spark, "_WRITE_LOCK")


def test_stale_upsert_marker_does_not_corrupt_rebuild(spark, tmp_path):
    """Review-found: a crashed upsert's _READY marker survived a
    rebuild (dynamic partitionOverwriteMode leaves underscore dirs),
    and the NEXT read() replayed the stale swap plan over the fresh
    store — deleting new cells. write() now recovers/clears the marker,
    so the rebuilt store must read back complete."""
    import json as _json

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    vs = VectorStore(str(tmp_path / "vs"))
    vs.write(emb, n_centroids=N_CELLS)
    n = emb.count()

    # simulate the crashed-upsert state: marker claims every cell was
    # emptied (the worst replay: delete them all)
    vs._write_small(
        spark,
        "_upsert_stage/_READY",
        _json.dumps({"staged": [], "empty": list(range(N_CELLS))}),
    )
    old_pom = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        vs.write(emb, n_centroids=N_CELLS)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_pom)
    assert not vs._exists(spark, "_upsert_stage/_READY")
    assert VectorStore(vs.path).read(spark).count() == n
    # a follow-up read is still complete (nothing replayed a stale plan)
    assert vs.read(spark).count() == n


def test_read_warns_on_pending_swap_with_held_lock(spark, tmp_path):
    """Review-found: a writer killed mid-swap (kill -9) leaves BOTH the
    _READY marker and the _WRITE_LOCK behind; read() used to swallow
    the lock conflict silently and serve the half-swapped store
    forever. It must warn loudly, and heal on the first read after
    unlock()."""
    import json as _json
    import warnings as _warnings

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    vs = VectorStore(str(tmp_path / "vs"))
    vs.write(emb, n_centroids=N_CELLS)
    n = emb.count()

    # simulate the dead writer: committed stage + marker + held lock
    vs._write_small(
        spark, "_upsert_stage/_READY", _json.dumps({"staged": [], "empty": []})
    )
    vs._fs(spark, "_WRITE_LOCK")[0].createNewFile(vs._fs(spark, "_WRITE_LOCK")[1])

    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        assert vs.read(spark).count() == n
    assert any("pending upsert swap" in str(w.message) for w in caught)
    # marker is still pending (we never replay under a held lock)
    assert vs._exists(spark, "_upsert_stage/_READY")

    vs.unlock(spark)
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        assert vs.read(spark).count() == n  # replays the (no-op) swap
    assert not any("pending upsert swap" in str(w.message) for w in caught)
    assert not vs._exists(spark, "_upsert_stage/_READY")
