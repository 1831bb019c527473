"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline, and a random-
hyperplane LSH-bucketed variant as the scale path (probe only matching
buckets instead of the full table). Reference analogue: Qdrant kNN
similarity voting at k=1/10/20 with thresholds
(``anomaly-detection-service/anomaly_detection_service.py:316-438``)
and the point-lookup cosine compare
(``helper-scripts/analyze_embeddings.py:115-159``).

The dot product / norms are `F.aggregate` / `F.zip_with` Catalyst
expressions — no Python in the scoring path. Hyperplanes are a small
seeded NumPy matrix shipped as literals (broadcast-sized).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_sim_expr(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    """Exact brute-force top-k by cosine vs one query vector.
    Deterministic tie-break on id. Returns (vec_id, sim, rk).

    Scale shape: two-stage top-k. ``orderBy(...).limit(k)`` compiles to
    TakeOrderedAndProject — each task keeps a k-row heap and only k·P
    candidate rows ever leave the executors — then ``row_number`` ranks
    the ≤k survivors (a window over k rows, not a global single-partition
    window over the full table, which was r1's scale-killer)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_sim_expr(F.col(vec_col), q)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = emb.select(F.col(id_col).alias("vec_id"), sim.alias("sim"))
    # (sim desc, vec_id asc) is a total order, so limit(k) is deterministic
    top = scored.orderBy(F.desc("sim"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("sim"), F.asc("vec_id"))
    return top.withColumn("rk", F.row_number().over(w))


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_signature_expr(vec_col: str, planes: np.ndarray) -> Column:
    """Random-hyperplane signature: bit i = sign(v · plane_i), packed
    into a bigint. Planes are literal arrays (tiny, constant-folded)."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(_dot(F.col(vec_col), plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig.cast("long")


def lsh_bucketed_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    max_probe_hamming: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only vectors whose LSH bucket is within
    ``max_probe_hamming`` bits of the query's bucket (multi-probe).
    At scale the signature is a partition/bucket key, so the probe is
    partition-pruned instead of a full scan."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    qsig = 0
    qv = np.asarray(query_vec, dtype=float)
    for i, p in enumerate(planes):
        if float(qv @ p) >= 0:
            qsig |= 1 << i
    tagged = emb.withColumn("__sig", lsh_signature_expr(vec_col, planes))
    probe = tagged.filter(
        F.bit_count(F.col("__sig").bitwiseXOR(F.lit(qsig))) <= max_probe_hamming
    )
    return cosine_topk(probe, query_vec, k, id_col, vec_col)


# ------------------------------------------------------------------ IVF ANN


def _kmeans_fit(sample: np.ndarray, k: int, n_iter: int = 8, seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd k-means on a driver-side sample (the coarse
    quantizer train step; sample is bounded, never the full table)."""
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)]
    for _ in range(n_iter):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            m = sample[assign == c]
            if len(m):
                cents[c] = m.mean(axis=0)
    return cents


def _centroids_lit(centroids: np.ndarray) -> Column:
    """The K×dim centroid matrix as ONE array<array<double>> literal —
    plan-size O(K·dim) DATA instead of O(K·dim) Column objects. The
    unrolled per-centroid form built ~100k py4j expressions at the
    README's 256×384 store scale (minutes of driver time, codegen
    method-limit fallback). ``F.lit`` on a nested list still round-trips
    py4j per ELEMENT (measured ~110 s at 256×384); a ``from_json`` of
    one string literal constructs in milliseconds and Catalyst's
    ConstantFolding collapses it to the same materialized array literal
    at optimization time (verified: the optimized plan carries the
    folded literal, no per-row parse), so that is the primary path."""
    import json as _json

    data = [[float(x) for x in c] for c in centroids]
    return F.from_json(F.lit(_json.dumps(data)), "array<array<double>>")


def _l2_dists_expr(vec_col: str, centroids: np.ndarray) -> Column:
    """array<double> of squared L2 distances from ``vec_col`` to each
    centroid: one ``transform`` over the nested literal, the inner sum
    a left-to-right ``aggregate`` fold (the same order
    ``nearest_cells`` reproduces driver-side, so probe selections
    can't drift on near-tie distances)."""
    return F.transform(
        _centroids_lit(centroids),
        lambda c: F.aggregate(
            F.zip_with(
                F.col(vec_col), c,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )


def ivf_cell_expr(vec_col: str, centroids: np.ndarray) -> Column:
    """argmin-distance cell id as a Catalyst expression — whole-stage
    codegen, no Python in the assignment path, constant-size plan (see
    ``_centroids_lit``). Ties resolve to the first (lowest) cell id,
    matching ``nearest_cells``."""
    arr = _l2_dists_expr(vec_col, centroids)
    return (F.array_position(arr, F.array_min(arr)) - 1).cast("int")


def ivf_index(
    emb: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int = 4096,
    seed: int = 42,
) -> tuple[np.ndarray, DataFrame]:
    """IVF coarse index: (centroids, frame + ``__cell`` column).

    Train on a deterministic pseudo-random sample (orderBy(xxhash64(id))
    .limit — one TakeOrdered pass), assign every vector JVM-side. At
    scale, WRITE the assigned frame partitioned/bucketed by ``__cell``
    (e.g. ``catalog.write(df, t, partition_by=["__cell"])``) so probes
    become partition-pruned scans instead of full-table filters."""
    samp = (
        emb.select(vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)))
        .limit(sample_rows)
        .toPandas()[vec_col]
    )
    if len(samp) == 0:  # empty collection: single trivial cell
        return np.zeros((0, 0)), emb.withColumn("__cell", F.lit(0).cast("int"))
    sample = np.vstack(samp.map(np.asarray)).astype(float)
    cents = _kmeans_fit(sample, n_centroids, seed=seed)
    return cents, emb.withColumn("__cell", ivf_cell_expr(vec_col, cents))


def nearest_cells(cents: np.ndarray, query_vec, nprobe: int) -> list[int]:
    """The ``nprobe`` cell ids nearest the query (L2 on centroids) —
    shared by ``ivf_topk`` and ``sources.vector_store.VectorStore`` so
    probe selection can't drift between the two. Bit-exact contract
    with ``ivf_probe_cells_expr``: the per-centroid distance is summed
    LEFT-TO-RIGHT (the order Catalyst's ``aggregate`` fold uses —
    NumPy's pairwise summation can differ in the last ulp and flip a
    near-tie), and ties sort stably by cell id, matching the struct
    lexicographic order."""
    qv = np.asarray(query_vec, dtype=np.float64)
    dists = []
    for c in cents:
        sq = (np.asarray(c, dtype=np.float64) - qv) ** 2
        acc = 0.0
        for v in sq.tolist():  # sequential fold == Catalyst aggregate
            acc += v
        dists.append(acc)
    order = np.argsort(dists, kind="stable")
    return [int(c) for c in order[: min(nprobe, len(cents))]]


def ivf_probe_cells_expr(vec_col: str, cents: np.ndarray, nprobe: int) -> Column:
    """``nearest_cells`` as a Catalyst expression: (distance, cell)
    structs over the nested centroid literal (constant-size plan, see
    ``_centroids_lit``), array_sort (lexicographic struct order =
    distance then cell id — the same tie-break as the stable NumPy
    path, over bit-identical left-to-right distance sums), slice
    ``nprobe``, project the cell ids. Whole-stage codegen; used to
    assign every row of a QUERY table its probe list without any
    driver loop."""
    dists = _l2_dists_expr(vec_col, cents)
    entries = F.transform(
        dists, lambda d, i: F.struct(d.alias("d"), i.cast("int").alias("c"))
    )
    arr = F.array_sort(entries)
    n = min(nprobe, len(cents))
    return F.transform(F.slice(arr, 1, n), lambda s: s["c"])


def batch_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    round_digits: int | None = 4,
) -> DataFrame:
    """Exact top-k for a whole TABLE of queries in one distributed plan
    — the batch analogue of ``cosine_topk`` (which is one driver-side
    query vector). Returns (qid, vec_id, sim, rk), k rows per query.

    Scale shape: the query table is broadcast (queries are the small
    side by construction — a scoring batch, not the corpus) so the
    corpus scan is embarrassingly parallel with NO shuffle of
    embeddings; the per-query top-k is a rank-filter adjacent to the
    window, which Spark plans as a Partial WindowGroupLimit — each task
    keeps a k-heap per qid map-side and only k·P·|Q| candidate rows
    reach the one (qid)-exchange of the final rank. Reference analogue:
    the per-prediction Qdrant kNN vote loop
    (``anomaly_detection_service.py:316-438``), batched."""
    q = F.broadcast(
        queries.select(F.col(qid_col).alias("qid"), F.col(qvec_col).alias("__qv"))
    )
    return score_and_rank_topk(emb.crossJoin(q), k, id_col, vec_col, round_digits)


def score_and_rank_topk(
    cand: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    """Shared tail of ``batch_topk`` and ``VectorStore.query_batch``:
    from a candidate frame carrying (qid, __qv, id_col, vec_col), score
    cosine sim and keep the per-qid top-k. The rank filter sits
    ADJACENT to its window so Catalyst plans a Partial WindowGroupLimit
    (map-side k-heap per qid) — keeping this in one place means a
    tie-break or rounding change cannot drift between the two callers."""
    sim = cosine_sim_expr(F.col(vec_col), F.col("__qv"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = cand.select("qid", F.col(id_col).alias("vec_id"), sim.alias("sim"))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: score only the ``nprobe`` cells whose
    centroids are nearest the query. ``nprobe >= n_centroids`` probes
    every cell and is EXACTLY brute-force cosine_topk (the equivalence
    the oracle checks); smaller nprobe trades recall for a
    partition-pruned probe."""
    cents, assigned = ivf_index(emb, n_centroids, id_col, vec_col, seed=seed)
    if len(cents) == 0:  # empty collection: nothing to prune
        return cosine_topk(emb, query_vec, k, id_col, vec_col)
    cells = nearest_cells(cents, query_vec, nprobe)
    probe = assigned.filter(F.col("__cell").isin(cells)).drop("__cell")
    return cosine_topk(probe, query_vec, k, id_col, vec_col)


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    n_bands: int = 1,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH blocking: only
    pairs colliding in a signature bucket are scored (the reference's
    ≥0.98 embedding-reuse check, ``anomaly_detection_service.py:440-454``).
    Returns (id_a, id_b, sim).

    Shuffle shape (mirrors ``dedup.minhash_lsh_candidate_pairs``, the
    r1-established pattern): the bucket self-join carries ONLY
    (id, band, band-signature) — never the vector, which at 384 floats
    is ~1.5 KB/row and would otherwise ride BOTH sides of the exchange
    and every pre-filter joined row. The deduplicated candidate pairs
    (a tiny frame) are then joined back to the (id, vector) projection
    once per side for the exact cosine — joins whose probe side is
    proportional to |candidates|, with the vector side a plain scan.

    Recall model — exact-bucket blocking (``n_bands=1``) is a
    conjunction: a pair is a candidate only if ALL ``n_planes`` sign
    bits agree. For a pair at angle θ each hyperplane agrees with
    probability p = 1 − θ/π, so P(candidate) = p^n_planes — at
    sim 0.95 (θ ≈ 0.318 rad, p ≈ 0.899) that is ~0.43 for 8 planes:
    near-dups straddling any single plane are missed. ``n_bands > 1``
    splits the ``n_planes`` bits into bands of r = n_planes/n_bands
    bits and a pair colliding in ANY band is a candidate
    (P = 1 − (1 − p^r)^b, the banded-MinHash OR-of-ANDs floor):
    8 planes / 4 bands lifts sim-0.95 recall to ~0.97 at the cost of
    ~4× candidate volume. Choose by corpus: blocking is a
    recall/candidate-count dial, the exact cosine verify keeps
    precision at 1.0 either way."""
    if n_planes % n_bands != 0:
        raise ValueError(f"n_planes={n_planes} not divisible by n_bands={n_bands}")
    r = n_planes // n_bands
    head = emb.select(vec_col).first()
    if head is None:  # empty collection: no pairs, typed empty result
        return emb.select(
            F.col(id_col).alias("id_a"),
            F.col(id_col).alias("id_b"),
            F.lit(0.0).alias("sim"),
        ).limit(0)
    dim = len(head[0])
    planes = _hyperplanes(dim, n_planes, seed)
    sigs = emb.select(
        F.col(id_col).alias("id"),
        lsh_signature_expr(vec_col, planes).alias("sig"),
    )
    # band j = bits [j*r, (j+1)*r) of the packed signature — id + two
    # small ints per row is ALL the candidate join ever shuffles
    band_mask = (1 << r) - 1
    bands_arr = F.array(
        *[
            F.shiftright(F.col("sig"), j * r).bitwiseAND(F.lit(band_mask))
            for j in range(n_bands)
        ]
    )
    banded = sigs.select("id", F.posexplode(bands_arr).alias("band", "bs"))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bs") == F.col("b.bs"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    sim = F.round(cosine_sim_expr(F.col("va"), F.col("vb")), 6).alias("sim")
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", sim)
        .filter(F.col("sim") >= threshold)
    )
