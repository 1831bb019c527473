"""Vector-collection statistics: per-label centroids, distance-from-
centroid, and outlier ranking — all JVM-side Catalyst expressions.

Reference analogue: ``helper-scripts/analyze_embeddings.py:191-209``
(np.mean centroid per class, np.linalg.norm distances, argsort top
outliers) — re-expressed distributed: the NumPy version holds the whole
collection in driver memory; here the centroid is a tiny
(labels x dim) aggregate and distances are a map-side broadcast join.

Scale shape:
* ``label_centroids`` — posexplode to (label, pos, x) then avg; partial
  aggregation collapses each task's contribution to labels x dim rows
  map-side, so the shuffle is tiny regardless of row count.
* ``centroid_distances`` — centroids broadcast (labels x dim doubles),
  distance is one ``zip_with``/``aggregate`` expression per row: no
  shuffle at all.
* ``centroid_outliers`` — per-label top-k with map-side rank-limit
  pruning (Partial ``WindowGroupLimit`` below the exchange): each input
  partition ships only its local per-label top-k, so no reducer ever
  sees a whole label's distance set even with few labels — the
  two-stage top-k shape with a single shuffle, plan-pinned in
  ``tests/test_plan_shape.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_centroids(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """(label, centroid array<double>, n) — the per-class mean vector."""
    d = emb.select(label_col, F.posexplode(vec_col).alias("pos", "x"))
    per_dim = d.groupBy(label_col, "pos").agg(
        F.avg(F.col("x").cast("double")).alias("m"), F.count(F.lit(1)).alias("n")
    )
    return per_dim.groupBy(label_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("centroid"),
        F.max("n").alias("n"),
    )


def centroid_distances(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
    round_digits: int | None = 6,
) -> DataFrame:
    """(vec_id, label, dist): L2 distance from the row's own-label
    centroid. Broadcast join + one expression — map-side only.

    ``round_digits`` defaults to 6 so downstream rankings are stable
    across summation orders (engines/partitionings)."""
    cents = centroids if centroids is not None else label_centroids(emb)
    joined = emb.join(
        F.broadcast(cents.select(label_col, "centroid")), label_col
    )
    sq = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.col("centroid"),
            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    dist = F.sqrt(sq)
    if round_digits is not None:
        dist = F.round(dist, round_digits)
    return joined.select(
        F.col(id_col).alias("vec_id"), F.col(label_col).alias("label"), dist.alias("dist")
    )


def centroid_outliers(
    emb: DataFrame,
    k: int = 3,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k vectors farthest from their own-label centroid:
    (label, vec_id, dist, rk). Deterministic tie-break on vec_id.

    Scale shape: a naive label-partitioned window would move every
    distance of a label to ONE reducer (few labels ⇒ full-frame skew).
    Because the rank filter sits directly on the window, Catalyst's
    rank-limit pushdown (``InferWindowGroupLimit``, Spark ≥ 3.5) plans
    a *Partial* ``WindowGroupLimit`` BELOW the exchange — each input
    partition is pruned to its local per-label top-k map-side, so the
    label reducer receives ≤ k × n_partitions rows per label, never the
    whole label. This is the two-stage top-k for free, with a single
    shuffle; ``tests/test_plan_shape.py`` pins the Partial node so a
    refactor that breaks the filter-over-window adjacency (re-creating
    the full-frame exchange) fails CI."""
    d = centroid_distances(emb, label_col, vec_col, id_col)
    w = Window.partitionBy("label").orderBy(F.desc("dist"), F.asc("vec_id"))
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("label", "vec_id", "dist", "rk")
    )


def centroid_spread_stats(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-label dispersion summary: (label, n, avg_dist, max_dist)."""
    d = centroid_distances(emb, label_col, vec_col, id_col, round_digits=None)
    return d.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("dist"), 4).alias("avg_dist"),
        F.round(F.max("dist"), 4).alias("max_dist"),
    )
