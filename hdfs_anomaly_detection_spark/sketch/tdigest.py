"""Mergeable t-digest quantile sketches, built distributed.

Why not ``percentile_approx``? It answers fixed quantiles but does not
expose a mergeable, persistable sketch we can store as a baseline and
compare against later (the north-star drift check needs per-partition
digests persisted, then KS/PSI vs a fresh run). Reference analogue:
``np.percentile`` rarity thresholds
(``training/hdfs_line_level_loader_v2.py:146-147``) and rounded-value
histogram buckets (``grafana/grafana_test_queries.sql:88-96``).

Scale shape (bounded memory at any row count):

1. ``mapInPandas`` over the projected (part_id, value) frame builds one
   small digest PER ARROW BATCH (~10k rows) — streaming, never holds a
   partition in memory.
2. ``groupBy(part_id).applyInPandas`` merges the per-batch digests —
   each group is O(batches), thousands at most, not O(rows).

The t-digest itself is the standard Dunning construction with the
arcsine scale function k(q) = δ/(2π)·asin(2q−1); centroid count is
bounded by ~2δ. Pure NumPy (~70 lines), Arrow-batched — no per-row
Python.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hdfs_anomaly_detection_spark.constraints.runner import part_id_expr

DIGEST_SCHEMA = (
    "part_id int, metric string, means array<double>, weights array<double>, "
    "n bigint, vmin double, vmax double"
)


@dataclass
class TDigest:
    means: np.ndarray
    weights: np.ndarray
    n: int
    vmin: float
    vmax: float
    delta: int = 100

    @staticmethod
    def from_values(values: np.ndarray, delta: int = 100) -> "TDigest":
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return TDigest(np.array([]), np.array([]), 0, np.nan, np.nan, delta)
        d = TDigest(values.astype(float), np.ones(len(values)), len(values),
                    float(values.min()), float(values.max()), delta)
        return d.compress()

    @staticmethod
    def merge_all(digests: list["TDigest"], delta: int = 100) -> "TDigest":
        digests = [d for d in digests if d.n > 0]
        if not digests:
            return TDigest(np.array([]), np.array([]), 0, np.nan, np.nan, delta)
        means = np.concatenate([d.means for d in digests])
        weights = np.concatenate([d.weights for d in digests])
        out = TDigest(
            means, weights, int(sum(d.n for d in digests)),
            float(min(d.vmin for d in digests)), float(max(d.vmax for d in digests)),
            delta,
        )
        return out.compress()

    def compress(self) -> "TDigest":
        if len(self.means) == 0:
            return self
        order = np.argsort(self.means)
        means, weights = self.means[order], self.weights[order]
        total = weights.sum()
        out_m: list[float] = []
        out_w: list[float] = []
        # arcsine scale: k(q) = delta/(2*pi) * asin(2q-1)
        def k(q: float) -> float:
            return self.delta / (2 * np.pi) * np.arcsin(max(-1.0, min(1.0, 2 * q - 1)))

        cum = 0.0
        cur_m, cur_w = means[0], weights[0]
        k_lo = k(0.0)
        for m, w in zip(means[1:], weights[1:]):
            q_new = (cum + cur_w + w) / total
            if k(q_new) - k_lo <= 1.0:
                cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
                cur_w += w
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                cum += cur_w
                k_lo = k(cum / total)
                cur_m, cur_w = m, w
        out_m.append(cur_m)
        out_w.append(cur_w)
        return TDigest(np.asarray(out_m), np.asarray(out_w), self.n,
                       self.vmin, self.vmax, self.delta)

    def cdf(self, xs: np.ndarray) -> np.ndarray:
        """Approximate CDF at points xs (piecewise-linear between centroids)."""
        if self.n == 0:
            return np.full(len(xs), np.nan)
        total = self.weights.sum()
        # cumulative weight at centroid centers
        cum = np.cumsum(self.weights) - self.weights / 2.0
        pts = np.concatenate(([self.vmin], self.means, [self.vmax]))
        cdf = np.concatenate(([0.0], cum / total, [1.0]))
        out = np.interp(xs, pts, cdf, left=0.0, right=1.0)
        # subnormal centroid spacing can overflow interp's slope to
        # +/-inf (hypothesis-found); a CDF is always within [0, 1]
        return np.clip(np.nan_to_num(out, nan=0.5, posinf=1.0, neginf=0.0), 0.0, 1.0)

    def quantile(self, qs: np.ndarray) -> np.ndarray:
        if self.n == 0:
            return np.full(len(qs), np.nan)
        total = self.weights.sum()
        cum = (np.cumsum(self.weights) - self.weights / 2.0) / total
        pts = np.concatenate(([0.0], cum, [1.0]))
        vals = np.concatenate(([self.vmin], self.means, [self.vmax]))
        return np.interp(qs, pts, vals)


# ---------------------------------------------------------------- spark side


def metric_frame(fact: DataFrame, metric: str, n_buckets: int = 32) -> DataFrame:
    """(part_id, value) projection for a named drift metric.

    'text_length' → length(text) per row; 'turn_count' → rows per
    conv_id (an aggregate, so the digest sketches conversation sizes);
    otherwise the metric is taken as a numeric column name.
    """
    pid = part_id_expr(n_buckets=n_buckets).alias("part_id")
    if metric == "text_length":
        v: Column = F.length(F.col("text")).cast("double")
        return fact.select(pid, v.alias("value")).filter(F.col("value").isNotNull())
    if metric == "turn_count":
        per_conv = fact.groupBy("conv_id").agg(F.count(F.lit(1)).cast("double").alias("value"))
        return per_conv.select(pid, "value")
    return fact.select(pid, F.col(metric).cast("double").alias("value")).filter(
        F.col("value").isNotNull()
    )


def build_partition_digests(
    mf: DataFrame, metric: str, delta: int = 100
) -> DataFrame:
    """Per-part_id t-digests of ``mf(part_id, value)``, DIGEST_SCHEMA."""

    def batch_digests(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for pid, g in pdf.groupby("part_id"):
                d = TDigest.from_values(g["value"].to_numpy(), delta)
                if d.n == 0:
                    continue
                rows.append(
                    (int(pid), metric, d.means.tolist(), d.weights.tolist(),
                     d.n, d.vmin, d.vmax)
                )
            yield pd.DataFrame(
                rows,
                columns=["part_id", "metric", "means", "weights", "n", "vmin", "vmax"],
            )

    partial = mf.mapInPandas(batch_digests, schema=DIGEST_SCHEMA)

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        ds = [
            TDigest(np.asarray(r["means"]), np.asarray(r["weights"]),
                    int(r["n"]), float(r["vmin"]), float(r["vmax"]), delta)
            for _, r in pdf.iterrows()
        ]
        d = TDigest.merge_all(ds, delta)
        return pd.DataFrame(
            [(int(pdf["part_id"].iloc[0]), metric, d.means.tolist(),
              d.weights.tolist(), d.n, d.vmin, d.vmax)],
            columns=["part_id", "metric", "means", "weights", "n", "vmin", "vmax"],
        )

    return partial.groupBy("part_id").applyInPandas(merge_group, schema=DIGEST_SCHEMA)
