"""Count-Min sketch: bounded-memory frequency estimates and EXACT
heavy hitters with a shuffle proportional to the heavy rows only.

A full ``GROUP BY key`` shuffles every distinct key; at 10^12 turns
that is the dominant exchange even though only a handful of keys matter.
The CMS pass bounds the state at depth × width counters regardless of
cardinality, and — because a Count-Min estimate NEVER underestimates
(each counter is a sum over a superset of the key's rows; Cormode &
Muthukrishnan 2005) — it can serve as a map-side admission filter that
is guaranteed to pass every true heavy hitter:

1. **Sketch pass** — one aggregation into at most depth × width groups
   (map-side partial combine collapses each task to ≤ d·w rows before
   the exchange), collected to a d×w counter matrix on the driver —
   O(d·w), never O(keys).
2. **Admission filter** — the matrix rides into a map-only predicate
   (one ``from_json`` literal, constant-folded — same pattern as the
   IVF centroid literal, ``operators/similarity.py:132-146``):
   ``min_j counters[j][hash_j(key)] >= T`` keeps a row iff its key's
   estimate clears the threshold. Estimate >= true count, so every row
   of every true heavy hitter survives; collision victims merely pass
   extra candidates.
3. **Exact verify** — a plain count over the surviving rows only.
   CMS proposes, the exact count disposes (the repo's LSH-then-verify
   pattern, ``operators/dedup.py:254-310``): output counts are EXACT
   and the final exchange carries only candidate-key rows.

Width controls the candidate excess: overestimate <= e/width · N with
probability 1 - e^-depth. At width 2048, depth 4 the filter is ~64 KiB
of plan literal — broadcast-free, executor-local.

Sketches are mergeable (counter-wise sum) — ``CountMinSketch.merge``
supports incremental / per-partition builds.

Reference parity: the reference selects event templates by frequency
thresholds over exact occurrence counts held in memory
(hasb73/hdfs-anomaly-detection ``training/hdfs_line_level_loader_v2.py:
146-156`` — percentile cut on ``event_counts``, plus the noted
"high-frequency events" strategy); this module is that selection with
bounded state and exact verified output.
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["CountMinSketch", "build_cms", "cms_estimate", "heavy_hitters"]


class CountMinSketch:
    """depth × width counter matrix; ``counters[j][b]`` sums the rows
    whose key hashes to bucket ``b`` under seed ``j``."""

    def __init__(self, depth: int, width: int, counters: np.ndarray, total: int):
        if counters.shape != (depth, width):
            raise ValueError(f"counter shape {counters.shape} != ({depth}, {width})")
        self.depth = int(depth)
        self.width = int(width)
        self.counters = counters.astype(np.int64)
        self.total = int(total)  # rows counted (non-null keys)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        """Counter-wise sum — valid only for identical (depth, width);
        the hash family is (xxhash64(key, j) % width), fixed by shape."""
        if (self.depth, self.width) != (other.depth, other.width):
            raise ValueError("cannot merge sketches of different shapes")
        return CountMinSketch(
            self.depth, self.width, self.counters + other.counters, self.total + other.total
        )


def _bucket(key: Column, j: int, width: int) -> Column:
    # depth-j hash = xxhash64 over (key, j): one 64-bit family member per
    # row of the matrix, identical on build and query side
    return F.pmod(F.xxhash64(key, F.lit(j)), F.lit(width))


def build_cms(df: DataFrame, key_col: str, depth: int = 4, width: int = 2048) -> CountMinSketch:
    """One pass over ``df``: each non-null key increments one counter
    per depth row. The aggregation groups on at most depth × width
    combinations — partial (map-side) combine bounds every task's
    output at d·w rows, so the exchange and the driver collect are
    O(d·w) regardless of row count or key cardinality."""
    if depth < 1 or width < 2:
        raise ValueError("need depth >= 1 and width >= 2")
    key = F.col(key_col)
    pairs = df.filter(key.isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _bucket(key, j, width).alias("b")
                    )
                    for j in range(depth)
                ]
            )
        ).alias("jb")
    )
    rows = (
        pairs.groupBy(F.col("jb.j").alias("j"), F.col("jb.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()  # bounded: <= depth*width rows, never O(keys)
    )
    counters = np.zeros((depth, width), dtype=np.int64)
    for r in rows:
        counters[int(r["j"]), int(r["b"])] = int(r["n"])
    # every depth row counts each key row exactly once
    total = int(counters[0].sum()) if depth else 0
    return CountMinSketch(depth, width, counters, total)


# cms_estimate embeds the full counter matrix as plan literals
# (depth × width int64s); beyond a few MiB that bloats every task's
# serialized plan and the driver's plan-string handling. 4 MiB covers
# depth 4 × width 131072 — far wider than any useful CMS (error
# e/width · N shrinks past usefulness long before that).
_MAX_LITERAL_BYTES = 4 << 20


def cms_estimate(sk: CountMinSketch, key_col: str) -> Column:
    """Map-only point-frequency estimate for ``key_col``:
    ``min_j counters[j][hash_j(key)]``. Guaranteed >= the true count
    (never underestimates); overestimates by <= e/width · total with
    probability 1 - e^-depth. The counter matrix enters the plan as ONE
    constant-folded ``from_json`` literal per depth row. Raises when
    the matrix would exceed ``_MAX_LITERAL_BYTES`` as a plan literal —
    a width that large belongs in a broadcast join, not a literal."""
    lit_bytes = sk.depth * sk.width * 8
    if lit_bytes > _MAX_LITERAL_BYTES:
        raise ValueError(
            f"CMS counter matrix ({sk.depth}x{sk.width}, ~{lit_bytes >> 20} MiB "
            f"as int64s) exceeds the {_MAX_LITERAL_BYTES >> 20} MiB plan-literal "
            "budget; use a smaller width (error is e/width * total — width "
            "131072 is already far below any practical threshold) or join "
            "against a broadcast counter table instead"
        )
    key = F.col(key_col)
    ests = []
    for j in range(sk.depth):
        row_lit = F.from_json(
            F.lit(json.dumps([int(x) for x in sk.counters[j]])), "array<bigint>"
        )
        idx = (_bucket(key, j, sk.width) + F.lit(1)).cast("int")  # 1-based
        ests.append(F.element_at(row_lit, idx))
    return ests[0] if sk.depth == 1 else F.least(*ests)


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 2048,
    count_col: str = "cnt",
    sketch: CountMinSketch | None = None,
) -> DataFrame:
    """EXACT keys-with-count >= ``threshold`` (null keys excluded):
    sketch pass (O(d·w) state) -> map-only admission filter -> exact
    count over surviving rows only. Correct for ANY width: collisions
    only widen the candidate set the exact pass then prunes. Pass a
    pre-built ``sketch`` to reuse one across thresholds.

    ``df`` MUST be deterministic between actions: the sketch pass and
    the admission+exact pass each trigger a scan, and the "CMS never
    underestimates" guarantee only holds when both scans see the same
    rows. A non-deterministic source (``sample``/``rand`` without a
    seed, a table mutating between actions) can silently drop true
    heavy hitters — ``df.persist()`` it first, or land it, as the
    streaming variant does with its per-batch persist
    (``streaming/heavy_hitters.py``)."""
    sk = sketch or build_cms(df, key_col, depth=depth, width=width)
    rows = df.filter(F.col(key_col).isNotNull())
    admitted = rows.filter(cms_estimate(sk, key_col) >= F.lit(int(threshold)))
    return (
        admitted.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias(count_col))
        .filter(F.col(count_col) >= F.lit(int(threshold)))
    )
