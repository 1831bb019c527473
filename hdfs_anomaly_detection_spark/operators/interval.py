"""Range (point-in-interval) join without a nested-loop plan.

``points JOIN intervals ON lo <= p AND p < hi`` has no equi-key, so
Catalyst plans it as BroadcastNestedLoopJoin (fine only when one side
broadcasts) or a cartesian product (never fine). The scale path is the
standard BINNED rewrite used by Spark's own range-join hints on
Databricks and by Sedona/GeoSpark for 1-D ranges:

1. Pick a bin width ``g``. A point maps to exactly ONE bin
   ``floor(p / g)``; an interval explodes to the bins it overlaps
   (``floor(lo/g) .. floor(hi/g)`` — width/g + 1 rows, bounded by the
   caller's choice of g vs interval width).
2. Equi-join on (bin [, extra keys]) — a plain shuffled hash/sort-merge
   join Catalyst can plan, partition, and AQE-skew-split.
3. Re-check the exact predicate ``lo <= p < hi`` to drop bin-grazing
   false candidates.

Because each point owns exactly one bin, every (point, interval) match
surfaces exactly once — no post-join dedup pass. Cost: interval-side
amplification ×(width/g + 1) and one equi-shuffle, vs the nested loop's
|points| × |intervals| predicate evaluations. Choose ``g`` near the
median interval width (amplification ≈ 2); the amplified rows carry only
(bin, lo, hi, payload), never the point side.

``strategy="broadcast"`` keeps the plain range predicate with an
explicit ``F.broadcast`` on the interval side — the right call when
intervals fit in memory (a BNLJ against a broadcast table is a map-only
scan). The binned default is for large×large.

Reference parity: the reference brackets rows into [window_start,
window_end) containment windows and value bands (accuracy/latency
ranges) in its dashboard queries (hasb73/hdfs-anomaly-detection
``grafana/grafana_test_queries.sql:27-37``); this operator is that
containment test generalized to many windows × many rows as a shuffled
equi-join plan.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]

# bounded sample for the data-driven bin default: limit() short-circuits
# the scan, so the probe costs one small job however large the table is
_WIDTH_SAMPLE_CAP = 100_000
_AMPLIFICATION_WARN = 10.0


def _median_width(intervals: DataFrame, lo_col: str, hi_col: str) -> float | None:
    lo = F.col(lo_col).cast("double")
    hi = F.col(hi_col).cast("double")
    sample = (
        intervals.select((hi - lo).alias("__w"))
        .filter(F.col("__w").isNotNull() & (F.col("__w") >= 0))
        .limit(_WIDTH_SAMPLE_CAP)
    )
    qs = sample.approxQuantile("__w", [0.5], 0.01)
    return qs[0] if qs else None


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    on: list[str] | None = None,
    bin_size: float | None = None,
    closed: str = "left",
    strategy: str = "binned",
) -> DataFrame:
    """Inner join of ``points`` to every interval containing
    ``point_col``; output carries all point columns plus all interval
    columns (interval columns colliding with point names get ``_i``).

    ``on``       — optional extra equi-keys present in both frames.
    ``bin_size`` — domain units per bin (binned strategy); interval-side
                   row amplification is width/bin_size + 1. Default
                   ``None`` derives it from the MEDIAN interval width of
                   a bounded sample (one small extra job, capped at
                   ``_WIDTH_SAMPLE_CAP`` rows), putting the typical
                   amplification near 2; an explicit value far below
                   the sampled median width triggers a warning when the
                   estimated amplification exceeds ~10×.
    ``closed``   — ``left`` = [lo, hi) (default) or ``both`` = [lo, hi].
    ``strategy`` — ``binned`` (equi-join on bin, large×large) or
                   ``broadcast`` (range predicate vs broadcast intervals,
                   small interval side).

    Values and bounds are compared as doubles — cast timestamps with
    ``.cast("double")`` (epoch seconds) upstream. Null points/bounds
    never match (inner-join semantics).
    """
    if closed not in ("left", "both"):
        raise ValueError(f"closed must be left|both, got {closed!r}")
    if strategy not in ("binned", "broadcast"):
        raise ValueError(f"strategy must be binned|broadcast, got {strategy!r}")
    if bin_size is not None and bin_size <= 0:
        raise ValueError("bin_size must be positive")
    keys = list(on or [])

    rename = {
        c: (c + "_i" if c in points.columns else c)
        for c in intervals.columns
        if c not in keys
    }
    # output-name collision guard (mirrors asof_join): a suffixed name
    # that duplicates another interval output or an existing point
    # column would silently produce ambiguous duplicate columns
    out_names = list(rename.values())
    clash = sorted(
        {
            n
            for c, n in rename.items()
            if out_names.count(n) > 1 or (n != c and n in points.columns)
        }
    )
    if clash:
        raise ValueError(
            f"suffixed interval output names collide: {clash}; "
            "rename the interval columns upstream"
        )
    ivals = intervals.select(
        *keys, *[F.col(c).alias(rename[c]) for c in rename]
    )
    lo = F.col(rename[lo_col]).cast("double")
    hi = F.col(rename[hi_col]).cast("double")
    p = F.col(point_col).cast("double")
    contains = (lo <= p) & ((p < hi) if closed == "left" else (p <= hi))

    if strategy == "broadcast":
        cond = contains
        for k in keys:
            cond = cond & (points[k] == ivals[k])
        joined = points.join(F.broadcast(ivals), cond, "inner")
        # qualified selects: with extra keys both sides still carry the
        # key columns, so bare names would be ambiguous
        return joined.select(
            *[points[c] for c in points.columns],
            *[ivals[rename[c]] for c in rename],
        )

    bin_col = "__ij_bin"
    if bin_size is None:
        med = _median_width(intervals, lo_col, hi_col)
        # median width ⇒ typical amplification ≈ 2; degenerate/empty
        # interval sets fall back to unit bins (g barely matters there)
        g = med if med else 1.0
    else:
        g = float(bin_size)
        med = _median_width(intervals, lo_col, hi_col)
        if med and med / g + 1 > _AMPLIFICATION_WARN:
            warnings.warn(
                f"interval_join bin_size={g} is far below the sampled median "
                f"interval width {med:g}: estimated row amplification "
                f"~{med / g + 1:.0f}x (each interval explodes to width/bin+1 "
                "bin rows); pass bin_size=None to derive it from the data",
                stacklevel=2,
            )
    pts = points.filter(F.col(point_col).isNotNull()).withColumn(
        bin_col, F.floor(p / F.lit(g)).cast("long")
    )
    iv = (
        ivals.filter(lo.isNotNull() & hi.isNotNull() & (lo <= hi))
        .withColumn(
            bin_col,
            F.explode(
                F.sequence(
                    F.floor(lo / F.lit(g)).cast("long"),
                    F.floor(hi / F.lit(g)).cast("long"),
                )
            ),
        )
    )
    joined = pts.join(iv, [bin_col, *keys], "inner").filter(contains)
    return joined.select(*points.columns, *[rename[c] for c in rename])
