"""Scalable global ordering: total-order row numbers without a
single-partition window.

A global ``row_number() OVER (ORDER BY ...)`` moves every row through
ONE task — fine for the reference's model-ranking table (cardinality
~10s, ``train_line_level_ensemble_v2.py:536-546``, kept as the
documented small-table path in ``plans/driver_queries.q_rank_suppliers``)
and a scale-killer for anything else. The distributed shape is the
classic three-step:

1. ``repartitionByRange`` on the sort key (sampled range boundaries —
   Spark's own global-sort machinery) + ``sortWithinPartitions``: data
   is now globally ordered ACROSS partitions and locally ordered within
   each, with no all-rows-to-one-task stage.
2. One O(P) driver-side reduction: per-partition row counts → prefix
   sums = each partition's global offset (P values, never rows).
3. A map-only Arrow pass (``mapInPandas`` — vectorized, per the
   repo-wide no-per-row-Python rule) adds ``offset + local position``.

Cost: the one range exchange (any global order needs at least that),
a count pass over the persisted shuffled frame, and a map. Skew in the
sort key is handled by the range partitioner's sampling (near-equal
row counts per partition regardless of value distribution).

``order_by`` must be a TOTAL order (add a unique tiebreak column) —
then row_number and rank coincide and the result is deterministic.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def global_row_number(
    df: DataFrame,
    order_by: list[Column | str],
    rank_col: str = "rk",
    num_partitions: int | None = None,
    persist_fn=None,
) -> DataFrame:
    """Total-order global row numbers (1-based) over ``order_by``,
    distributed: range-exchange + O(partitions) offsets + map-only
    numbering — never an ``Exchange SinglePartition``.

    ``order_by`` entries are column names or Column sort expressions
    (``F.desc("x")``); together they must totally order ``df`` (add a
    unique key as the last entry), which also makes row_number == rank.

    The range-shuffled frame is persisted so the offset count pass and
    the numbering pass see the SAME partition boundaries; ``persist_fn``
    (default ``DataFrame.persist``) lets a caller route that through a
    release registry (``plans.driver_queries._persist``) — otherwise
    unpersist after materializing the result.
    """
    sort_cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    pid_col = "__grn_pid"
    while pid_col in df.columns:  # never clobber a caller's column
        pid_col += "_"
    if num_partitions:
        part = df.repartitionByRange(num_partitions, *sort_cols)
    else:  # default: spark.sql.shuffle.partitions ranges
        part = df.repartitionByRange(*sort_cols)
    part = part.sortWithinPartitions(*sort_cols).withColumn(
        pid_col, F.spark_partition_id()
    )
    part = persist_fn(part) if persist_fn is not None else part.persist()
    # O(P) driver reduction — partition COUNTS, never rows. Range
    # partition ids ascend with the sort order, so prefix sums of the
    # counts are exactly each partition's global offset.
    counts = {int(r[pid_col]): int(r["n"]) for r in
              part.groupBy(pid_col).agg(F.count(F.lit(1)).alias("n")).collect()}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = StructType(
        [f for f in df.schema.fields] + [StructField(rank_col, LongType(), False)]
    )
    cols = [f.name for f in df.schema.fields]

    def add_rank(batches):
        # one call per partition; batches arrive in sorted order, so the
        # running length + the partition's offset IS the global position
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = offsets.get(int(pdf[pid_col].iloc[0]), 0)
            pdf = pdf[cols].copy()
            pdf[rank_col] = np.arange(seen + 1, seen + len(pdf) + 1) + base
            seen += len(pdf)
            yield pdf

    ranked = part.mapInPandas(add_rank, schema=out_schema)
    return ranked
