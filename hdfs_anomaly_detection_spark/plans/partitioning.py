"""Turn-count-aware repartitioning + hot-key diagnostics (SURVEY §4.2.5).

The reference's only parallelism unit is the Kafka partition
(``README.md:339``); conversation-heavy transcript tables instead skew
by conv_id (a hot conversation can hold 10^5 turns). These helpers size
the shuffle from a cheap sampled pre-pass and surface hot keys so the
caller can salt or isolate them.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def estimate_rows(df: DataFrame, sample_fraction: float = 0.01, seed: int = 42) -> int:
    """Cheap row estimate: exact count of a small sample scaled up (a
    metadata count when the source is parquet is even cheaper, but this
    works for any plan)."""
    n = df.sample(fraction=sample_fraction, seed=seed).count()
    return int(n / sample_fraction) if n else 0


def turn_count_aware_repartition(
    fact: DataFrame,
    target_rows_per_task: int = 2_000_000,
    sample_fraction: float = 0.01,
    min_partitions: int = 8,
    max_partitions: int = 100_000,
) -> DataFrame:
    """Hash-repartition by conv_id with a task count derived from the
    (sampled) table size, so each task lands near the target row count
    regardless of scale factor — instead of inheriting whatever file
    layout the writer produced."""
    est = estimate_rows(fact, sample_fraction)
    n = min(max(min_partitions, math.ceil(est / target_rows_per_task)), max_partitions)
    return fact.repartition(n, "conv_id")


def hot_conversations(
    fact: DataFrame, threshold_rows: int = 100_000, sample_fraction: float = 0.01, seed: int = 42
) -> DataFrame:
    """Conversations whose (sample-extrapolated) turn count exceeds the
    threshold — candidates for salting / isolation. Returns
    (conv_id, est_rows)."""
    return (
        fact.sample(fraction=sample_fraction, seed=seed)
        .groupBy("conv_id")
        .agg((F.count(F.lit(1)) / sample_fraction).cast("bigint").alias("est_rows"))
        .filter(F.col("est_rows") >= threshold_rows)
    )
