"""Bucketed-table layout: pre-shuffled storage so repeated joins/aggs
on the bucket key run with ZERO exchanges.

The validation plan already collapses everything onto one
hash(conv_id) exchange per run; bucketing moves even that into the
STORAGE layer — write fact and dims ``bucketBy(N, conv_id)`` once, and
every subsequent run's sort-merge join reads co-located buckets with no
shuffle at all (the amortization matters when the same 100 TB fact
table is validated daily). This is the parquet-backend analogue of an
Iceberg ``bucket(N, conv_id)`` partition spec (``sources/catalog.py``),
and the bucket count should match ``ValidationRunner(n_buckets=...)``
so storage buckets, shuffle partitions and verdict part_ids align.

Reference analogue: none — the reference re-reads and re-groups its
corpus per run (``training/hdfs_line_level_loader_v2.py:56-66``); this
is the Spark-native fix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "conv_id",
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table. Sorting
    within buckets lets sort-merge joins skip their Sort too."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back with bucket metadata intact (``spark.table``, not a
    path read — path reads drop the bucket spec)."""
    return spark.table(table)
