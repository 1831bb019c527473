"""Schema-enforced JSONL / CSV ingestion with corrupt-record accounting.

Reference operators reproduced (SURVEY §2.1):

* JSONL scan — eval datasets, one JSON object per line
  (``evaluation/anomaly_evaluation.py:76-87``): the reference
  ``json.loads``-es line by line and silently ``continue``s on parse
  errors. Here the scan is distributed (``spark.read.json`` with an
  explicit schema) and bad lines are ACCOUNTED, not dropped: PERMISSIVE
  mode routes them to a ``_corrupt_record`` column which we surface as
  an ingest-violations DataFrame — the same make-the-implicit-explicit
  move the engine applies to the reference's null-drop filter
  (``cloud-deployment/spark_job.py:103``).
* JSONL sink — labeled line-level records written one JSON object per
  line (``training/hdfs_line_level_loader_v2.py:231-250``,
  ``evaluation/hdfs_anomaly_injection_loader.py:203-232``):
  ``df.write.json``.
* CSV scan — structured Drain logs / templates / labels with headers
  (``training/hdfs_line_level_loader_v2.py:23-29``): ``spark.read.csv``
  with explicit schema (never inferSchema — a second full pass at
  10^12 scale) and the same corrupt-record accounting.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


@dataclass
class IngestResult:
    good: DataFrame      # rows matching the declared schema
    corrupt: DataFrame   # (line, reason) rows that failed to parse
    """Both frames derive from ONE cached scan — corrupt accounting does
    not re-read the input."""


def _split(df: DataFrame, reason: str) -> IngestResult:
    # PERMISSIVE parsing leaves non-corrupt columns null and fills
    # CORRUPT_COL with the raw line; cache so good/corrupt share the scan
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("line"), F.lit(reason).alias("reason")
    )
    return IngestResult(good=good, corrupt=corrupt)


def read_jsonl(spark: SparkSession, path: str, schema_ddl: str) -> IngestResult:
    """Distributed JSONL scan with explicit schema + corrupt accounting.

    ``schema_ddl`` example: ``"text string, label int, ts timestamp"``.
    """
    schema = f"{schema_ddl}, {CORRUPT_COL} string"
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return _split(df, "jsonl parse error")


def read_csv(
    spark: SparkSession, path: str, schema_ddl: str, header: bool = True
) -> IngestResult:
    """Distributed CSV scan with explicit schema + corrupt accounting."""
    schema = f"{schema_ddl}, {CORRUPT_COL} string"
    df = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )
    return _split(df, "csv parse error")


def write_jsonl(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """JSONL sink (one JSON object per line). ``n_files`` controls output
    fan-in via coalesce — at scale leave None (one file per task)."""
    w = df.coalesce(n_files) if n_files else df
    w.write.mode("overwrite").json(path)


def read_orc(spark: SparkSession, path: str, schema_ddl: str | None = None) -> DataFrame:
    """ORC scan (columnar alternative where the lake standardizes on ORC
    instead of Parquet; schema optional — ORC carries its own). Predicate
    pushdown and column pruning work the same as the parquet path."""
    r = spark.read
    if schema_ddl:
        r = r.schema(schema_ddl)
    return r.orc(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC sink with optional partition layout."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_csv_results(
    df: DataFrame, path: str, n_files: int | None = 1, header: bool = True
) -> None:
    """CSV results sink (``evaluation/anomaly_evaluation.py:356-414``
    writes per-example verdict rows to a results CSV). Defaults to one
    output file — results tables are small aggregates; pass
    ``n_files=None`` for one file per task when the frame is large."""
    w = df.coalesce(n_files) if n_files else df
    w.write.mode("overwrite").option("header", str(header).lower()).csv(path)
