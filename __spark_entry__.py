"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship validation over transcripts derived
from sf0.001; ``queries()`` / ``oracle_sql()`` expose every implemented
operator with a DuckDB-checkable oracle (see
``hdfs_anomaly_detection_spark/plans/driver_queries.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hdfs_anomaly_detection_spark.plans import driver_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full constraint-validation verdict grid over the
    transcripts table derived from /root/testdata/sf0.001."""
    return driver_queries.v_verdicts_grid(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(driver_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(driver_queries.ORACLES)
