"""Transcripts derived deterministically from the driver's ``events`` table.

The correctness driver compares our Spark queries against DuckDB oracle
SQL over the same parquet views. The transcripts fact table
(BASELINE.json input_hint shape) is therefore defined ONCE, as
dialect-common SQL over ``events``, so both engines compute over
byte-identical input at any scale factor:

* conv_id   ← user_id (zero-padded), so conversation sizes follow the
  events-per-user distribution (naturally skewed);
* turn_idx  ← row_number per user ordered by (ts, event_id) − 1
  (event_id = unique tiebreaker ⇒ fully deterministic);
* role/tool ← cyclic + modulo derivations of turn/event ids;
* part_id   ← user_id % N_PARTS (a data-attribute partition column,
  dialect-common, unlike xxhash64);
* controlled corruptions keyed on event_id modulo — null text, bad /
  null role, negative turn_idx, dangling tool names, duplicated keys —
  mirroring the reference's 5–40 % injection corpora
  (``evaluation/hdfs_anomaly_injection_loader.py:244-248``).

Only ANSI constructs both Spark SQL and DuckDB parse identically:
lpad/cast-as-string/||/row_number/CASE/modulo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

N_PARTS = 8

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# -- dialect-common CTE chain; prepend to any query that needs transcripts --
TRANSCRIPTS_CTE = f"""
WITH __base AS (
  SELECT
    'conv_' || lpad(cast(user_id AS STRING), 8, '0') AS conv_id,
    cast(user_id % {N_PARTS} AS INT) AS part_id,
    cast(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS rn,
    event_id,
    event_type,
    coalesce(props, '') AS props,
    ts
  FROM events
),
__clean AS (
  SELECT
    conv_id, part_id, rn AS turn_idx,
    CASE cast(rn % 3 AS INT) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
    event_type || ' ' || props AS text,
    CASE WHEN rn % 3 = 2 THEN 'tool_' || lpad(cast(event_id % 12 AS STRING), 2, '0') END AS tool,
    ts, event_id
  FROM __base
),
transcripts AS (
  SELECT conv_id, part_id,
    cast(CASE WHEN event_id % 131 = 7 THEN -1 ELSE turn_idx END AS INT) AS turn_idx,
    CASE WHEN event_id % 149 = 3 THEN NULL
         WHEN event_id % 101 = 5 THEN 'sys_tem'
         ELSE role END AS role,
    CASE WHEN event_id % 53 = 2 THEN NULL ELSE text END AS text,
    CASE WHEN tool IS NOT NULL AND event_id % 61 = 4 THEN 'tool_ghost' ELSE tool END AS tool,
    ts
  FROM __clean
  UNION ALL
  SELECT conv_id, part_id, turn_idx, role, text || ' [dup]' AS text, tool, ts
  FROM __clean
  WHERE event_id % 97 = 11
)
"""

# the tools dimension as dialect-common inline VALUES (12 valid tools)
TOOLS_VALUES_SQL = (
    "(VALUES "
    + ", ".join(f"('tool_{i:02d}')" for i in range(12))
    + ") AS tools_dim(tool)"
)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view (matches the DuckDB
    side, where the same names are pre-registered)."""
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the derived transcripts fact table as a DataFrame."""
    register_views(spark, sf_dir)
    return spark.sql(TRANSCRIPTS_CTE + "SELECT * FROM transcripts")
