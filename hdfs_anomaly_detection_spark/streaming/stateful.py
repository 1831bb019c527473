"""Custom stateful streaming operator: cross-micro-batch ordering
validation with ``applyInPandasWithState``.

The append-mode violation stream (``streaming_violations``) can only
evaluate row-local predicates; the ordering invariant needs the LAST
SEEN turn_idx per conversation ACROSS micro-batches — exactly the
per-group state Structured Streaming exposes through
``applyInPandasWithState``. The reference has no analogue: its consumer
loop keeps per-process dicts that die on restart
(``cloud-deployment/spark_job.py:144-153`` re-reads whatever the
consumer group lost); here the state lives in the checkpointed state
store, so a restart resumes with the same last-seen indices.

Scale shape: state is one int per live conversation, partitioned by the
group key (conv_id) — the same hash distribution as the batch engine's
cluster key. An idle-timeout evicts conversations that stopped talking,
bounding the store the way ``dedup_stream``'s watermark bounds its
keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

ORDER_VIOLATION_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("prev_idx", IntegerType()),
        StructField("detail", StringType()),
    ]
)
_STATE_SCHEMA = StructType([StructField("last_idx", IntegerType())])


def _order_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Contiguity check per conversation: within a batch rows are sorted
    by (turn_idx, ts); the first row of each batch is checked against
    the persisted last-seen index from previous batches."""
    (conv_id,) = key
    last: Any = state.get[0] if state.exists else None
    out = []
    for pdf in pdfs:
        # a null turn_idx (the flatten path emits one for corrupt kafka
        # payloads) is a violation, not a crash: flag it, exclude it
        # from the contiguity scan (int(NaN) would raise — ADVICE r2)
        n_null = int(pdf["turn_idx"].isna().sum())
        if n_null:
            out.extend(
                (conv_id, None, None, "null turn_idx (corrupt record)")
                for _ in range(n_null)
            )
            pdf = pdf.dropna(subset=["turn_idx"])
        pdf = pdf.sort_values(["turn_idx", "ts"])
        for idx in pdf["turn_idx"]:
            idx = int(idx)
            if last is None:
                if idx != 0:
                    out.append((conv_id, idx, None, f"first turn is {idx}, expected 0"))
            elif idx != last + 1:
                out.append(
                    (conv_id, idx, last, f"gap/regression: prev={last} cur={idx}")
                )
            last = idx
    state.update((int(last) if last is not None else -1,))
    if out:
        yield pd.DataFrame(out, columns=["conv_id", "turn_idx", "prev_idx", "detail"])


def stateful_order_violations(
    stream_df: DataFrame,
    conv_col: str = "conv_id",
) -> DataFrame:
    """Streaming ordering-violation frame (append mode):
    (conv_id, turn_idx, prev_idx, detail), one row per contiguity break,
    with the last-seen index persisted in the state store ACROSS
    micro-batches — gaps spanning a batch boundary are caught, which the
    batch window per epoch cannot do."""
    return stream_df.groupBy(conv_col).applyInPandasWithState(
        _order_fn,
        outputStructType=ORDER_VIOLATION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
