"""Custom stateful streaming operators (applyInPandasWithState).

For semantics Spark's built-in streaming operators can't express —
running per-key aggregates emitted every micro-batch, custom session
logic, CDC state machines — the engine uses Arrow-batched
``applyInPandasWithState``: state lives in Spark's state store
(checkpointed, partitioned by key), the kernel sees pandas DataFrames,
and watermark-based timeouts bound state lifetime.

This is the "(b) Pandas-UDF-backed" tier of the custom-operator
policy (SURVEY §7): used only where composition of built-ins genuinely
cannot express the semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = "n BIGINT, total DOUBLE"


def _running_totals_kernel(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, sum) per key across micro-batches; emit the
    running value once per batch the key appears in."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_totals(changes: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key running (count, sum(value)) over a change stream —
    state checkpointed, emitted each micro-batch the key is touched.

    The streaming generalization of the reference's driver-side
    accumulation (its poll loop counts records in Python,
    spark_batch.py:331-377) — here the state is partitioned across
    executors and survives restarts.
    """
    return changes.groupBy(key_col).applyInPandasWithState(
        _running_totals_kernel,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
