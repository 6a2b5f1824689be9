"""Custom stateful streaming operator via applyInPandasWithState.

When the built-in windows can't express an operator (running per-entity
accumulators, custom session logic, model-ish feature state), Structured
Streaming's arbitrary-state API is the Spark-native escape hatch: state
lives in the state store (checkpointed, fault-tolerant), batches arrive
Arrow-vectorized per group, and the watermark bounds state lifetime.

`running_user_totals` is the canonical example: per-user cumulative event
count and value sum, emitted once per micro-batch per active user. The
same shape extends to custom dedup-state (seen-hash sets), rate limiting,
or online feature aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
])


def _update(key, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user cumulative (count, value-sum) maintained in the state
    store; one updated row per user per micro-batch."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
