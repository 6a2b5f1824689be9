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


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Spark 4 `transformWithStateInPandas` twin of `running_user_totals`
    — the successor arbitrary-state API (typed state handles, timers,
    TTL, initial-state seeding; SPARK-42823 umbrella, public). Same
    semantics: per-user cumulative (count, value-sum), one updated row
    per user per micro-batch.

    Requires the RocksDB state store provider
    (`spark.sql.streaming.stateStore.providerClass` =
    `...state.RocksDBStateStoreProvider`) and a working `google.protobuf`
    (the runner speaks protobuf to the JVM) — import-gated here because
    minimal containers ship without it; callers fall back to
    `running_user_totals` (applyInPandasWithState needs neither)."""
    # fail fast with a clear message instead of a mid-stream worker crash
    from google.protobuf import descriptor  # noqa: F401
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_RunningTotals(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
