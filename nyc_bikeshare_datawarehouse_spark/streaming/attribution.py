"""Streaming first/last-touch attribution — the stateful twin of the
batch q_attribution window query (plans/queries.py).

Per-user state holds the touches (view/click) of the trailing 24 hours;
each purchase emits its attribution row immediately, scanning only that
user's in-window touch list. This is the production shape of
"click-to-conversion join" pipelines: the batch form needs the whole
day's events, the streaming form answers per purchase with state bounded
by one user's 24-hour touch volume.

Ordering contract: rows are processed in (epoch, event_id) order within
each micro-batch (sorted here), and the equivalence with the batch
window query holds for in-order delivery — late data past a batch
boundary attributes against the state as of its arrival, the standard
streaming-watermark trade documented for every streaming twin in this
package. State is pruned to the 24-hour horizon at every batch against
the batch's max epoch (purchase or not — a touches-only user cannot
accumulate state), so it is bounded by one user's 24-hour touch volume.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

LOOKBACK_S = 86400

OUTPUT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("purchase_ep", T.LongType()),
    T.StructField("first_touch_id", T.LongType()),
    T.StructField("first_touch_type", T.StringType()),
    T.StructField("last_touch_id", T.LongType()),
    T.StructField("last_touch_type", T.StringType()),
])

#: per-user touch history inside the lookback horizon, parallel arrays
STATE_SCHEMA = T.StructType([
    T.StructField("eps", T.ArrayType(T.LongType())),
    T.StructField("ids", T.ArrayType(T.LongType())),
    T.StructField("ets", T.ArrayType(T.StringType())),
])

_TOUCH_TYPES = ("view", "click")


def _update(key, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    eps, ids, ets = ([], [], []) if not state.exists else [list(x) for x in state.get]
    out: list[tuple] = []
    rows = pd.concat(list(batches), ignore_index=True)
    rows = rows.sort_values(["__ep", "event_id"])
    # `start` is the first live index — advanced monotonically instead of
    # repeated pop(0) (which was O(n²) on long histories); the dead
    # prefix is dropped once, by a single slice, before state.update.
    start = 0
    max_ep: int | None = None
    for ep, eid, et in zip(rows["__ep"], rows["event_id"], rows["ets_type"]):
        ep, eid = int(ep), int(eid)
        if max_ep is None or ep > max_ep:
            max_ep = ep
        if et in _TOUCH_TYPES:
            eps.append(ep)
            ids.append(eid)
            ets.append(et)
            continue
        if et != "purchase":
            continue
        # prune to the horizon (safe: rows arrive in ep order, so no
        # later purchase can need an older touch)
        lo = ep - LOOKBACK_S
        while start < len(eps) and eps[start] < lo:
            start += 1
        window = [i for i in range(start, len(eps)) if eps[i] < ep]
        if window:
            f, l = window[0], window[-1]
            out.append((eid, user_id, ep, ids[f], ets[f], ids[l], ets[l]))
        else:
            out.append((eid, user_id, ep, None, None, None, None))
    # Prune against the batch's max epoch REGARDLESS of purchases: a user
    # emitting only views/clicks must not accumulate state without bound
    # (ADVICE r08). Safe under the in-order contract — any future
    # purchase has ep' >= max_ep, so its horizon starts no earlier.
    if max_ep is not None:
        lo = max_ep - LOOKBACK_S
        while start < len(eps) and eps[start] < lo:
            start += 1
    if start:
        eps, ids, ets = eps[start:], ids[start:], ets[start:]
    state.update((eps, ids, ets))
    if out:
        yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])


def streaming_attribution(events: DataFrame, ep_col: Column | None = None) -> DataFrame:
    """Attribution rows per purchase over a streaming events frame.

    `events` must carry event_id, user_id, event_type, ts. One row per
    purchase, same columns as the batch q_attribution query."""
    ep = ep_col if ep_col is not None else F.floor(
        F.unix_micros("ts") / 1_000_000
    ).cast("long")
    return (
        events.select(
            "event_id",
            "user_id",
            F.col("event_type").alias("ets_type"),
            ep.alias("__ep"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
