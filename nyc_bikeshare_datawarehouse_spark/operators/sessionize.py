"""Batch sessionization (gap-based) via window functions.

Assigns a session id per (entity, ordered event stream): a new session
starts when the gap to the previous event exceeds `gap_seconds`. Classic
lag + running-sum formulation — one shuffle on the entity key, then two
codegen'd window passes over the same partitioning (Spark reuses the sort).

Streaming twin: `session_window(ts, gap)` in streaming/events.py computes
the same sessions incrementally with watermark-bounded state.

Scale: the only shuffle is by `entity_col`; skewed entities (one user with
millions of events) are handled by AQE skew handling for the shuffle, and
the window itself is linear per partition. No driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Add a `session_id` column (1-based per entity).

    `order_tiebreak`: extra unique column appended to the ordering so the
    result is deterministic when timestamps collide.
    """
    order_cols = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # exact µs arithmetic (cast-to-long would truncate to seconds and move
    # session boundaries for sub-second timestamps)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)
    is_new = F.when(prev_ts.isNull() | (gap_us > gap_seconds * 1_000_000), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def session_stats(
    sessions: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    session_col: str = "session_id",
) -> DataFrame:
    """Collapse sessionized events to one row per session."""
    return sessions.groupBy(entity_col, session_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def session_window_batch(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap sessionization via Spark's BUILT-IN session_window, run in
    batch mode — the same expression session_window_stats streams
    (streaming/events.py:89), proving one definition serves both
    runtimes (SURVEY §2.9's tumbling/sliding twins, completed for
    sessions).

    Boundary semantics match `sessionize` exactly, INCLUDING the edge:
    the built-in's merge is inclusive (an event at exactly
    last_event + gap joins the open session — pinned in
    tests/test_operators.py), equivalent to the lag+cumsum form's
    `gap_us > gap` new-session test. Cross-engine replays use the same
    `> gap` SQL as q_sessionize (plans/oracles.py).

    One shuffle on the grouping key; session assembly is the state-free
    batch sort-merge inside each hash partition — no window function, no
    second exchange.
    """
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("sw"), F.col(entity_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(ts_col).alias("session_end"),
        )
        .select(
            entity_col,
            F.col("sw.start").alias("session_start"),
            "session_end",
            "n_events",
        )
    )
