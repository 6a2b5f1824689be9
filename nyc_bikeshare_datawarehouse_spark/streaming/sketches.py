"""Streaming maintenance of mergeable sketches.

The batch sketches (functions/sketches.py) are partial-aggregate
algebras — count-min grids add cell-wise, HLL registers max
element-wise — which is exactly the property a streaming rollup needs:
each micro-batch folds into bounded state (d*w cells / 2^b registers)
without ever re-reading history. This module wires that algebra into
Structured Streaming via foreachBatch; the state lives as a tiny parquet
frame, swapped atomically by directory rename (a local-filesystem stand-
in for the table-format MERGE a production lake would use — the merge
algebra is the part that transfers). tests/test_streaming.py proves the
streamed state equals the one-shot batch sketch over the same corpus.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

from nyc_bikeshare_datawarehouse_spark.functions.sketches import (
    countmin_build,
    countmin_merge,
    hll_merge,
    hll_registers,
)
from nyc_bikeshare_datawarehouse_spark.streaming.events import stream_foreach_batch


def _swap_state(new: DataFrame, state_path: str) -> None:
    """Write the next state beside the current one, then swap by rename —
    the reader of `state_path` never observes a half-written grid."""
    tmp = state_path + "__next"
    new.coalesce(1).write.mode("overwrite").parquet(tmp)
    if os.path.exists(state_path):
        shutil.rmtree(state_path)
    os.rename(tmp, state_path)


def countmin_stream(
    stream: DataFrame,
    key_col: str,
    state_path: str,
    checkpoint_path: str,
    depth: int = 4,
    width: int = 256,
):
    """Maintain a count-min grid over a stream: each micro-batch builds
    its own d×w partial grid (bounded regardless of batch size) and
    cell-adds it into the persisted state. Exactly the per-day rollup
    recipe from DEPLOYMENT.md, expressed as a running stream."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        grid = countmin_build(batch_df, key_col, depth, width)
        spark = batch_df.sparkSession
        if os.path.exists(state_path):
            grid = countmin_merge(spark.read.parquet(state_path), grid)
        _swap_state(grid, state_path)

    return stream_foreach_batch(stream, _merge, checkpoint_path)


def hll_stream(
    stream: DataFrame,
    key_col: str,
    state_path: str,
    checkpoint_path: str,
    b: int = 6,
):
    """Maintain HLL registers over a stream: per-batch registers folded
    by element-wise max — distinct counting with 2^b longs of state at
    any stream length."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        regs = hll_registers(batch_df, key_col, b)
        spark = batch_df.sparkSession
        if os.path.exists(state_path):
            regs = hll_merge(spark.read.parquet(state_path), regs)
        _swap_state(regs, state_path)

    return stream_foreach_batch(stream, _merge, checkpoint_path)
