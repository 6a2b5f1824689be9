"""Distributed 2-D skyline (Pareto front) — the classic multi-criteria
operator (Börzsönyi et al. 2001, public): keep every row not dominated
by another (dominator: x ≤ and y ≥, one strict; x minimized, y
maximized).

For two dimensions the skyline reduces to one running maximum along the
(x ASC, y DESC, id ASC) total order: a row survives iff its y strictly
exceeds every strictly-preceding row's y. A naive implementation is an
unpartitioned window — the single-task corpus sort this package bans —
so the running max rides the same two-phase shape as
`two_phase_global_rank`/`two_phase_cumsum` (operators/windows.py):
per-bucket prefix max via a partitioned window, per-bucket totals (B
rows) prefix-combined by the one intentionally-tiny window, broadcast
back. Exact-duplicate (x, y) points collapse to the lowest id (the
deterministic representative; duplicates are mutually non-dominating
but carry no extra information on the front).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    bucket: Column | None = None,
) -> DataFrame:
    """Rows on the (min x, max y) Pareto front, `skyline` flag attached.

    `bucket` must be monotone non-decreasing in `x_col` (default: the
    raw x value — fine for integer/low-cardinality x; at 100 TB pass
    ``F.floor(F.col(x)/width)`` with width from column stats so bucket
    populations balance)."""
    b = df.withColumn("__bucket", bucket if bucket is not None else F.col(x_col))
    order = [F.col(x_col).asc(), F.col(y_col).desc(), F.col(id_col).asc()]
    w_local = (
        Window.partitionBy("__bucket")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = b.withColumn("__loc_max", F.max(y_col).over(w_local))
    # per-bucket maxima: B rows, the one intentionally-tiny window
    counts = b.groupBy("__bucket").agg(F.max(y_col).alias("__bmax"))
    w_off = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__bucket", F.max("__bmax").over(w_off).alias("__off_max")
    )
    # greatest() skips NULLs (null only when BOTH are): the combined
    # strictly-preceding maximum across this bucket and all earlier ones
    prev_max = F.greatest(F.col("__loc_max"), F.col("__off_max"))
    return (
        local.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            "skyline",
            prev_max.isNull() | (F.col(y_col) > prev_max),
        )
        .drop("__bucket", "__loc_max", "__off_max")
    )
