"""Incremental aggregate maintenance — refresh a pre-aggregated mart
from new data without recomputing history.

At 100 TB the difference between "re-aggregate everything nightly" and
"merge today's partials into the mart" is the whole batch window. For
mergeable aggregates (count/sum/min/max — and avg as sum+count) the
merge is exact:

    mart' = re-aggregate( mart ∪ aggregate(new_data) ) on the keys

Both inputs are already one-row-per-key(-ish), so the merge aggregates
touch mart-cardinality rows, not fact-cardinality rows. Pair with
`sinks.overwrite_partitions` when the mart is partitioned by a time key
so only touched partitions rewrite.

Non-mergeable aggregates (exact distinct, median) need either full
recompute or sketch-backed versions (approx_count_distinct sketches
merge — not exposed here because Spark's HLL buffers aren't stable
public API across versions).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

#: aggregate spec: {output_col: (fn, input_col)} with fn mergeable
MERGE_FNS = {"count", "sum", "min", "max"}


def aggregate_partial(df: DataFrame, keys: Sequence[str], aggs: dict[str, tuple[str, str]]) -> DataFrame:
    """Aggregate raw rows into the mart's schema (one row per key)."""
    exprs = []
    for out, (fn, col) in aggs.items():
        if fn not in MERGE_FNS:
            raise ValueError(f"non-mergeable aggregate: {fn} (use count/sum/min/max)")
        exprs.append(getattr(F, fn)(F.lit(1) if fn == "count" else col).alias(out))
    return df.groupBy(*keys).agg(*exprs)


def merge_marts(mart: DataFrame, delta: DataFrame, keys: Sequence[str], aggs: dict[str, tuple[str, str]]) -> DataFrame:
    """Merge a delta aggregate into an existing mart exactly:
    count/sum re-sum, min/max re-min/max. Inputs must share the mart
    schema (keys + aggregate columns)."""
    exprs = []
    for out, (fn, _col) in aggs.items():
        merge_fn = "sum" if fn in ("count", "sum") else fn
        exprs.append(getattr(F, merge_fn)(out).alias(out))
    return mart.unionByName(delta).groupBy(*keys).agg(*exprs)


def incremental_refresh(
    mart: DataFrame | None,
    new_data: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
) -> DataFrame:
    """One-step refresh: aggregate the new slice, merge into the mart
    (or bootstrap the mart when none exists)."""
    delta = aggregate_partial(new_data, keys, aggs)
    if mart is None:
        return delta
    return merge_marts(mart, delta, keys, aggs)
