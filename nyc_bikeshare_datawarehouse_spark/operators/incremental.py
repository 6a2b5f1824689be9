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

#: aggregate spec: {output_col: (fn, input_col)} with fn mergeable.
#: "hll" keeps a Datasketches HLL sketch column — the mergeable form of
#: COUNT DISTINCT (exact distinct does NOT merge; the sketch does).
#: Union is commutative/associative — slice ORDER never changes the
#: result — though a union-of-sketches may differ from one single-pass
#: sketch by a fraction of the error bound (representation promotion).
#: Read the estimate with `finalize`.
MERGE_FNS = {"count", "sum", "min", "max", "hll"}


def aggregate_partial(df: DataFrame, keys: Sequence[str], aggs: dict[str, tuple[str, str]]) -> DataFrame:
    """Aggregate raw rows into the mart's schema (one row per key)."""
    exprs = []
    for out, (fn, col) in aggs.items():
        if fn not in MERGE_FNS:
            raise ValueError(f"non-mergeable aggregate: {fn} (use count/sum/min/max/hll)")
        if fn == "hll":
            exprs.append(F.hll_sketch_agg(col).alias(out))
        else:
            exprs.append(getattr(F, fn)(F.lit(1) if fn == "count" else col).alias(out))
    return df.groupBy(*keys).agg(*exprs)


def merge_marts(mart: DataFrame, delta: DataFrame, keys: Sequence[str], aggs: dict[str, tuple[str, str]]) -> DataFrame:
    """Merge a delta aggregate into an existing mart exactly:
    count/sum re-sum, min/max re-extremize, hll sketches union. Inputs
    must share the mart schema (keys + aggregate columns)."""
    exprs = []
    for out, (fn, _col) in aggs.items():
        if fn == "hll":
            exprs.append(F.hll_union_agg(out).alias(out))
        else:
            merge_fn = "sum" if fn in ("count", "sum") else fn
            exprs.append(getattr(F, merge_fn)(out).alias(out))
    return mart.unionByName(delta).groupBy(*keys).agg(*exprs)


def finalize(mart: DataFrame, aggs: dict[str, tuple[str, str]]) -> DataFrame:
    """Convert sketch columns to readable estimates (hll -> distinct
    estimate as bigint); other columns pass through."""
    cols = []
    for c in mart.columns:
        if c in aggs and aggs[c][0] == "hll":
            cols.append(F.hll_sketch_estimate(c).alias(c))
        else:
            cols.append(F.col(c))
    return mart.select(*cols)


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
