"""Mergeable frequency sketches as DataFrame aggregations.

Count-min (Cormode & Muthukrishnan, J. Algorithms 2005): a d x w counter
grid; every key occurrence increments one cell per row via d independent
hashes; estimate(key) = min over the d cells — always >= the true count,
because collisions only ADD. This is the fixed-memory form of frequency
counting at 100 TB: the shuffle key space is d*w cells REGARDLESS of
vocabulary size, map-side combine collapses each task's stream to <= d*w
partial rows before the exchange, and grids built on disjoint corpus
slices merge by cell-wise addition (the same partial-aggregate algebra as
operators/incremental.py). Hashes are md5-derived — engine-portable, same
rationale as dedup.minhash_lsh_candidates_portable — so the entire sketch
carries a DuckDB oracle instead of a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _cm_bucket(key: Column, row_i: int, width: int) -> Column:
    """Row-i hash bucket: first 8 hex chars of md5("i:key") mod width.
    Seeding via the string prefix keeps the d hashes independent and the
    arithmetic replayable in any SQL engine."""
    h = F.md5(F.concat(F.lit(f"{row_i}:"), key))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def _cm_cells(key: Column, depth: int, width: int):
    """posexplode'd (row_i, bucket) pairs for one key occurrence."""
    return F.posexplode(F.array(*[_cm_bucket(key, i, width) for i in range(depth)]))


def countmin_build(
    stream: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Aggregate a key stream into the d x w grid: (row_i, bucket, cell).

    One shuffle whose key space is d*w (bounded, data-independent);
    partial aggregation reduces each input partition to <= d*w rows, so
    network cost is O(tasks * d * w), not O(stream). Missing cells are
    implicit zeros."""
    key = F.col(key_col)
    return (
        stream.select(_cm_cells(key, depth, width).alias("row_i", "bucket"))
        .groupBy("row_i", "bucket")
        .agg(F.count(F.lit(1)).alias("cell"))
    )


def countmin_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise addition of two grids built with the same (depth, width)
    — the property that lets per-day / per-slice sketches roll up without
    revisiting the streams."""
    return (
        a.unionByName(b)
        .groupBy("row_i", "bucket")
        .agg(F.sum("cell").cast("long").alias("cell"))
    )


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    est_col: str = "cm_est",
) -> DataFrame:
    """Point estimates for the probe keys: min over the key's d cells.
    The grid (d*w rows) is broadcast; the probe side never shuffles its
    payload — only the final per-key min aggregation moves (probe, d)
    rows. Keys absent from the stream estimate to 0 (upward-biased like
    every count-min estimate; never below the true count)."""
    key = F.col(key_col)
    keep = list(probes.columns)
    p = probes.select("*", _cm_cells(key, depth, width).alias("row_i", "bucket"))
    joined = p.join(F.broadcast(sketch), ["row_i", "bucket"], "left")
    return joined.groupBy(*keep).agg(
        F.min(F.coalesce(F.col("cell"), F.lit(0).cast("long"))).alias(est_col)
    )
