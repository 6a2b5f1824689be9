"""Z-order (Morton) clustering for data-skipping file layouts.

A parquet lake prunes with per-file/row-group min-max stats; sorting by
ONE column makes its ranges tight and every other column's ranges
useless. Interleaving the bits of several columns (Morton 1966; the
technique behind DBMS "Z-ORDER BY" clustering, e.g. Delta/Databricks
OPTIMIZE ZORDER) gives every participating column partially-sorted
locality, so a selective predicate on ANY of them skips most files.

At 100 TB the layout write is `repartitionByRange` on the z-value — a
range exchange driven by sampled quantiles, balanced regardless of the
dims' joint distribution — plus a within-partition sort; no global
single-task sort anywhere. `q_zorder_layout` verifies the z-arithmetic
and the resulting bounding-box tightness against an ANSI oracle, and
tests/test_layout.py measures the actual skip rate from written parquet
footers (z-order vs single-column sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def zvalue(cols: Sequence[Column], bits: int = 16) -> Column:
    """Interleave the low `bits` bits of the given non-negative int
    columns: column j contributes its bit i to output bit i*len(cols)+j.
    Callers bucket/normalize dims into [0, 2^bits) first — a quantile
    or modulo bucket both work; what matters is that nearby values land
    in nearby buckets. Pure codegen (bits*len(cols) shift-and-or terms),
    no shuffle."""
    if not cols:
        raise ValueError("zvalue needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(f"bits*len(cols) must fit a signed long, got {bits}*{len(cols)}")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(cols) + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[Column],
    bits: int = 16,
    num_files: int = 16,
) -> None:
    """Write `df` as parquet clustered by the z-value of `cols`:
    range-partition on z (sampled quantile boundaries — balanced files
    with no single-task sort), sort within each partition, drop the
    helper column. Each output file then covers a compact z-range, i.e.
    a small hyper-rectangle of the dims — the property the skip-rate
    test measures from the written footers."""
    zz = df.withColumn("__z", zvalue(cols, bits))
    (
        zz.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def hilbert_value(x: Column, y: Column, bits: int = 8) -> Column:
    """2-D Hilbert curve index of the cell (x, y) on a 2^bits × 2^bits
    grid (Hilbert 1891; the standard xy→d quadrant-rotation walk, public
    algorithm). Strictly better locality than `zvalue` for layout
    clustering: consecutive indices are always GRID NEIGHBORS (Manhattan
    distance 1, tested), so a file covering a contiguous index range
    covers one connected blob — z-order's big-bit jumps periodically
    split a file across two far-apart rectangles, inflating its
    bounding box exactly where min-max skipping pays.

    SINGLE-EXPRESSION form, capped at bits <= 6: the rotation state
    makes each level's (x, y) a conditional over BOTH of the previous
    level's, so the expression tree grows ~4× per level — at bits=8
    Catalyst/codegen chokes on the ~4^8-node tree for MINUTES (measured:
    a 1-query run that normally takes 9s hung past 540s). Use
    `with_hilbert` for real layouts: it materializes each level behind a
    projection-collapse barrier, turning the growth linear at the cost
    of one Generate node per level. Inputs must be non-negative ints
    below 2^bits (bucket/modulo-normalize first, as with zvalue)."""
    if not 1 <= bits <= 6:
        raise ValueError(
            f"bits must be in [1, 6] for the single-expression form "
            f"(use with_hilbert for more), got {bits}"
        )
    # reflection uses the FULL grid extent n-1 (the canonical form):
    # the s-1 variant is also a valid Hilbert curve but drives (x, y)
    # NEGATIVE mid-walk, which breaks any replay that tests bits with
    # floor-div/mod (SQL oracles) instead of two's-complement AND
    n1 = (1 << bits) - 1
    x = x.cast("long")
    y = y.cast("long")
    d = F.lit(0).cast("long")
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        d = d + F.lit(s * s).cast("long") * (F.lit(3).cast("long") * rx).bitwiseXOR(ry)
        refl = (ry == F.lit(0)) & (rx == F.lit(1))
        new_x = F.when(ry == F.lit(0), F.when(refl, F.lit(n1) - y).otherwise(y)).otherwise(x)
        new_y = F.when(ry == F.lit(0), F.when(refl, F.lit(n1) - x).otherwise(x)).otherwise(y)
        x, y = new_x, new_y
    return d


def with_hilbert(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 8,
    out_col: str = "hilbert",
) -> DataFrame:
    """Append the 2-D Hilbert index as `out_col` — the scalable form of
    `hilbert_value`: each rotation level's (x, y, d) state is
    materialized as ONE struct column behind an explode(array(...))
    barrier (dedup._materialized pattern — a Generate node is a
    projection-collapse boundary), so every level's expressions
    reference plain columns of the previous level instead of inlining
    its whole tree. Expression size is LINEAR in `bits` (vs ~4^bits
    single-expression), at the cost of `bits` Generate nodes — each
    emits exactly one row per row, no shuffle anywhere."""
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    n1 = (1 << bits) - 1
    keep = list(df.columns)
    state = F.struct(
        x.cast("long").alias("x"),
        y.cast("long").alias("y"),
        F.lit(0).cast("long").alias("d"),
    )
    cur = df.select(*keep, F.explode(F.array(state)).alias("__hs"))
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        X, Y, D = F.col("__hs.x"), F.col("__hs.y"), F.col("__hs.d")
        rx = F.when(X.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        ry = F.when(Y.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        refl = (ry == F.lit(0)) & (rx == F.lit(1))
        nxt = F.struct(
            F.when(ry == F.lit(0), F.when(refl, F.lit(n1) - Y).otherwise(Y))
            .otherwise(X)
            .alias("x"),
            F.when(ry == F.lit(0), F.when(refl, F.lit(n1) - X).otherwise(X))
            .otherwise(Y)
            .alias("y"),
            (D + F.lit(s * s).cast("long")
             * (F.lit(3).cast("long") * rx).bitwiseXOR(ry)).alias("d"),
        )
        cur = cur.select(*keep, F.explode(F.array(nxt)).alias("__hs"))
    return cur.select(*keep, F.col("__hs.d").alias(out_col))


def write_hilbert(
    df: DataFrame,
    path: str,
    x: Column,
    y: Column,
    bits: int = 8,
    num_files: int = 16,
) -> None:
    """Parquet write clustered by the Hilbert index — same
    repartitionByRange + within-partition sort discipline as
    `write_zordered` (sampled range boundaries, balanced files, no
    single-task sort)."""
    hh = with_hilbert(df, x, y, bits, out_col="__h")
    (
        hh.repartitionByRange(num_files, "__h")
        .sortWithinPartitions("__h")
        .drop("__h")
        .write.mode("overwrite")
        .parquet(path)
    )
