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
