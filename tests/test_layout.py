"""Z-order layout: interleave arithmetic and the actual data-skipping
evidence — per-file min-max boxes measured from written parquet."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from nyc_bikeshare_datawarehouse_spark.operators.layout import write_zordered, zvalue


def test_zvalue_interleave_known_bits(spark):
    # cols=[d1,d2]: d1 -> even output bits, d2 -> odd. d1=3 (0b11),
    # d2=1 (0b01), bits=2: bits 0,2 from d1, bit 1 from d2 -> 0b111 = 7
    df = spark.createDataFrame([(3, 1)], "d1 long, d2 long")
    got = df.select(zvalue([F.col("d1"), F.col("d2")], bits=2).alias("z")).first()["z"]
    assert got == 7
    # locality: adjacent cells differ in low z bits only
    df2 = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (1023, 1023)], "d1 long, d2 long")
    zs = [r["z"] for r in df2.select(zvalue([F.col("d1"), F.col("d2")], 10).alias("z")).collect()]
    assert zs == [0, 1, 2, (1 << 20) - 1]


def test_zvalue_validates_args(spark):
    with pytest.raises(ValueError):
        zvalue([], bits=4)
    with pytest.raises(ValueError):
        zvalue([F.lit(1), F.lit(2)], bits=32)  # 64 bits > signed long


def _file_boxes(files, cols):
    """Per-file [min, max] of each column — what parquet footer stats
    expose to a scan's skipping logic."""
    import duckdb

    boxes = []
    for f in files:
        sel = ", ".join(f"MIN({c}), MAX({c})" for c in cols)
        row = duckdb.sql(f"SELECT {sel} FROM read_parquet('{f}')").fetchone()
        boxes.append([(row[2 * i], row[2 * i + 1]) for i in range(len(cols))])
    return boxes


def _files_hit(boxes, dim, lo, hi):
    return sum(1 for b in boxes if not (b[dim][1] < lo or b[dim][0] > hi))


def test_zorder_skips_on_both_dims_where_single_sort_cannot(spark, tmp_path):
    import random

    rng = random.Random(3)
    rows = [(rng.randrange(1024), rng.randrange(1024)) for _ in range(4096)]
    df = spark.createDataFrame(rows, "x long, y long")

    zpath = os.path.join(str(tmp_path), "zorder")
    write_zordered(df, zpath, [F.col("x"), F.col("y")], bits=10, num_files=16)
    xpath = os.path.join(str(tmp_path), "xsort")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(xpath)

    zfiles = sorted(glob.glob(os.path.join(zpath, "part-*.parquet")))
    xfiles = sorted(glob.glob(os.path.join(xpath, "part-*.parquet")))
    assert len(zfiles) == 16 and len(xfiles) == 16
    zb = _file_boxes(zfiles, ["x", "y"])
    xb = _file_boxes(xfiles, ["x", "y"])

    # predicate on x: the x-sorted layout is optimal, z-order still
    # skips most files (top z bits carry x's top bits too)
    assert _files_hit(xb, 0, 0, 63) <= 2
    assert _files_hit(zb, 0, 0, 63) <= 8
    # predicate on y: the x-sorted layout cannot skip ANYTHING (every
    # file spans ~the full y range); z-order skips most files
    assert _files_hit(xb, 1, 0, 63) == 16
    assert _files_hit(zb, 1, 0, 63) <= 8


def _py_xy2d(n: int, x: int, y: int) -> int:
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_reference_and_is_adjacent(spark):
    from nyc_bikeshare_datawarehouse_spark.operators.layout import hilbert_value

    bits, n = 4, 16
    cells = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(cells, "x int, y int")
    got = {
        (r["x"], r["y"]): r["h"]
        for r in df.withColumn(
            "h", hilbert_value(F.col("x"), F.col("y"), bits)
        ).collect()
    }
    want = {(x, y): _py_xy2d(n, x, y) for x, y in cells}
    assert got == want
    # the property z-order lacks: consecutive indices are grid NEIGHBORS
    inv = {d: xy for xy, d in want.items()}
    assert all(
        abs(inv[d][0] - inv[d + 1][0]) + abs(inv[d][1] - inv[d + 1][1]) == 1
        for d in range(n * n - 1)
    )


def test_hilbert_validates_bits(spark):
    from nyc_bikeshare_datawarehouse_spark.operators.layout import (
        hilbert_value,
        with_hilbert,
    )

    with pytest.raises(ValueError):
        hilbert_value(F.lit(1), F.lit(2), bits=7)  # expression form caps at 6
    with pytest.raises(ValueError):
        with_hilbert(None, F.lit(1), F.lit(2), bits=17)


def test_with_hilbert_matches_expression_form(spark):
    # the barriered per-level form must be value-identical to the
    # single-expression walk (and to the python reference at bits=8,
    # where the single-expression tree would stall codegen)
    from nyc_bikeshare_datawarehouse_spark.operators.layout import (
        hilbert_value,
        with_hilbert,
    )

    cells = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(cells, "x int, y int")
    a = {
        (r["x"], r["y"]): r["h"]
        for r in with_hilbert(df, F.col("x"), F.col("y"), 4, "h").collect()
    }
    b = {
        (r["x"], r["y"]): r["h"]
        for r in df.withColumn("h", hilbert_value(F.col("x"), F.col("y"), 4)).collect()
    }
    assert a == b
    big = [(x * 37 % 256, x * 101 % 256) for x in range(300)]
    dfb = spark.createDataFrame(big, "x int, y int")
    got = {
        (r["x"], r["y"]): r["h"]
        for r in with_hilbert(dfb, F.col("x"), F.col("y"), 8, "h").collect()
    }
    want = {(x, y): _py_xy2d(256, x, y) for x, y in big}
    assert got == want


def test_hilbert_layout_skips_on_both_dims(spark, tmp_path):
    import random

    from nyc_bikeshare_datawarehouse_spark.operators.layout import write_hilbert

    rng = random.Random(5)
    rows = [(rng.randrange(256), rng.randrange(256)) for _ in range(4096)]
    df = spark.createDataFrame(rows, "x long, y long")
    hpath = os.path.join(str(tmp_path), "hilbert")
    write_hilbert(df, hpath, F.col("x"), F.col("y"), bits=8, num_files=16)
    files = sorted(glob.glob(os.path.join(hpath, "part-*.parquet")))
    assert len(files) >= 8
    boxes = _file_boxes(files, ["x", "y"])
    # a narrow predicate on EITHER dim must skip most files
    hit_x = _files_hit(boxes, 0, 10, 41)   # 1/8 of the x range
    hit_y = _files_hit(boxes, 1, 100, 131)
    assert hit_x <= len(files) // 2
    assert hit_y <= len(files) // 2
