"""Count-min sketch properties: never-underestimate, merge algebra,
stability under repartitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_bikeshare_datawarehouse_spark.functions.sketches import (
    countmin_build,
    countmin_estimate,
    countmin_merge,
)

from conftest import rows_set


@pytest.fixture()
def stream(spark):
    # zipf-ish: key k appears 200 // (k + 1) times
    rows = [(f"k{k}",) for k in range(60) for _ in range(200 // (k + 1))]
    return spark.createDataFrame(rows, "token string")


def test_estimate_never_below_exact(spark, stream):
    grid = countmin_build(stream, "token", depth=4, width=64)
    exact = stream.groupBy("token").agg(F.count(F.lit(1)).alias("exact_n"))
    est = countmin_estimate(grid, exact, "token", depth=4, width=64)
    bad = est.filter(F.col("cm_est") < F.col("exact_n")).count()
    assert bad == 0
    # with 64 buckets and 60 keys, the top key should estimate exactly
    top = est.orderBy(F.desc("exact_n")).first()
    assert top["cm_est"] >= top["exact_n"] == 200


def test_absent_key_estimates_from_collisions_only(spark, stream):
    grid = countmin_build(stream, "token", depth=4, width=256)
    probes = spark.createDataFrame([("never-seen",)], "token string")
    est = countmin_estimate(grid, probes, "token", depth=4, width=256).first()
    assert est["cm_est"] >= 0  # 0 unless all 4 cells collide


def test_merge_equals_full_build(spark, stream):
    a = stream.filter(F.substring("token", 2, 10).cast("int") % 2 == 0)
    b = stream.filter(F.substring("token", 2, 10).cast("int") % 2 == 1)
    merged = countmin_merge(
        countmin_build(a, "token", depth=4, width=64),
        countmin_build(b, "token", depth=4, width=64),
    )
    full = countmin_build(stream, "token", depth=4, width=64)
    assert rows_set(merged) == rows_set(full)


def test_grid_bounded_and_stable(spark, stream):
    grid = countmin_build(stream, "token", depth=4, width=64)
    assert grid.count() <= 4 * 64
    again = countmin_build(stream.repartition(7), "token", depth=4, width=64)
    assert rows_set(grid) == rows_set(again)
