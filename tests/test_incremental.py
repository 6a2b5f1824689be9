"""Incremental aggregate refresh: merged result must equal a full
recompute over all data, slice by slice."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_bikeshare_datawarehouse_spark.operators.incremental import (
    aggregate_partial,
    incremental_refresh,
)
from nyc_bikeshare_datawarehouse_spark.sources.readers import load_table

from conftest import rows_set

AGGS = {
    "n_items": ("count", "l_quantity"),
    "sum_qty": ("sum", "l_quantity"),
    "min_disc": ("min", "l_discount"),
    "max_disc": ("max", "l_discount"),
}


def test_slicewise_refresh_equals_full_recompute(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").withColumn("ship_year", F.year("l_shipdate"))
    keys = ["ship_year", "l_returnflag"]
    full = aggregate_partial(li, keys, AGGS)

    # feed the same data in three arbitrary slices
    mart = None
    for part in range(3):
        chunk = li.filter(F.col("l_orderkey") % 3 == part)
        mart = incremental_refresh(mart, chunk, keys, AGGS)
    assert rows_set(mart) == rows_set(full)


def test_bootstrap_from_none(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").limit(100)
    mart = incremental_refresh(None, li, ["l_returnflag"], AGGS)
    assert mart.count() > 0


def test_hll_sketches_merge_exactly(spark, sf_dir):
    from nyc_bikeshare_datawarehouse_spark.operators.incremental import finalize

    li = load_table(spark, sf_dir, "lineitem")
    aggs = {"nd_orders": ("hll", "l_orderkey")}
    keys = ["l_returnflag"]
    full = finalize(aggregate_partial(li, keys, aggs), aggs)

    def refresh_in_order(order):
        mart = None
        for part in order:
            chunk = li.filter(F.col("l_partkey") % 4 == part)
            mart = incremental_refresh(mart, chunk, keys, aggs)
        return finalize(mart, aggs)

    sliced = refresh_in_order([0, 1, 2, 3])
    # union is ORDER-insensitive: reversed slice order gives identical estimates
    assert rows_set(sliced) == rows_set(refresh_in_order([3, 2, 1, 0]))
    # both the merged and the single-pass estimates track exact distinct
    # within sketch error (union may differ from single-pass by a hair)
    exact = {
        r["l_returnflag"]: r["nd"]
        for r in li.groupBy("l_returnflag").agg(F.countDistinct("l_orderkey").alias("nd")).collect()
    }
    for frame in (sliced, full):
        est = {r["l_returnflag"]: r["nd_orders"] for r in frame.collect()}
        for k in exact:
            assert abs(est[k] - exact[k]) / exact[k] < 0.05


def test_non_mergeable_rejected(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError, match="non-mergeable"):
        aggregate_partial(li, ["l_returnflag"], {"bad": ("avg", "l_quantity")})
