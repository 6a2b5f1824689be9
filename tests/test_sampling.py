"""Deterministic sampling tests: stability, subset monotonicity,
disjoint splits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_bikeshare_datawarehouse_spark.operators.sampling import (
    hash_sample,
    split,
    stratified_hash_sample,
)

from conftest import rows_set


@pytest.fixture()
def df(spark):
    return spark.createDataFrame([(i, "a" if i % 2 else "b") for i in range(2000)], "id long, s string")


def test_rate_and_stability(spark, df):
    s = hash_sample(df, "id", 0.1)
    n = s.count()
    assert 120 <= n <= 280  # ~10% of 2000, hash-binomial spread
    assert rows_set(s) == rows_set(hash_sample(df.repartition(7), "id", 0.1))


def test_subset_monotonicity(spark, df):
    small = {r["id"] for r in hash_sample(df, "id", 0.05).collect()}
    big = {r["id"] for r in hash_sample(df, "id", 0.5).collect()}
    assert small <= big  # a 5% sample is contained in the 50% sample


def test_stratified(spark, df):
    s = stratified_hash_sample(df, "id", "s", {"a": 1.0, "b": 0.0})
    vals = {r["s"] for r in s.select("s").distinct().collect()}
    assert vals == {"a"}
    assert s.count() == 1000


def test_split_disjoint_and_stable(spark, df):
    out = split(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000
    assert counts["train"] > counts["val"]
    # membership stable when new data arrives
    bigger = spark.createDataFrame([(i, "x") for i in range(4000)], "id long, s string")
    again = split(bigger, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    old = {r["id"]: r["split"] for r in out.collect()}
    new = {r["id"]: r["split"] for r in again.filter(F.col("id") < 2000).collect()}
    assert old == new


def test_split_weights_validated(spark, df):
    with pytest.raises(ValueError, match="sum to 1"):
        split(df, "id", {"a": 0.5, "b": 0.2})
