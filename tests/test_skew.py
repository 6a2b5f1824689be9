"""Salted-join / two-phase-agg equivalence tests: skew mitigation must not
change results."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_bikeshare_datawarehouse_spark.operators.skew import salted_join, two_phase_agg

from conftest import rows_set


def _skewed(spark):
    # key 1 is hot (90 rows), keys 2..10 have one row each
    rows = [(1, i) for i in range(90)] + [(k, k * 100) for k in range(2, 11)]
    return spark.createDataFrame(rows, "k int, v int")


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([(k, f"n{k}") for k in range(1, 11)], "k int, name string")
    plain = rows_set(big.join(small, "k").select("k", "v", "name"))
    salted = rows_set(salted_join(big, small, "k", num_salts=4).select("k", "v", "name"))
    assert salted == plain


def test_salted_left_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([(1, "one")], "k int, name string")
    plain = rows_set(big.join(small, "k", "left").select("k", "v", "name"))
    salted = rows_set(salted_join(big, small, "k", num_salts=4, how="left").select("k", "v", "name"))
    assert salted == plain


def test_salted_semi_anti_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([(1, "one"), (5, "five")], "k int, name string")
    for how in ("left_semi", "left_anti"):
        plain = rows_set(big.join(small, "k", how).select("k", "v"))
        salted = rows_set(salted_join(big, small, "k", num_salts=4, how=how).select("k", "v"))
        assert salted == plain, how


def test_salted_join_rejects_unsafe_how(spark):
    import pytest

    big = _skewed(spark)
    small = spark.createDataFrame([(1, "one")], "k int, name string")
    for how in ("right", "full", "outer", "right_outer"):
        with pytest.raises(ValueError, match="not salt-safe"):
            salted_join(big, small, "k", num_salts=4, how=how)


def test_two_phase_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = rows_set(
        df.groupBy("k").agg(
            F.sum("v").alias("sum_v"),
            F.count(F.lit(1)).alias("count_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
    )
    salted = rows_set(
        two_phase_agg(df, ["k"], {"v": "sum"}, num_salts=4)
        .join(two_phase_agg(df, ["k"], {"v": "count"}, num_salts=4), "k")
        .join(two_phase_agg(df, ["k"], {"v": "min"}, num_salts=4), "k")
        .join(two_phase_agg(df, ["k"], {"v": "max"}, num_salts=4), "k")
        .select("k", "sum_v", "count_v", "min_v", "max_v")
    )
    assert salted == plain
