"""Salted-join / two-phase-agg equivalence tests: skew mitigation must not
change results."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_bikeshare_datawarehouse_spark.operators.skew import salted_join, skew_topk, two_phase_agg

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


def test_skew_topk_matches_plain_window(spark):
    from pyspark.sql import Window

    # hot group 1 (90 rows) + singleton groups; unique id column for the
    # total-order tie-break
    rows = [(1, i, i % 7) for i in range(90)] + [(k, k * 100, k) for k in range(2, 11)]
    df = spark.createDataFrame(rows, "k int, id int, v int")
    order = [F.desc("v"), F.asc("id")]
    w = Window.partitionBy("k").orderBy(*order)
    plain = rows_set(
        df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 3)
    )
    salted = rows_set(skew_topk(df, ["k"], order, k=3, num_salts=4))
    assert salted == plain


def test_skew_topk_k_exceeds_group_size(spark):
    # groups smaller than k return all their rows, ranked
    df = spark.createDataFrame([(1, 1), (1, 2), (2, 3)], "k int, id int")
    out = skew_topk(df, ["k"], [F.asc("id")], k=10, num_salts=2)
    assert rows_set(out) == [(1, 1, 1), (1, 2, 2), (2, 3, 1)]


def test_skew_topk_validation(spark):
    import pytest

    df = _skewed(spark)
    with pytest.raises(ValueError, match="k must be"):
        skew_topk(df, ["k"], [F.asc("v")], k=0)
    with pytest.raises(ValueError, match="num_salts"):
        skew_topk(df, ["k"], [F.asc("v")], k=1, num_salts=1)


def test_skew_topk_first_window_is_salted(spark):
    # the heavy (full-data) window must partition on (key, salt); only the
    # bounded survivor set may hit the unsalted per-key window
    df = _skewed(spark).withColumn("id", F.col("v"))
    out = skew_topk(df, ["k"], [F.desc("v"), F.asc("id")], k=3, num_salts=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    first_window = plan[plan.rindex("Window") :]  # windows print innermost-last
    assert "__salt" in first_window


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


def test_skew_topk_quota_sample_nested(spark):
    # hash-ordered top-k == deterministic quota sample; smaller quotas
    # must be prefixes of larger ones (nested mixtures stay coherent)
    from pyspark.sql import functions as F

    from nyc_bikeshare_datawarehouse_spark.operators.skew import skew_topk

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(600)], "id long, g string"
    )
    h = F.md5(F.col("id").cast("string"))
    small = skew_topk(df, ["g"], [F.asc(h), F.asc("id")], k=10)
    big = skew_topk(df, ["g"], [F.asc(h), F.asc("id")], k=40)
    s_ids = {(r["g"], r["id"]) for r in small.collect()}
    b_ids = {(r["g"], r["id"]) for r in big.collect()}
    assert len(s_ids) == 30 and len(b_ids) == 120
    assert s_ids <= b_ids
