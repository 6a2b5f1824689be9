"""Deterministic sampling tests: stability, subset monotonicity,
disjoint splits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_bikeshare_datawarehouse_spark.operators.sampling import (
    hash_sample,
    split,
    stratified_hash_sample,
    mixture_upsample,
    shard_assign,
    weighted_hash_sample,
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


@pytest.fixture()
def wdf(spark):
    # weights 0, tiny, and cap-exceeding in one frame
    rows = [(i, [0, 10, 1000, 20000][i % 4]) for i in range(2000)]
    return spark.createDataFrame(rows, "id long, w long")


def test_weighted_zero_weight_never_selected(spark, wdf):
    s = weighted_hash_sample(wdf, "id", "w", bp_per_unit=5)
    assert s.filter(F.col("w") == 0).count() == 0


def test_weighted_cap_selects_all(spark, wdf):
    # w=20000, bp=5 -> threshold capped at MOD: probability 1
    s = weighted_hash_sample(wdf, "id", "w", bp_per_unit=5)
    assert s.filter(F.col("w") == 20000).count() == 500


def test_weighted_rate_tracks_weight(spark, wdf):
    # w=1000, bp=5 -> p=0.5; w=10 -> p=0.005
    s = weighted_hash_sample(wdf, "id", "w", bp_per_unit=5)
    mid = s.filter(F.col("w") == 1000).count()
    lo = s.filter(F.col("w") == 10).count()
    assert 180 <= mid <= 320  # ~250 of 500
    assert lo <= 15  # ~2.5 of 500


def test_weighted_monotone_in_rate_and_stable(spark, wdf):
    small = {r["id"] for r in weighted_hash_sample(wdf, "id", "w", 2).collect()}
    big = {r["id"] for r in weighted_hash_sample(wdf, "id", "w", 8).collect()}
    assert small <= big  # raising the rate only adds rows
    again = {
        r["id"] for r in weighted_hash_sample(wdf.repartition(7), "id", "w", 2).collect()
    }
    assert again == small


def test_weighted_negative_rate_rejected(spark, wdf):
    with pytest.raises(ValueError, match="bp_per_unit"):
        weighted_hash_sample(wdf, "id", "w", -1)


@pytest.fixture()
def mixdf(spark):
    # weight_bp: 0 epochs, exactly 2, fractional 1.5, fractional 0.25
    rows = [(i, {0: 0, 1: 20000, 2: 15000, 3: 2500}[i % 4]) for i in range(400)]
    return spark.createDataFrame(rows, "id long, weight_bp long")


def test_mixture_zero_weight_drops_row(spark, mixdf):
    out = mixture_upsample(mixdf, "id", "weight_bp")
    assert out.filter(F.col("weight_bp") == 0).count() == 0


def test_mixture_integer_weight_exact_copies(spark, mixdf):
    out = mixture_upsample(mixdf, "id", "weight_bp").filter(F.col("weight_bp") == 20000)
    per = out.groupBy("id").count().select("count").distinct().collect()
    assert [r["count"] for r in per] == [2]
    epochs = out.filter(F.col("id") == 1).select("epoch").orderBy("epoch").collect()
    assert [r["epoch"] for r in epochs] == [1, 2]


def test_mixture_fractional_expectation_and_stability(spark, mixdf):
    out = mixture_upsample(mixdf, "id", "weight_bp")
    n_15 = out.filter(F.col("weight_bp") == 15000).count()
    assert 115 <= n_15 <= 185  # 100 ids x ~1.5 epochs
    n_025 = out.filter(F.col("weight_bp") == 2500).count()
    assert 10 <= n_025 <= 45  # 100 ids x ~0.25 epochs
    again = mixture_upsample(mixdf.repartition(5), "id", "weight_bp")
    assert rows_set(out) == rows_set(again)


def test_mixture_monotone_in_weight(spark, mixdf):
    lo = mixture_upsample(mixdf, "id", "weight_bp")
    hi = mixture_upsample(
        mixdf.withColumn("weight_bp", F.col("weight_bp") + 5000), "id", "weight_bp"
    )
    assert rows_set(lo) <= rows_set(hi)


def test_shard_assign_partitions_and_matches_sequential(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    out = shard_assign(df, "id", shard_size=100)
    rows = out.orderBy("shard", "pos").collect()
    assert len(rows) == 1000
    # every shard full (1000 is a multiple of 100), positions 0..99
    from collections import Counter

    per_shard = Counter(r["shard"] for r in rows)
    assert set(per_shard.values()) == {100}
    assert sorted(set(r["pos"] for r in rows)) == list(range(100))
    # distributed two-phase rank == the sequential md5 sort
    import hashlib

    seq = sorted(range(1000), key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    expect = {(i, rank // 100, rank % 100) for rank, i in enumerate(seq)}
    assert {(r["id"], r["shard"], r["pos"]) for r in rows} == expect


def test_shard_assign_validates_size(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        shard_assign(df, "id", shard_size=0)


def test_temperature_mix_weights_hand_computed(spark):
    from nyc_bikeshare_datawarehouse_spark.operators.sampling import (
        temperature_mix_weights,
    )

    # n=100 vs n=400: s = floor(sqrt(n)*1e4) = 100_000 / 200_000,
    # N=500, S=300_000 -> w = floor(1e4*500*s / (n*3e5)) = 16666 / 8333
    rows = [(i, "lo") for i in range(100)] + [(1000 + i, "hi") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {r["lang"]: (r["n_docs"], r["weight_bp"])
           for r in temperature_mix_weights(df, "lang").collect()}
    assert got == {"lo": (100, 16666), "hi": (400, 8333)}
    # expected total size preserved within rounding: sum(n*w)/1e4 ~ N
    total = sum(n * w for n, w in got.values()) / 10000
    assert abs(total - 500) < 1  # only floor rounding lost


def test_temperature_mix_upweights_low_resource(spark):
    from nyc_bikeshare_datawarehouse_spark.operators.sampling import (
        temperature_mix_weights,
    )

    rows = [(i, "head") for i in range(900)] + [(2000 + i, "tail") for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {r["lang"]: r["weight_bp"] for r in temperature_mix_weights(df, "lang").collect()}
    assert got["tail"] > 10000 > got["head"]  # tail > 1 epoch, head < 1


def test_rendezvous_moves_only_into_the_new_shard(spark):
    from nyc_bikeshare_datawarehouse_spark.operators.sampling import rendezvous_shard

    df = spark.range(3000).select(F.col("id"))
    out = df.select(
        "id",
        rendezvous_shard("id", 8, "s8"),
        rendezvous_shard("id", 9, "s9"),
    ).collect()
    moved = [r for r in out if r["s8"] != r["s9"]]
    # THE rendezvous invariant (exact, not statistical): a key moves iff
    # the NEW shard's candidate hash beats its old winner — so every
    # moved key lands in shard 8 (the added one)
    assert all(r["s9"] == 8 for r in moved)
    # expected moved fraction 1/9 ~ 11.1%; generous band for 3000 keys
    assert 0.07 < len(moved) / len(out) < 0.16
    # balance: every shard under 9 is populated
    assert {r["s9"] for r in out} == set(range(9))


def test_rendezvous_shard_validates(spark):
    from nyc_bikeshare_datawarehouse_spark.operators.sampling import rendezvous_shard

    with pytest.raises(ValueError):
        rendezvous_shard("id", 0)
