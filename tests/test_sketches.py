"""Count-min sketch properties: never-underestimate, merge algebra,
stability under repartitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_bikeshare_datawarehouse_spark.functions.sketches import (
    countmin_build,
    countmin_estimate,
    countmin_merge,
    hll_estimate,
    hll_merge,
    hll_registers,
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



def test_hll_zero_filled_and_stable(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "k long")
    regs = hll_registers(df, "k", b=6)
    rows = regs.collect()
    assert len(rows) == 64
    assert {r["register"] for r in rows} == set(range(64))
    again = hll_registers(df.repartition(5), "k", b=6)
    assert rows_set(regs) == rows_set(again)


def test_hll_merge_equals_sketch_of_union(spark):
    a = spark.createDataFrame([(i,) for i in range(3000)], "k long")
    b = spark.createDataFrame([(i,) for i in range(1500, 5000)], "k long")
    merged = hll_merge(hll_registers(a, "k"), hll_registers(b, "k"))
    union = hll_registers(a.unionByName(b), "k")
    assert rows_set(merged) == rows_set(union)


def test_hll_estimate_accuracy(spark):
    # m=64 -> standard error ~13%; allow 3 sigma
    for n in (500, 5000, 20000):
        df = spark.createDataFrame([(f"u{i}",) for i in range(n)], "k string")
        est = hll_estimate(hll_registers(df, "k", b=6))
        assert abs(est - n) / n < 0.4, (n, est)


def test_hll_validates_precision(spark):
    df = spark.createDataFrame([(1,)], "k long")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hll_registers(df, "k", b=9)


from nyc_bikeshare_datawarehouse_spark.functions.sketches import (
    kmv_estimate,
    kmv_jaccard,
    kmv_sketch,
    kmv_union,
)


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([(i % 30,) for i in range(500)], "k long")
    sk = kmv_sketch(df, "k", k=64)
    assert sk.count() == 30
    assert kmv_estimate(sk, 64) == 30.0


def test_kmv_estimate_and_union_accuracy(spark):
    a = spark.createDataFrame([(i,) for i in range(4000)], "k long")
    b = spark.createDataFrame([(i,) for i in range(2000, 8000)], "k long")
    ska, skb = kmv_sketch(a, "k", 256), kmv_sketch(b, "k", 256)
    est_a = kmv_estimate(ska, 256)
    assert abs(est_a - 4000) / 4000 < 0.25  # se ~ 1/sqrt(k-2) ~ 6%, 4 sigma
    sku = kmv_union(ska, skb, 256)
    est_u = kmv_estimate(sku, 256)
    assert abs(est_u - 8000) / 8000 < 0.25
    # jaccard(A,B) = 2000/8000 = 0.25
    j = kmv_jaccard(ska, skb, 256)
    assert 0.1 < j < 0.45
    # intersection estimate
    inter = j * est_u
    assert abs(inter - 2000) / 2000 < 0.6


def test_kmv_union_equals_sketch_of_union(spark):
    a = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    b = spark.createDataFrame([(i,) for i in range(500, 1500)], "k long")
    merged = kmv_union(kmv_sketch(a, "k", 64), kmv_sketch(b, "k", 64), 64)
    direct = kmv_sketch(a.unionByName(b), "k", 64)
    assert rows_set(merged) == rows_set(direct)


def test_kmv_k_mismatch_raises(spark):
    import pytest

    df = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    sk256 = kmv_sketch(df, "k", 256)
    # a 256-value sketch under the default k=64 would mis-normalize the
    # k-th-minimum formula — every entry point must refuse it
    with pytest.raises(ValueError, match="k=64"):
        kmv_estimate(sk256)
    with pytest.raises(ValueError, match="k=64"):
        kmv_union(sk256, sk256)
    with pytest.raises(ValueError, match="k=64"):
        kmv_jaccard(sk256, sk256)


def test_histogram_sketch_merge_equals_whole(spark):
    from nyc_bikeshare_datawarehouse_spark.functions.sketches import (
        histogram_merge,
        histogram_sketch,
    )

    a = spark.createDataFrame([(float(i),) for i in range(0, 500)], "v double")
    b = spark.createDataFrame([(float(i),) for i in range(300, 900)], "v double")
    merged = histogram_merge(
        histogram_sketch(a, "v", 0, 1000, 100), histogram_sketch(b, "v", 0, 1000, 100)
    )
    whole = histogram_sketch(a.unionByName(b), "v", 0, 1000, 100)
    assert rows_set(merged) == rows_set(whole)


def test_histogram_quantiles_within_one_bin_of_exact(spark, sf_dir):
    from nyc_bikeshare_datawarehouse_spark.functions.sketches import (
        histogram_quantiles,
        histogram_sketch,
    )
    from nyc_bikeshare_datawarehouse_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    sk = histogram_sketch(li, "l_extendedprice", 0, 110000, 1100)
    got = {
        r["q_bp"]: r["est"]
        for r in histogram_quantiles(sk, [5000, 9000, 9900], 0, 110000, 1100).collect()
    }
    exact = li.agg(
        F.expr("percentile(l_extendedprice, 0.50)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.90)").alias("p90"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
    ).first()
    # estimate error is bounded by one bin width (100) by construction
    for q_bp, key in ((5000, "p50"), (9000, "p90"), (9900, "p99")):
        assert abs(got[q_bp] - exact[key]) <= 100, (q_bp, got[q_bp], exact[key])
    # values clamp into the range: out-of-range probes land in edge bins
    tiny = spark.createDataFrame([(-5.0,), (99999999.0,)], "v double")
    edge = histogram_sketch(tiny, "v", 0, 1000, 100)
    assert {r["bin"] for r in edge.collect()} == {0, 99}


def test_histogram_sketch_validates_args(spark):
    import pytest

    from nyc_bikeshare_datawarehouse_spark.functions.sketches import (
        histogram_quantiles,
        histogram_sketch,
    )

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match="divisible"):
        histogram_sketch(df, "v", 0, 1000, 3)
    with pytest.raises(ValueError, match="hi > lo"):
        histogram_sketch(df, "v", 10, 10, 1)
    with pytest.raises(ValueError, match="q_bps"):
        histogram_quantiles(histogram_sketch(df, "v", 0, 100, 10), [0], 0, 100, 10)


def test_hll_daily_merge_tracks_exact_mau(spark, sf_dir):
    """The q_dau_mau docstring's 100 TB claim, made executable: per-day
    HLL register tables merged over a trailing window estimate the same
    MAU the exact distinct-count computes, within HLL(b=6) error
    (~1.04/sqrt(64) ~ 13%; assert 25% for slack). This is the bridge
    between the exact oracle-checked query and the sketch maintenance
    path a production pipeline would persist."""
    from pyspark.sql import functions as F

    from nyc_bikeshare_datawarehouse_spark.functions import sketches
    from nyc_bikeshare_datawarehouse_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "user_id"
    )
    days = sorted(r["day"] for r in ev.select("day").distinct().collect())
    window = days[:7]  # one trailing week is enough to prove the algebra
    per_day = [
        sketches.hll_registers(
            ev.filter(F.col("day") == d).select("user_id"), "user_id", b=6
        )
        for d in window
    ]
    merged = per_day[0]
    for regs in per_day[1:]:
        merged = sketches.hll_merge(merged, regs)
    est = sketches.hll_estimate(merged)
    exact = (
        ev.filter(F.col("day").isin(window))
        .select("user_id")
        .distinct()
        .count()
    )
    assert exact > 0
    assert abs(est - exact) / exact < 0.25, (est, exact)


def test_hll_grouped_rollup_equals_ungrouped(spark, sf_dir):
    """The rollup-primitive contract: per-group register tables merged by
    elementwise MAX over ALL groups must equal the registers built over
    the whole stream in one pass — the algebra q_wau_sketch's trailing
    windows rely on."""
    from pyspark.sql import functions as F

    from nyc_bikeshare_datawarehouse_spark.functions import sketches
    from nyc_bikeshare_datawarehouse_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "user_id"
    )
    grouped = sketches.hll_registers_grouped(ev, "user_id", ["day"], b=6)
    rolled = {
        r["register"]: r["rank"]
        for r in grouped.groupBy("register")
        .agg(F.max("rank").alias("rank"))
        .collect()
    }
    whole = {
        r["register"]: r["rank"]
        for r in sketches.hll_registers(
            ev.select("user_id"), "user_id", b=6
        ).collect()
    }
    assert rolled == whole
