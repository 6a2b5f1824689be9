"""Bloom prefilter properties: no false negatives, useful selectivity,
empty-build behavior, end-to-end join equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_bikeshare_datawarehouse_spark.operators.bloom import bloom_build, bloom_prefilter


def _frames(spark):
    build = spark.createDataFrame([(i * 7,) for i in range(100)], "k long")
    probe = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    return build, probe


def test_no_false_negatives(spark):
    build, probe = _frames(spark)
    bloom = bloom_build(build, "k", num_bits=1024, num_hashes=3)
    kept = {r["k"] for r in bloom_prefilter(probe, "k", bloom, 1024, 3).collect()}
    true = {r["k"] for r in build.collect() if r["k"] < 2000}
    assert true <= kept


def test_false_positive_rate_bounded(spark):
    build, probe = _frames(spark)
    bloom = bloom_build(build, "k", num_bits=4096, num_hashes=3)
    kept = bloom_prefilter(probe, "k", bloom, 4096, 3).count()
    # ~286 true members; 300 bits set of 4096 -> fpp ~ (0.073)^3 ~ 4e-4
    assert kept < 320


def test_empty_build_filters_everything(spark):
    build, probe = _frames(spark)
    bloom = bloom_build(build.filter(F.lit(False)), "k", num_bits=1024, num_hashes=3)
    assert bloom_prefilter(probe, "k", bloom, 1024, 3).count() == 0


def test_prefilter_plus_exact_equals_plain_semi_join(spark):
    build, probe = _frames(spark)
    bloom = bloom_build(build, "k", num_bits=512, num_hashes=2)  # deliberately lossy
    cand = bloom_prefilter(probe, "k", bloom, 512, 2)
    fixed = cand.join(build, "k", "left_semi")
    plain = probe.join(build, "k", "left_semi")
    assert {r["k"] for r in fixed.collect()} == {r["k"] for r in plain.collect()}
