"""Quality-gate tests on violation fixtures (FIXTURES.md §A4).

Each fixture violates exactly one gate; the reference's buggy tolerances
(one null PK allowed, inverted predicate — SURVEY §8.5) must NOT pass.
"""

from __future__ import annotations

import pytest

from nyc_bikeshare_datawarehouse_spark.warehouse import quality


@pytest.fixture()
def dim(spark):
    return spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")


def test_non_empty_pass_and_fail(spark, dim):
    assert quality.expect_non_empty(dim, "dim").passed
    empty = spark.createDataFrame([], "id int, name string")
    assert not quality.expect_non_empty(empty, "empty").passed


def test_null_pk_zero_tolerance(spark):
    # the reference passed with exactly ONE null (data_quality.py:39 `> 1`);
    # our gate fails on any null
    one_null = spark.createDataFrame([(1,), (None,)], "id int")
    many_null = spark.createDataFrame([(None,), (None,)], "id int")
    clean = spark.createDataFrame([(1,), (2,)], "id int")
    assert not quality.expect_no_null_pk(one_null, "t", "id").passed
    assert not quality.expect_no_null_pk(many_null, "t", "id").passed
    assert quality.expect_no_null_pk(clean, "t", "id").passed


def test_unique_pk(spark):
    dup = spark.createDataFrame([(1,), (1,), (2,)], "id int")
    uniq = spark.createDataFrame([(1,), (2,)], "id int")
    assert not quality.expect_unique_pk(dup, "t", "id").passed
    assert quality.expect_unique_pk(uniq, "t", "id").passed


def test_composite_unique_pk(spark):
    df = spark.createDataFrame([(1, 1), (1, 2), (2, 1)], "a int, b int")
    assert quality.expect_unique_pk(df, "t", "a", "b").passed
    assert not quality.expect_unique_pk(df, "t", "a").passed


def test_fk_integrity(spark, dim):
    ok_fact = spark.createDataFrame([(10, 1), (11, 2)], "fid int, id int")
    orphan_fact = spark.createDataFrame([(10, 1), (11, 99)], "fid int, id int")
    assert quality.expect_fk_integrity(ok_fact, dim, "fact", "id", "id").passed
    assert not quality.expect_fk_integrity(orphan_fact, dim, "fact", "id", "id").passed


def test_check_all_battery(spark, dim):
    fact = spark.createDataFrame([(10, 1), (11, 2)], "fid int, id int")
    results = quality.check_all(fact, "fact", "fid", dims=[(dim, "id", "id")])
    assert [r.gate for r in results] == ["non_empty", "no_null_pk", "unique_pk", "fk_integrity"]
    assert all(r.passed for r in results)


class TestContentChecksum:
    def test_detects_content_change_at_equal_counts(self, spark):
        from pyspark.sql import functions as F

        from nyc_bikeshare_datawarehouse_spark.warehouse.quality import (
            content_checksum,
        )

        a = spark.createDataFrame(
            [(1, "x"), (2, "y"), (3, "z")], "id long, v string"
        )
        b = spark.createDataFrame(
            [(1, "x"), (2, "y"), (3, "Z")], "id long, v string"  # one cell
        )
        cols = [F.col("id").cast("string"), F.col("v")]
        ca = content_checksum(a, cols, "t").head()
        cb = content_checksum(b, cols, "t").head()
        assert ca["n_rows"] == cb["n_rows"] == 3  # counts CANNOT tell them apart
        assert ca["content_checksum"] != cb["content_checksum"]

    def test_order_and_partitioning_invariant(self, spark):
        from pyspark.sql import functions as F

        from nyc_bikeshare_datawarehouse_spark.warehouse.quality import (
            content_checksum,
        )

        rows = [(i, f"v{i}") for i in range(100)]
        a = spark.createDataFrame(rows, "id long, v string")
        b = spark.createDataFrame(list(reversed(rows)), "id long, v string").repartition(7)
        cols = [F.col("id").cast("string"), F.col("v")]
        assert (
            content_checksum(a, cols, "t").head()["content_checksum"]
            == content_checksum(b, cols, "t").head()["content_checksum"]
        )

    def test_null_and_separator_injection_safe(self, spark):
        from pyspark.sql import functions as F

        from nyc_bikeshare_datawarehouse_spark.warehouse.quality import (
            content_checksum,
        )

        cols = [F.col("a"), F.col("b"), F.col("c")]

        def ck(rows):
            df = spark.createDataFrame(rows, "a string, b string, c string")
            return content_checksum(df, cols, "t").head()["content_checksum"]

        # NULL position matters: ('a', NULL, 'b') != ('a', 'b', NULL)
        assert ck([("a", None, "b")]) != ck([("a", "b", None)])
        # a '|' inside a value must not shift content across fields
        assert ck([("a|b", "c", "d")]) != ck([("a", "b|c", "d")])
        # NULL is distinct from every string, including '-' and ''
        assert ck([("a", None, "b")]) != ck([("a", "-", "b")])
        assert ck([("a", None, "b")]) != ck([("a", "", "b")])


class TestVerifiedBulkLoad:
    def test_roundtrip_verifies_and_tamper_detected(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from nyc_bikeshare_datawarehouse_spark.sources.sinks import drop_table
        from nyc_bikeshare_datawarehouse_spark.warehouse.quality import (
            content_checksum,
            verified_bulk_load,
        )

        src = spark.range(0, 500).select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id").cast("string")).alias("v"),
        )
        cols = [F.col("k").cast("string"), F.col("v")]
        try:
            rep = verified_bulk_load(
                spark, src, "vbl_t", cols,
                analyze_columns=["k"], path=str(tmp_path / "vbl"),
            ).head()
            assert rep["verified"] is True
            assert rep["n_rows"] == rep["loaded_rows"] == 500
            assert rep["content_checksum"] == rep["loaded_checksum"]
            # post-load ANALYZE ran: the catalog carries exact column stats
            mx = (
                spark.sql("DESCRIBE EXTENDED vbl_t k")
                .filter(F.col("info_name") == "max").head()["info_value"]
            )
            assert mx == "499"
            # tamper: SAME row count, one cell changed — the failure class
            # a COUNT(*) check cannot see, the checksum must
            tampered = spark.table("vbl_t").withColumn(
                "v",
                F.when(F.col("k") == 123, F.lit("evil")).otherwise(F.col("v")),
            )
            tampered.write.mode("overwrite").parquet(str(tmp_path / "vbl2"))
            got = content_checksum(
                spark.read.parquet(str(tmp_path / "vbl2")), cols, "t"
            ).head()
            want = content_checksum(src, cols, "t").head()
            assert got["n_rows"] == want["n_rows"]
            assert got["content_checksum"] != want["content_checksum"]
        finally:
            drop_table(spark, "vbl_t")
