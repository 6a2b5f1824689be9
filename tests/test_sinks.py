"""Sink tests: DDL analogs, truncate-and-load, partitioned writes with
dynamic partition overwrite (incremental month refresh)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_bikeshare_datawarehouse_spark.sources import sinks


@pytest.fixture()
def catalog_table(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    sinks.create_table(spark, "t_sink", df)
    yield "t_sink"
    sinks.drop_table(spark, "t_sink")


def test_create_and_drop(spark, catalog_table):
    assert spark.table(catalog_table).count() == 2
    sinks.drop_table(spark, catalog_table)
    assert not spark.catalog.tableExists(catalog_table)
    sinks.drop_table(spark, catalog_table)  # idempotent


def test_insert_overwrite_truncates(spark, catalog_table):
    newer = spark.createDataFrame([(9, "z")], "id int, v string")
    sinks.insert_overwrite(newer, catalog_table)
    assert [tuple(r) for r in spark.table(catalog_table).collect()] == [(9, "z")]


def test_insert_append(spark, catalog_table):
    more = spark.createDataFrame([(3, "c")], "id int, v string")
    sinks.insert_append(more, catalog_table)
    assert spark.table(catalog_table).count() == 3


def test_dynamic_partition_overwrite(spark, tmp_path):
    path = str(tmp_path / "fact")
    full = spark.createDataFrame(
        [(1, 10, "jan"), (1, 11, "jan2"), (2, 20, "feb")], "month int, v int, tag string"
    )
    sinks.write_parquet(full, path, partition_by=["month"])
    # refresh ONLY month=2; month=1 rows must survive
    feb_fix = spark.createDataFrame([(2, 99, "feb-fixed")], "month int, v int, tag string")
    sinks.overwrite_partitions(feb_fix, path, ["month"])
    got = sorted(tuple(r) for r in spark.read.parquet(path).select("month", "v", "tag").collect())
    assert got == [(1, 10, "jan"), (1, 11, "jan2"), (2, 99, "feb-fixed")]
