"""Custom Python DataSource tests: partition planning, determinism, and
integration with the warehouse builders."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_bikeshare_datawarehouse_spark.sources.trips_datasource import TripsDataSource
from nyc_bikeshare_datawarehouse_spark.warehouse import builders


@pytest.fixture(scope="module")
def trips(spark):
    spark.dataSource.register(TripsDataSource)
    return (
        spark.read.format("bikeshare_trips")
        .option("rows_per_month", 200)
        .option("year", 2020)
        .load()
    )


def test_partition_per_month(spark, trips):
    assert trips.rdd.getNumPartitions() == 12
    assert trips.count() == 12 * 200
    months = {
        r["m"]
        for r in trips.select(F.month(F.to_timestamp("starttime")).alias("m")).distinct().collect()
    }
    assert months == set(range(1, 13))


def test_deterministic_across_reads(spark, trips):
    a = sorted(tuple(r) for r in trips.collect())
    b = sorted(
        tuple(r)
        for r in spark.read.format("bikeshare_trips")
        .option("rows_per_month", 200)
        .option("year", 2020)
        .load()
        .collect()
    )
    assert a == b


def test_feeds_warehouse_builders(spark, trips):
    fact = builders.build_trip_fact(builders.clean_trips(trips))
    assert fact.count() > 0
    assert fact.filter(F.col("birth_year").isNull()).count() > 0  # nullable path
    dim = builders.build_dim_station(trips)
    assert dim.count() > 0
