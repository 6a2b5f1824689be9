"""Custom Python DataSource: deterministic synthetic Citi-Bike-shaped trips.

Demonstrates the Spark 4 Python DataSource API (pyspark.sql.datasource) as
the engine's native answer to the reference's ingest layer: where the
reference downloaded 12 monthly zip files and looped over them on the
driver (etl_dag.py:45-95, etl.py:53-103), this source plans **one input
partition per month** — the natural parallel unit — and each executor
generates/reads its month independently. Swap the row generator for an
HTTP+zip reader and the partition planning stays identical.

Rows are deterministic (splitmix-style counter hashing, no RNG state), so
reads are reproducible across runs and partition layouts. Column names
match the raw trip CSV exactly (spaces included, FIXTURES.md §A1) so the
output feeds `warehouse.builders` unchanged.

Usage:
    spark.dataSource.register(TripsDataSource)
    df = (spark.read.format("bikeshare_trips")
          .option("rows_per_month", 1000).option("year", 2020).load())
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql import types as T

TRIPS_SCHEMA = T.StructType([
    T.StructField("tripduration", T.IntegerType()),
    T.StructField("starttime", T.StringType()),
    T.StructField("stoptime", T.StringType()),
    T.StructField("start station id", T.IntegerType()),
    T.StructField("start station name", T.StringType()),
    T.StructField("start station latitude", T.DoubleType()),
    T.StructField("start station longitude", T.DoubleType()),
    T.StructField("end station id", T.IntegerType()),
    T.StructField("end station name", T.StringType()),
    T.StructField("end station latitude", T.DoubleType()),
    T.StructField("end station longitude", T.DoubleType()),
    T.StructField("bikeid", T.IntegerType()),
    T.StructField("usertype", T.StringType()),
    T.StructField("birth year", T.IntegerType()),
    T.StructField("gender", T.IntegerType()),
])

_DAYS = {1: 31, 2: 29, 3: 31, 4: 30, 5: 31, 6: 30, 7: 31, 8: 31, 9: 30, 10: 31, 11: 30, 12: 31}


def _mix(x: int) -> int:
    """splitmix64 finalizer — deterministic counter hash (public domain)."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


class _MonthPartition(InputPartition):
    def __init__(self, month: int):
        self.month = month


class TripsReader(DataSourceReader):
    def __init__(self, options):
        self.rows_per_month = int(options.get("rows_per_month", 1000))
        self.year = int(options.get("year", 2020))
        self.n_stations = int(options.get("n_stations", 50))

    def partitions(self):
        # one partition per month — the reference's monthly-file layout as
        # a parallel plan, not a driver loop
        return [_MonthPartition(m) for m in range(1, 13)]

    def read(self, partition):
        m = partition.month
        days = _DAYS[m] if self.year == 2020 else min(_DAYS[m], 28)
        for i in range(self.rows_per_month):
            h = _mix(self.year * 1_000_000 + m * 10_000 + i)
            dur = 120 + h % 3600
            day = 1 + (h >> 8) % days
            hour = (h >> 16) % 24
            minute = (h >> 24) % 60
            sid = 1 + (h >> 32) % self.n_stations
            eid = 1 + (h >> 40) % self.n_stations
            start = f"{self.year}-{m:02d}-{day:02d} {hour:02d}:{minute:02d}:00.0000"
            end_minute_total = hour * 3600 + minute * 60 + dur
            eh, rem = divmod(end_minute_total, 3600)
            stop = f"{self.year}-{m:02d}-{day:02d} {min(eh, 23):02d}:{rem // 60:02d}:{rem % 60:02d}.0000"
            yield (
                dur, start, stop,
                sid, f"station {sid}", 40.6 + sid / 1000.0, -74.1 + sid / 1000.0,
                eid, f"station {eid}", 40.6 + eid / 1000.0, -74.1 + eid / 1000.0,
                10_000 + (h >> 48) % 500,
                "Subscriber" if h % 10 < 8 else "Customer",
                (1950 + h % 55) if h % 7 != 0 else None,  # nullable birth year
                h % 3,
            )


class TripsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "bikeshare_trips"

    def schema(self):
        return TRIPS_SCHEMA

    def reader(self, schema):
        return TripsReader(self.options)
