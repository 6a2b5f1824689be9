"""Warehouse-builder tests on reference-shaped fixtures (FIXTURES.md §A).

Asserts the reference's *intended* semantics including its documented
divergences (SURVEY §8): subtract-implies-distinct, non-empty dim_station,
deterministic trip ids, stop-exclusive datetime dim.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_bikeshare_datawarehouse_spark.warehouse import builders

from conftest import rows_set

TRIP_COLS = (
    "tripduration int, starttime string, stoptime string, "
    "`start station id` int, `start station name` string, "
    "`start station latitude` double, `start station longitude` double, "
    "`end station id` int, `end station name` string, "
    "`end station latitude` double, `end station longitude` double, "
    "bikeid int, usertype string, `birth year` int, gender int"
)


def _trip(dur=600, start="2020-01-05 08:00:00.0000", stop="2020-01-05 08:10:00.0000",
          sid=1, eid=2, bike=77, birth=1980, gender=1):
    # coordinates are a function of the station id (as in real data —
    # a station has ONE location regardless of start/end role)
    return (
        dur, start, stop,
        sid, f"st{sid}", 40.7 + sid / 100, -74.0 + sid / 100,
        eid, f"st{eid}", 40.7 + eid / 100, -74.0 + eid / 100,
        bike, "Subscriber", birth, gender,
    )


@pytest.fixture()
def raw_trips(spark):
    rows = [
        _trip(),                                        # good trip
        _trip(),                                        # exact duplicate (dedup by subtract)
        _trip(dur=100, sid=3, eid=3),                   # same-station short -> removed
        _trip(dur=900, sid=4, eid=4),                   # same-station long -> kept
        _trip(bike=None, sid=5, eid=6),                 # null bikeid -> dropped from fact
        _trip(birth=None, sid=7, eid=8),                # null birth year -> kept, null col
    ]
    return spark.createDataFrame(rows, TRIP_COLS)


class TestTrips:
    def test_clean_trips_subtract_semantics(self, spark, raw_trips):
        cleaned = builders.clean_trips(raw_trips)
        # bad same-station short trip removed; duplicate good trips
        # collapsed (EXCEPT DISTINCT side effect, SURVEY §8.1)
        assert cleaned.filter((F.col("`start station id`") == 3)).count() == 0
        assert cleaned.filter((F.col("`start station id`") == 4)).count() == 1
        assert cleaned.filter((F.col("`start station id`") == 1)).count() == 1

    def test_trip_fact_schema_and_nulls(self, spark, raw_trips):
        fact = builders.build_trip_fact(builders.clean_trips(raw_trips))
        assert [f.name for f in fact.schema.fields] == [
            "trip_id", "duration", "start_time", "end_time", "start_station_id",
            "end_station_id", "bikeid", "usertype", "gender", "birth_year",
        ]
        rows = fact.collect()
        # null-bikeid row dropped (etl.py:64-65); null birth_year preserved
        assert all(r["bikeid"] is not None for r in rows)
        assert any(r["birth_year"] is None for r in rows)

    def test_trip_id_deterministic_across_partitioning(self, spark, raw_trips):
        cleaned = builders.clean_trips(raw_trips)
        a = rows_set(builders.build_trip_fact(cleaned).select("trip_id"))
        b = rows_set(builders.build_trip_fact(cleaned.repartition(5)).select("trip_id"))
        assert a == b  # the etl.py:91 monotonically_increasing_id fix

    def test_dim_station_not_empty(self, spark, raw_trips):
        # the reference wrote an EMPTY dim_station (etl.py:103-105 bug);
        # intended semantics: union of both roles, deduplicated
        dim = builders.build_dim_station(builders.clean_trips(raw_trips))
        ids = {r["station_id"] for r in dim.collect()}
        assert ids == {1, 2, 4, 5, 6, 7, 8}
        assert dim.count() == dim.dropDuplicates(["station_id"]).count()


class TestDatetimeDim:
    def test_8760_rows_and_parts(self, spark):
        dim = builders.build_dim_datetime(spark)
        assert dim.count() == 8760
        assert set(dim.columns) == {"Date", "hour", "day", "week", "month", "weekday", "year", "quarter"}
        jan1 = dim.filter(F.col("Date") == "2020-01-01 05:00:00").first()
        assert (jan1["hour"], jan1["day"], jan1["month"], jan1["year"], jan1["quarter"]) == (5, 1, 1, 2020, 1)


WEATHER_COLS = (
    "STATION string, NAME string, DATE string, PRCP string, SNOW string, SNWD string, "
    "TAVG string, TMAX string, TMIN string, WT01 string, WT03 string, WT08 string"
)


@pytest.fixture()
def raw_weather(spark):
    rows = [
        ("US1", "A", "2020-01-01", "0.12", "0", "0", "40", "45", "35", " 1 ", None, "1"),
        ("US2", "B", "2020-01-01", "0.12", "0", "0", "40", "45", "35", " 1 ", None, "1"),  # 2nd station, same values
        ("US1", "A", "2020-01-02", "", "1.5", "2.0", "30", "33", "27", None, "1", None),
    ]
    return spark.createDataFrame(rows, WEATHER_COLS)


class TestWeather:
    def test_weather_fact_casts_and_dedup(self, spark, raw_weather):
        fact = builders.build_weather_fact(raw_weather)
        rows = {str(r["date_time"]): r for r in fact.collect()}
        assert len(rows) == 2  # two identical station rows collapsed
        assert rows["2020-01-01 00:00:00"]["prcp"] == 0.12
        assert rows["2020-01-02 00:00:00"]["prcp"] is None  # empty string -> null

    def test_bridge_decode(self, spark, raw_weather):
        bridge = builders.build_date_weather_bridge(raw_weather)
        got = {(str(r["date_time"]), r["weather_type_id"]) for r in bridge.collect()}
        assert got == {
            ("2020-01-01 00:00:00", 1),
            ("2020-01-01 00:00:00", 8),
            ("2020-01-02 00:00:00", 3),
        }

    def test_weather_type_static(self, spark):
        wt = builders.build_weather_type(spark)
        # 21 NOAA WT codes: 1-19 plus 21, 22 (there is no WT20; the
        # reference's own lookup has exactly these, etl.py:142-163)
        assert wt.count() == 21
        assert wt.filter(F.col("weather_type_id") == 8).first()["description"].startswith("Smoke")
