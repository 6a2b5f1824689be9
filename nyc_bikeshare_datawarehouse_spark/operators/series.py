"""Timestamp series generator.

Reference semantics (etl.py:8-24 `generate_series` + its use at etl.py:184):
start inclusive, **stop exclusive**, fixed step in seconds — for 2020 with
stop='2020-12-31' this yields 8,760 hourly rows ending 2020-12-30 23:00
(SURVEY §8.2 quirk: 12-31 itself is excluded).

Spark-first design: the series is `spark.range(start_epoch, stop_epoch,
step)` — a distributed, splittable source (each task materializes its own id
range; nothing is collected on the driver), then one cast to timestamp.
At any scale this parallelizes perfectly; the reference built the same thing
through a driver-side pandas-like path.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _to_epoch(ts: str | datetime) -> int:
    if isinstance(ts, str):
        try:
            ts = datetime.strptime(ts, "%Y-%m-%d %H:%M:%S")
        except ValueError:
            ts = datetime.strptime(ts, "%Y-%m-%d")
    return int(ts.replace(tzinfo=timezone.utc).timestamp())


def timestamp_series(
    spark: SparkSession,
    start: str | datetime,
    stop: str | datetime,
    step_seconds: int = 3600,
    col_name: str = "ts",
) -> DataFrame:
    """Series of timestamps [start, stop) with fixed step, fully distributed.

    >>> timestamp_series(spark, "2020-01-01", "2020-12-31").count()
    8760
    """
    start_e, stop_e = _to_epoch(start), _to_epoch(stop)
    # epochs are computed in UTC above; pin the session zone so date parts
    # derived from the series are caller-session-independent
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.range(start_e, stop_e, step_seconds).select(
        F.timestamp_seconds(F.col("id")).alias(col_name)
    )
