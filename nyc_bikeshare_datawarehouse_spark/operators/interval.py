"""Interval×interval overlap join via time-bin blocking.

The general form of the range family (operators/asof.py covers point-in-
range and as-of): BOTH sides are intervals, and a pair matches when the
closed intervals intersect (`l_start <= r_end AND r_start <= l_end`).
Naively this is a cross join with an inequality predicate — quadratic and
unshufflable on any key. The scale form blocks each interval into the
fixed-width time bins it covers (`explode(sequence(floor(start/w),
floor(end/w)))`), equi-joins on the bin id, then verifies the exact
predicate and de-duplicates pairs that met in several bins.

Scale: the only shuffle is keyed by bin id; candidate volume per bin is
(left density)×(right density), so `bin_seconds` should track the median
interval length — too wide re-creates the cross join inside hot bins, too
narrow replicates long intervals across many bins. Replication factor is
`1 + interval_len/bin_width` per row (bounded, observable); AQE splits
residual hot bins. The verify + pair-distinct are keyed on the id pair.
Reference parity: the reference has no interval operator at all; this
covers the concurrent-trips shape its trip-table schema implies
(start_time/end_time columns, create_tables.sql:25-35, sql_queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bins(start_col: str, end_col: str, bin_seconds: int):
    """Bin ids covered by [start, end] — ascending by construction
    (end >= start is validated by the caller's verify predicate; a
    malformed reversed interval would DESCEND, Spark's sequence() is
    never empty — CLAUDE.md gotcha)."""
    bin_us = F.lit(bin_seconds * 1_000_000)
    return F.sequence(
        F.floor(F.unix_micros(F.col(start_col)) / bin_us),
        F.floor(F.unix_micros(F.col(end_col)) / bin_us),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    start_col: str = "session_start",
    end_col: str = "session_end",
    bin_seconds: int = 3600,
) -> DataFrame:
    """All (left, right) id pairs whose closed intervals overlap.

    Inputs must carry one row per id with `start_col`/`end_col`
    timestamps; reversed intervals (end < start) never match. Returns
    (left_id, right_id) — callers join attributes back by id, keeping
    the shuffled pair stream ids-only (the 100 TB rule: never shuffle
    payloads through a candidate join).
    """
    la = left.select(
        F.col(left_id),
        F.col(start_col).alias("__ls"),
        F.col(end_col).alias("__le"),
        F.explode(_bins(start_col, end_col, bin_seconds)).alias("__bin"),
    )
    rb = right.select(
        F.col(right_id),
        F.col(start_col).alias("__rs"),
        F.col(end_col).alias("__re"),
        F.explode(_bins(start_col, end_col, bin_seconds)).alias("__bin"),
    )
    return (
        la.join(rb, "__bin")
        .filter((F.col("__ls") <= F.col("__re")) & (F.col("__rs") <= F.col("__le")))
        .select(left_id, right_id)
        .distinct()
    )


def concurrent_interval_counts(
    intervals: DataFrame,
    entity_col: str,
    interval_id_cols: list[str],
    start_col: str = "session_start",
    end_col: str = "session_end",
    bin_seconds: int = 3600,
    count_col: str = "n_concurrent",
) -> DataFrame:
    """Per-interval concurrency degree: for each interval, how many
    intervals of OTHER entities overlap it in time (the concurrent-
    sessions / concurrent-trips analytic). Zero-overlap intervals are
    kept with a 0 count via the left join back to the interval frame.

    The pair stream carries only (entity, id) keys through the bin join;
    the degree is one groupBy over the surviving pairs, then a broadcast-
    or-shuffle join back keyed on the same ids.
    """
    key = [entity_col, *interval_id_cols]
    a = intervals.select(
        *[F.col(c).alias(f"__a_{c}") for c in key],
        F.col(start_col).alias("__ls"),
        F.col(end_col).alias("__le"),
        F.explode(_bins(start_col, end_col, bin_seconds)).alias("__bin"),
    )
    b = intervals.select(
        *[F.col(c).alias(f"__b_{c}") for c in key],
        F.col(start_col).alias("__rs"),
        F.col(end_col).alias("__re"),
        F.explode(_bins(start_col, end_col, bin_seconds)).alias("__bin"),
    )
    pairs = (
        a.join(b, "__bin")
        .filter(
            (F.col(f"__a_{entity_col}") != F.col(f"__b_{entity_col}"))
            & (F.col("__ls") <= F.col("__re"))
            & (F.col("__rs") <= F.col("__le"))
        )
        .select(*[F.col(f"__a_{c}").alias(c) for c in key],
                *[F.col(f"__b_{c}") for c in key])
        .distinct()
    )
    degree = pairs.groupBy(*key).agg(F.count(F.lit(1)).alias(count_col))
    return (
        intervals.join(degree, on=key, how="left")
        .withColumn(count_col, F.coalesce(F.col(count_col), F.lit(0)).cast("long"))
    )
