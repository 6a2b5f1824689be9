"""Property-based tests (hypothesis): sessionization and reshaping
invariants against pure-Python reference implementations.

Few examples per property (Spark round-trip per example is ~1 s); the
generators target the semantic edge cases: timestamp collisions, gap
boundaries, empty/singleton groups.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from nyc_bikeshare_datawarehouse_spark.operators.sessionize import sessionize
from nyc_bikeshare_datawarehouse_spark.operators.unpivot import unpivot

BASE = datetime.datetime(2024, 1, 1)

# offsets in seconds; duplicates allowed on purpose (ts collisions)
offsets = st.lists(st.integers(min_value=0, max_value=7200), min_size=1, max_size=12)


def py_sessionize(sorted_offsets: list[int], gap: int) -> list[int]:
    """Reference implementation: 1-based session ids over sorted events."""
    ids, cur = [], 0
    prev = None
    for off in sorted_offsets:
        if prev is None or off - prev > gap:
            cur += 1
        ids.append(cur)
        prev = off
    return ids


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(offsets=offsets, gap=st.sampled_from([60, 600, 1800]))
def test_sessionize_matches_reference(spark, offsets, gap):
    ordered = sorted(offsets)
    rows = [(1, BASE + datetime.timedelta(seconds=off), i) for i, off in enumerate(ordered)]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int")
    got = sessionize(df, "user_id", "ts", gap, order_tiebreak="event_id")
    by_event = {r["event_id"]: r["session_id"] for r in got.collect()}
    want = py_sessionize(ordered, gap)
    assert [by_event[i] for i in range(len(ordered))] == want


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 5), st.floats(allow_nan=False, allow_infinity=False, width=32)),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
def test_unpivot_preserves_cells(spark, vals):
    # unpivot emits exactly one (name, value) row per id x value-column cell
    df = spark.createDataFrame([(i, float(v), float(v) * 2) for i, v in vals], "id int, a double, b double")
    long = unpivot(df, ["id"], ["a", "b"], "name", "value")
    got = sorted(tuple(r) for r in long.collect())
    want = sorted(
        [(i, "a", float(v)) for i, v in vals] + [(i, "b", float(v) * 2) for i, v in vals]
    )
    assert got == want
