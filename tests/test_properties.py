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


def py_quantize(vec: list[float]) -> list[int]:
    import math

    mx = max(abs(x) for x in vec)
    if mx == 0:
        return [0] * len(vec)
    return [math.floor(x / mx * 127.0 + 0.5) for x in vec]


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vec=st.lists(
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, width=32),
        min_size=1, max_size=16,
    )
)
def test_quantize_matches_reference(spark, vec):
    from nyc_bikeshare_datawarehouse_spark.functions.similarity import quantize_embeddings

    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<float>")
    r = quantize_embeddings(df).collect()[0]
    # float32 storage rounds the input; reference must see the same values
    stored = [float(x) for x in df.collect()[0]["embedding"]]
    assert r["q"] == py_quantize(stored)
    assert all(-127 <= c <= 127 for c in r["q"])


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=1, max_size=8).map(" ".join),
        min_size=1, max_size=8,
    )
)
def test_ngram_overlap_bounded_by_set_sizes(spark, texts):
    # shared_ngrams can never exceed either side's distinct-trigram count,
    # and overlap_frac is in (0, 1]
    from nyc_bikeshare_datawarehouse_spark.functions import contamination

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    ev = docs.limit(1)
    sizes = {
        r["doc_id"]: r["n"]
        for r in contamination.ngram_postings(docs, n=3)
        .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in contamination.ngram_overlap(docs, ev, n=3).collect():
        assert r["shared_ngrams"] <= min(sizes[r["train_id"]], sizes[r["eval_id"]])
        assert 0 < r["overlap_frac"] <= 1.0
