"""Streaming/batch equivalence tests (SURVEY §7.2 M5).

The streaming pipelines must produce the SAME results as their batch
twins when drained over the same static data — that equivalence is the
whole design (one window expression, two runtimes).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_bikeshare_datawarehouse_spark.plans.queries import QUERIES
from nyc_bikeshare_datawarehouse_spark.streaming import events as se

from conftest import rows_set


def test_tumbling_counts_matches_batch(spark, sf_dir):
    stream = se.stream_events(spark, sf_dir)
    assert stream.isStreaming
    se.run_available_now(se.tumbling_counts(stream), "t_tumbling", "complete")
    got = rows_set(spark.table("t_tumbling"))
    want = rows_set(QUERIES["q_tumbling_hour"](spark, sf_dir))
    assert got == want


def test_session_window_matches_batch_sessionize(spark, sf_dir):
    stream = se.stream_events(spark, sf_dir)
    se.run_available_now(se.session_window_stats(stream, gap="30 minutes"), "t_sessions", "complete")
    got = spark.table("t_sessions")
    want = QUERIES["q_sessionize"](spark, sf_dir)
    # session_window end = last_event + gap; compare (user, start, n_events)
    got_set = rows_set(got.select("user_id", "session_start", "n_events"))
    want_set = rows_set(want.select("user_id", "session_start", "n_events"))
    assert got_set == want_set


def test_sliding_counts_total(spark, sf_dir):
    stream = se.stream_events(spark, sf_dir)
    se.run_available_now(se.sliding_counts(stream, "1 hour", "15 minutes"), "t_sliding", "complete")
    total = spark.table("t_sliding").agg(F.sum("n_events")).first()[0]
    from nyc_bikeshare_datawarehouse_spark.sources.readers import load_table

    n = load_table(spark, sf_dir, "events").count()
    assert total == n * 4  # every event lands in exactly window/slide = 4 buckets
