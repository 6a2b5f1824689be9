"""Merge/upsert and snapshot-diff tests."""

from __future__ import annotations

from nyc_bikeshare_datawarehouse_spark.operators.merge import changed_rows, merge_upsert
from nyc_bikeshare_datawarehouse_spark.warehouse.quality import profile

from conftest import rows_set


def _frames(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id int, name string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "B", None), (4, "d", 40.0)], "id int, name string, v double"
    )
    return target, updates


def test_merge_upsert_updates_win_whole_row(spark):
    target, updates = _frames(spark)
    got = rows_set(merge_upsert(target, updates, "id"))
    # id=2 fully replaced (v becomes NULL — whole-row precedence,
    # not per-column coalesce); id=4 inserted; 1,3 untouched
    assert got == [(1, "a", 10.0), (2, "B", None), (3, "c", 30.0), (4, "d", 40.0)]


def test_changed_rows_diff(spark):
    old = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, v string")
    new = spark.createDataFrame([(1, "a"), (2, "B"), (4, "d")], "id int, v string")
    got = {(r["id"], r["change_type"]) for r in changed_rows(old, new, "id").collect()}
    assert got == {(2, "updated"), (3, "removed"), (4, "added")}


def test_changed_rows_null_safe(spark):
    old = spark.createDataFrame([(1, None)], "id int, v string")
    new = spark.createDataFrame([(1, None)], "id int, v string")
    assert changed_rows(old, new, "id").count() == 0  # NULL == NULL here


def test_scd2_history(spark):
    from pyspark.sql import functions as F
    from nyc_bikeshare_datawarehouse_spark.operators.merge import scd2_history

    snaps = spark.createDataFrame(
        [
            (1, "2024-01-01", "gold"),
            (1, "2024-01-02", "gold"),     # unchanged -> collapses
            (1, "2024-01-03", "platinum"), # version 2
            (2, "2024-01-01", "basic"),
        ],
        "id int, ts string, tier string",
    ).withColumn("ts", F.to_timestamp("ts"))
    hist = scd2_history(snaps, "id", "ts")
    rows = {(r["id"], r["tier"]): (str(r["valid_from"]), r["valid_to"] and str(r["valid_to"]))
            for r in hist.collect()}
    assert rows == {
        (1, "gold"): ("2024-01-01 00:00:00", "2024-01-03 00:00:00"),
        (1, "platinum"): ("2024-01-03 00:00:00", None),
        (2, "basic"): ("2024-01-01 00:00:00", None),
    }


def test_profile(spark):
    df = spark.createDataFrame([(1, "x"), (2, None), (2, "y")], "id int, v string")
    got = {r["column"]: (r["n_nulls"], r["null_ratio"]) for r in profile(df, approx_distinct=False).collect()}
    assert got["v"] == (1, 0.3333)
    assert got["id"] == (0, 0.0)
    exact = {r["column"]: r["n_distinct"] for r in profile(df, approx_distinct=False).collect()}
    assert exact["id"] == 2


def test_changed_rows_detail_carries_values(spark):
    from nyc_bikeshare_datawarehouse_spark.operators.merge import (
        changed_rows_detail,
    )

    old = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k long, v long")
    new = spark.createDataFrame([(2, 25), (3, 30), (4, 40)], "k long, v long")
    got = {r["k"]: r for r in changed_rows_detail(old, new, "k").collect()}
    assert set(got) == {1, 2, 4}  # 3 unchanged -> dropped
    assert got[1]["change_type"] == "removed" and got[1]["old_v"] == 10 \
        and got[1]["new_v"] is None
    assert got[2]["change_type"] == "updated" and (got[2]["old_v"], got[2]["new_v"]) == (20, 25)
    assert got[4]["change_type"] == "added" and got[4]["new_v"] == 40
