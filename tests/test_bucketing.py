"""Bucketed-table co-located join: the 100 TB layout technique where
fact⋈fact joins on the bucket key need NO shuffle exchange at query time.

Writes lineitem/orders bucketed by order key into a temp warehouse, joins
them, and asserts the physical plan contains no Exchange on the join —
the evidence that bucketing removes the shuffle (SURVEY §4.2).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_bikeshare_datawarehouse_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # spark.sql.warehouse.dir is a static conf — tables land in the default
    # ./spark-warehouse; dropped (and the dir ignored by git) on teardown
    from nyc_bikeshare_datawarehouse_spark.sources.sinks import write_bucketed

    write_bucketed(
        load_table(spark, sf_dir, "lineitem"), "b_lineitem",
        ["l_orderkey"], 4, sort_cols=["l_orderkey"],
    )
    write_bucketed(
        load_table(spark, sf_dir, "orders"), "b_orders",
        ["o_orderkey"], 4, sort_cols=["o_orderkey"],
    )
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_q_bucketed_join_plan_is_colocated(spark, sf_dir):
    # the declared query's join must read both bucketed tables without an
    # exchange on the bucket key (the only shuffles feed the tiny
    # per-segment aggregate and the final sort)
    from nyc_bikeshare_datawarehouse_spark.plans.queries import QUERIES

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES["q_bucketed_join"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Bucketed: true" in plan
    assert "Exchange hashpartitioning(o_custkey" not in plan
    assert "Exchange hashpartitioning(c_custkey" not in plan


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    li, o = bucketed
    # disable auto-broadcast so the join is forced to the shuffled family —
    # the point is proving bucketing removed the exchanges an SMJ needs
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(li)
            .join(spark.table(o), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Bucketed: true" in plan
    # the join itself must be exchange-free: no hash repartitioning on
    # either join key (the only allowed exchange feeds the aggregation)
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan


def test_bucketed_join_correct(spark, sf_dir, bucketed):
    li, o = bucketed
    bucketed_count = (
        spark.table(li).join(spark.table(o), F.col("l_orderkey") == F.col("o_orderkey")).count()
    )
    plain_count = (
        load_table(spark, sf_dir, "lineitem")
        .join(load_table(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert bucketed_count == plain_count
