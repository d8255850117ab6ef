"""Bucketed co-located join: the join plan must contain NO shuffle."""

from __future__ import annotations

import pytest

from couchwarehouse_spark.catalog import load_table
from couchwarehouse_spark.operators.bucketing import colocated_join, write_bucketed

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "cw_orders_bucketed", "o_orderkey", n_buckets=8)
    write_bucketed(lineitem, "cw_lineitem_bucketed", "o_orderkey", n_buckets=8)
    yield "cw_orders_bucketed", "cw_lineitem_bucketed"
    spark.sql("DROP TABLE IF EXISTS cw_orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS cw_lineitem_bucketed")


def test_colocated_join_has_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    # Disable broadcast so the plan shows the big-table strategy this
    # demo exists for (at sf0.001 everything fits under the broadcast
    # threshold; at real scale neither side would).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, left, right, on="o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # the whole point: zero shuffle
        n = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    expected = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    assert n == expected


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_tables):
    """Aggregating on the bucket key reuses the bucket partitioning."""
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("o_orderkey").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
