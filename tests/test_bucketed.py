"""Bucketed-table co-located join: correctness + the no-Exchange plan
property that makes bucketing worth it."""

import pytest

from pyspark.sql import functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.sources.bucketed import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=4)
    write_bucketed(li, "b_lineitem", "l_orderkey", n_buckets=4)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    df = bucketed_join(spark, rt, lt, "l_orderkey", "o_orderkey")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join must not shuffle either side"


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    bucketed = bucketed_join(spark, rt, lt, "l_orderkey", "o_orderkey")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
    assert bucketed.count() == plain.count()
    b_rev = bucketed.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double")
    ).collect()[0][0]
    p_rev = plain.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double")
    ).collect()[0][0]
    assert b_rev == p_rev
