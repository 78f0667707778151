"""Reshaping + null-semantics operators: unpivot (melt), multiset set
ops, null-handling scalar surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.functions.numeric import dsum, sql_dsum
from go_map_reduce_spark.registry import query


@query(
    "unpivot_lineitem_measures",
    oracle=f"""
    WITH m AS (
      SELECT l_returnflag,
             {sql_dsum('l_quantity')} AS qty,
             {sql_dsum('l_extendedprice')} AS price,
             {sql_dsum('l_discount')} AS discount
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'qty' AS measure, qty AS value FROM m
    UNION ALL
    SELECT l_returnflag, 'price', price FROM m
    UNION ALL
    SELECT l_returnflag, 'discount', discount FROM m
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide per-flag totals to long (flag, measure,
    value) — the inverse of pivot_segment_status. Native unpivot is a
    zero-shuffle row expansion."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum(F.col("l_quantity")).alias("qty"),
        dsum(F.col("l_extendedprice")).alias("price"),
        dsum(F.col("l_discount")).alias("discount"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["qty", "price", "discount"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@query(
    "intersect_all_priorities",
    oracle="""
    SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    """,
)
def intersect_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset semantics — duplicates kept up to the
    minimum multiplicity on each side), completing the set-ops row next
    to the distinct-flavor set_ops_customer_status."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.where(F.col("o_orderstatus") == "O").select(
        F.col("o_orderpriority").alias("priority")
    )
    f = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("priority")
    )
    return o.intersectAll(f)


@query(
    "region_nation_matrix",
    oracle="""
    SELECT r.r_name, n.n_name,
           CASE WHEN n.n_regionkey = r.r_regionkey THEN 1 ELSE 0 END AS is_home
    FROM region r CROSS JOIN nation n
    """,
)
def region_nation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit CROSS JOIN (the one legitimate use: a deliberate small
    dimension matrix). Broadcasting the 5-row side turns it into a
    BroadcastNestedLoopJoin — never a CartesianProduct over big data."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return (
        nation.crossJoin(F.broadcast(region))
        .select(
            "r_name",
            "n_name",
            F.when(F.col("n_regionkey") == F.col("r_regionkey"), 1)
            .otherwise(0)
            .alias("is_home"),
        )
    )


@query(
    "null_handling_profile",
    oracle="""
    SELECT c_custkey,
           COUNT(*) AS n_rows,
           COUNT(o_orderkey) AS n_orders,
           coalesce(CAST(max(o_totalprice) AS VARCHAR), 'none') AS max_price_str,
           CASE WHEN max(o_orderkey) IS NULL THEN 'inactive' ELSE 'active' END
             AS activity,
           nullif(COUNT(o_orderkey), 0) AS orders_or_null
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def null_handling_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics surface over an outer join: COUNT(*) vs COUNT(col),
    coalesce, nullif, IS NULL branching — the exact places engines
    commonly disagree, pinned against the oracle."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.max("o_totalprice").cast("string"), F.lit("none")).alias(
                "max_price_str"
            ),
            F.when(F.max("o_orderkey").isNull(), "inactive")
            .otherwise("active")
            .alias("activity"),
            F.nullif(F.count("o_orderkey"), F.lit(0)).alias("orders_or_null"),
        )
    )
