"""Relational operators: the query surface the reference lacks (SURVEY.md §2c).

The reference has no joins, windows, set ops, or scalar-function surface
(all marked ABSENT in SURVEY.md §2c); this module provides them as
native DataFrame plans over the TPC-H-ish driver tables, one registered
query per operator family, each with a DuckDB oracle twin.

Scale/shuffle design notes (these run on 100 TB, not just sf0.1):
- Dimension tables (region 5, nation 25, supplier ~10/SF) are broadcast
  explicitly; customer/orders join lineitem via hash shuffle on the join
  key — the only unavoidable shuffles.
- Filters are declared before joins so Catalyst pushes them into the
  parquet scan (check: PushedFilters in .explain("formatted")).
- Aggregates use functions.numeric.dsum/davg: exact decimal partial
  aggregation — order-independent (reproducible at any parallelism) and
  still map-side combinable.
- Window queries partition by high-cardinality keys (custkey, user_id)
  — no single-partition global windows anywhere.
- Top-k uses order+limit (Spark's TakeOrdered — per-partition top-k then
  driver merge of k·P rows, no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from go_map_reduce_spark.registry import query

REVENUE = "l_extendedprice * (1 - l_discount)"


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# Aggregation: TPC-H Q1 pricing summary (grouped agg with 8 aggregates)
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum(REVENUE)} AS sum_disc_price,
           {sql_dsum(f'({REVENUE}) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate, 6 groups, partial agg does
    nearly all the work map-side. The shipdate filter reaches the parquet
    scan as a pushed predicate."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.expr("TIMESTAMP_NTZ '1998-09-02 00:00:00'")
    )
    charge = _rev() * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity")).alias("sum_qty"),
        dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        dsum(_rev()).alias("sum_disc_price"),
        dsum(charge).alias("sum_charge"),
        davg(F.col("l_quantity")).alias("avg_qty"),
        davg(F.col("l_extendedprice")).alias("avg_price"),
        davg(F.col("l_discount")).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# --------------------------------------------------------------------------
# Join + agg + deterministic top-k: TPC-H Q3 shipping priority
# --------------------------------------------------------------------------
@query(
    "q3_top_orders",
    oracle=f"""
    SELECT o_orderkey,
           {sql_dsum(REVENUE)} AS revenue,
           o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join fact → agg → top-k.

    customer(BUILDING) is far under the broadcast threshold at any SF
    where customers fit a dim role; the lineitem⋈orders join shuffles on
    orderkey. Top-k is order+limit with a total tiebreak (o_orderkey) so
    the result set is deterministic — the reference's determinism rule
    (SURVEY.md §5) applied to limits.
    """
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_rev()).alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Multi-way join: TPC-H Q5 local supplier volume
# --------------------------------------------------------------------------
@query(
    "q5_region_revenue",
    oracle=f"""
    SELECT n_name, {sql_dsum(REVENUE)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join. region/nation/supplier broadcast
    (5/25/tiny rows); lineitem⋈orders⋈customer shuffle on their keys.
    The c_nationkey = s_nationkey "local supplier" condition rides on the
    supplier join."""
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(_rev()).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Window functions: top orders per customer
# --------------------------------------------------------------------------
@query(
    "top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number window — partitioned by customer
    (high cardinality, scales out), total order (price desc, key asc)
    for determinism."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# Window functions: running revenue per customer over time
# --------------------------------------------------------------------------
@query(
    "running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend,
           CAST(coalesce(lag(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ), -1) AS BIGINT) AS prev_orderkey
    FROM orders
    """,
)
def running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-sum + lag window. The running sum accumulates in decimal so
    every prefix is exact (a running double sum would drift and depend on
    nothing, but decimal keeps it bit-reproducible vs the oracle)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_spend"),
        # lag's leading NULL is coalesced to a sentinel: a NULL inside an
        # integer column surfaces as None vs NaN across client stacks,
        # which would flake representation-level comparison.
        F.coalesce(F.lag("o_orderkey").over(w), F.lit(-1))
        .cast("long")
        .alias("prev_orderkey"),
    )


# --------------------------------------------------------------------------
# Semi/anti joins
# --------------------------------------------------------------------------
@query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left_anti join (shuffle-hash/broadcast chosen by
    Catalyst; orders side is reduced to its join key only)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "big_spender_customers",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_totalprice > 400000
    )
    """,
)
def big_spender_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left_semi join; the totalprice filter pushes into the
    orders scan before the shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 400000)
        .select("o_custkey")
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------
@query(
    "set_ops_customer_status",
    oracle="""
    (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
     INTERSECT
     SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
    EXCEPT
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_ops_customer_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT (both ABSENT in the reference, SURVEY.md §2c):
    customers with both open and finished orders but no pending ones."""
    orders = load_table(spark, sf_dir, "orders")

    def by_status(s: str) -> DataFrame:
        return (
            orders.where(F.col("o_orderstatus") == s)
            .select(F.col("o_custkey").alias("custkey"))
            .distinct()
        )

    return by_status("O").intersect(by_status("F")).exceptAll(by_status("P"))


# --------------------------------------------------------------------------
# Rollup (multi-level aggregation)
# --------------------------------------------------------------------------
@query(
    "rollup_lineitem_status",
    oracle=f"""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def rollup_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals in one pass (Spark expands grouping sets;
    partial aggregation still applies)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


# --------------------------------------------------------------------------
# Scalar functions (string/date/math) — per-row, all JVM-side
# --------------------------------------------------------------------------
@query(
    "order_scalar_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           substr(o_orderpriority, 1, 1) AS prio_code,
           lower(o_orderstatus) AS status_lc,
           concat(o_orderstatus, '/', o_orderpriority) AS status_prio,
           CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
           o_totalprice * 1.1 AS gross_price,
           sqrt(o_totalprice) AS price_sqrt,
           CAST(o_orderkey % 7 AS BIGINT) AS key_mod,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_band
    FROM orders
    """,
)
def order_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function surface (string/date/math/conditional), all native
    expressions inside whole-stage codegen. sqrt is IEEE-correctly-rounded
    (bit-identical across engines); transcendentals (ln/exp) are NOT and
    are deliberately excluded from oracle-checked outputs."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.lower("o_orderstatus").alias("status_lc"),
        F.concat_ws("/", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.length("o_orderpriority").cast("long").alias("prio_len"),
        (F.col("o_totalprice") * 1.1).alias("gross_price"),
        F.sqrt("o_totalprice").alias("price_sqrt"),
        (F.col("o_orderkey") % 7).cast("long").alias("key_mod"),
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
    )


# --------------------------------------------------------------------------
# Global top-k
# --------------------------------------------------------------------------
@query(
    "global_top_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def global_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark compiles order+limit to TakeOrderedAndProject —
    per-partition heaps then a k·P driver merge, never a full sort."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Two-nation trade volume (TPC-H Q7 shape: same dim joined twice)
# --------------------------------------------------------------------------
@query(
    "q7_nation_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {sql_dsum('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             {REVENUE} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name IN ('NATION_1', 'NATION_2')
        AND n2.n_name IN ('NATION_1', 'NATION_2')
        AND n1.n_name <> n2.n_name
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dimension (nation) joined twice under
    different roles (supplier's vs customer's), yearly trade volume
    between a nation pair. The nation name filters are applied BEFORE the
    joins, so each broadcast carries 2 rows and the fact stream is pruned
    at the join instead of post-hoc; the asymmetric-pair condition
    (supp != cust) is a cheap residual filter after both broadcasts."""
    pair = ("NATION_1", "NATION_2")
    n1 = (
        load_table(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        load_table(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dsum(_rev()).alias("revenue"))
    )
