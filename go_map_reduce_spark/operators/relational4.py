"""TPC-H query-shape batch 2: Q4/Q6/Q10/Q12/Q14/Q16/Q19/Q21 analogs.

The reference has no relational surface at all (SURVEY.md §2c marks
joins/aggregations/subqueries ABSENT); rounds 1-2 covered the Q1/Q3/Q5/
Q7 scan-join-agg shapes and the Q2/Q13/Q18/Q22 subquery shapes. This
module adds the remaining canonical TPC-H operator shapes, adapted to
the driver schema (no l_commitdate/l_receiptdate/l_shipmode/partsupp —
each adaptation keeps the SHAPE, which is what exercises the engine):

- Q4  → EXISTS correlated subquery ⇒ left-semi join (late-shipping
        orders per priority).
- Q6  → pure scan-filter-aggregate: every predicate pushed to parquet,
        zero shuffle beyond the final 1-row combine.
- Q10 → fact⋈fact⋈dim join with selective flag filter, grouped revenue,
        deterministic top-k.
- Q12 → join + conditional (CASE) aggregation — high/low-priority line
        counts per linestatus.
- Q14 → two conditional aggregates combined into one ratio (promo
        revenue share).
- Q16 → distinct-aggregation with a NOT IN (null-free ⇒ left-anti)
        exclusion subquery.
- Q19 → disjunctive multi-column predicate (OR-of-ANDs across the join)
        — the classic "can the optimizer keep the join small" shape.
- Q21 → same-table EXISTS + NOT EXISTS (semi + anti on two aliases of
        lineitem) — suppliers who were the sole late shipper of a
        multi-supplier order.

Scale notes: part/supplier are broadcast at any realistic dim:fact
ratio; lineitem⋈orders shuffles on orderkey only where the semantics
require row pairing. The Q21 semi/anti joins are key-equality joins on
l_orderkey (shuffle, then per-key probe) — never nested loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.functions.numeric import dsum, sql_dsum
from go_map_reduce_spark.registry import query

REVENUE = "l_extendedprice * (1 - l_discount)"


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# Q4: EXISTS correlated subquery → left-semi join
# --------------------------------------------------------------------------
@query(
    "q4_priority_late_orders",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
    GROUP BY o_orderpriority
    """,
)
def q4_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (l_commitdate<l_receiptdate adapted to "shipped
    >60 days after order date"): EXISTS decorrelates to a left-semi
    join on orderkey. The quarter filter is pushed into the orders
    scan; the semi join output carries only orders columns, so no
    lineitem payload ever shuffles — just (orderkey, shipdate)."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1996-04-01 00:00:00'"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.expr("timestampadd(DAY, 60, o_orderdate)")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# --------------------------------------------------------------------------
# Q6: pure pushdown scan-filter-aggregate
# --------------------------------------------------------------------------
@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the canonical pushdown probe. All four predicates are
    simple comparisons on scan columns — .explain shows every one under
    PushedFilters, ReadSchema is 4 columns, and the only exchange is the
    1-row partial-agg combine. At 100 TB this is the query whose cost is
    pure IO; anything beyond a single scan stage is a plan bug."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --------------------------------------------------------------------------
# Q10: returned-item revenue per customer, deterministic top-k
# --------------------------------------------------------------------------
@query(
    "q10_returned_revenue",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {sql_dsum(REVENUE)} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_return_lines
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: which customers returned the most revenue. lineitem
    filtered to 'R' lines before the join (pushed to scan); orders
    filtered to one half-year; nation broadcast. The orderkey join is
    the single big shuffle; the custkey agg is the second, on an
    already-reduced frame. Top-k = TakeOrdered with custkey tiebreak."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1996-07-01 00:00:00'"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(_rev()).alias("revenue"),
            F.count(F.lit(1)).alias("n_return_lines"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q12: join + conditional (CASE) aggregation
# --------------------------------------------------------------------------
@query(
    "q12_priority_linestatus",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
)
def q12_priority_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode → linestatus on this schema): the
    conditional-aggregation pattern — one pass, two CASE sums, no
    second join or union. Only 3 columns of each side survive column
    pruning into the orderkey shuffle."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
        )
        .select("l_orderkey", "l_linestatus")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q14: conditional-aggregate ratio (promo revenue share)
# --------------------------------------------------------------------------
@query(
    "q14_promo_share",
    oracle=f"""
    SELECT 100.0 * {sql_dsum(f"CASE WHEN p_type = 'PROMO' THEN {REVENUE} ELSE 0.0 END")}
                 / {sql_dsum(REVENUE)} AS promo_share,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo share of one month's revenue. part is the
    broadcast side (dim:fact ratio holds at every SF); both the promo
    and total sums are exact decimal aggregates, so the final double
    division is the only FP op and is order-independent."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1997-03-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1997-04-01 00:00:00'"))
    )
    promo_rev = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (100.0 * dsum(promo_rev) / dsum(_rev())).alias("promo_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q16: distinct aggregation + NOT IN exclusion subquery
# --------------------------------------------------------------------------
@query(
    "q16_supplier_part_variety",
    oracle="""
    SELECT p_brand, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 9, 17, 25, 33, 41, 49)
      AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
    GROUP BY p_brand, p_size
    """,
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp → the lineitem part-supplier
    association): how many distinct suppliers serve each qualifying
    (brand, size). The NOT IN subquery is null-free (s_suppkey is a
    key), so it is exactly a left-anti join against a broadcast
    sub-dim. COUNT(DISTINCT) expands to a two-level aggregate
    (partial distinct map-side, exact merge) — no collect_set blowup."""
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 9, 17, 25, 33, 41, 49)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q19: disjunctive multi-column join predicate (OR-of-ANDs)
# --------------------------------------------------------------------------
@query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {sql_dsum(REVENUE)} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1  AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#5'  AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: the OR-of-ANDs predicate. The single-table conjuncts
    common to all branches are factored so Catalyst can still push a
    superset filter to each scan (part: brand IN (...) AND size<=15;
    lineitem: quantity in [1,30]), then the residual disjunction is
    evaluated post-join. Without the factoring the join reads both
    tables in full — the difference between IO-bound and broken at
    100 TB."""
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#5")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 15)
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & (F.col("p_size") <= 5)
            & (F.col("l_quantity") <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("p_size") <= 10)
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & (F.col("l_quantity") >= 20)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .where(branch)
        .agg(
            dsum(_rev()).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q21: same-table EXISTS + NOT EXISTS (sole late shipper)
# --------------------------------------------------------------------------
@query(
    "q21_sole_late_suppliers",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
      AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
          )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_sole_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (receipt-vs-commit lateness adapted to "shipped
    >90 days after an 'F' order's date"): suppliers who were the ONLY
    late shipper on a multi-supplier order. EXISTS/NOT EXISTS become a
    per-order aggregate join — instead of two correlated probes of
    lineitem (the literal decorrelation: two extra shuffles of the fact
    table), compute per (orderkey, suppkey): any-other-supplier and
    any-other-late-supplier from ONE grouped pass over the already-
    joined frame, using count comparisons:

      n_supp > 1            ⇔ EXISTS  (another supplier)
      n_late_supp = 1 & late ⇔ NOT EXISTS (another late supplier)

    This is the aggregate-rewrite of Q21 (the same trick query
    optimizers apply); it turns 3 lineitem shuffles into 2."""
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lines = li.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).withColumn(
        "is_late",
        (F.col("l_shipdate") > F.expr("timestampadd(DAY, 90, o_orderdate)")).cast(
            "int"
        ),
    )
    # Per (order, supplier): did this supplier ship late at all, and on
    # how many lines (the EXISTS predicate qualifies l1 *lines*, so a
    # supplier with two late lines in one order counts twice).
    per_supp = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("supp_late"),
        F.sum("is_late").alias("n_late_lines"),
    )
    # Per order: distinct suppliers and distinct LATE suppliers.
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("supp_late").alias("n_late_supp"),
    )
    sole_late = (
        per_supp.where(F.col("supp_late") == 1)
        .join(per_order, "l_orderkey")
        .where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        sole_late.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )
