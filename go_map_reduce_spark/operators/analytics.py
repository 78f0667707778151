"""Analytics extensions: pivot, cube, exact quantiles, approximate sketches.

Rounding out the SURVEY.md §2c aggregation row: multi-dimensional
aggregation (CUBE), reshaping (PIVOT), holistic aggregates (exact
percentiles — matched bit-for-bit against DuckDB's quantile_cont), and
the approximate/sketch tier (HLL++ distinct counts, GK quantile
sketches). Sketch results are implementation-defined by design, so those
two queries carry no SQL oracle (driver records the weaker rows-only
check); their accuracy contract is pinned by tests instead
(tests/test_analytics.py asserts ≤2% error vs exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.functions.numeric import dsum, sql_dsum
from go_map_reduce_spark.registry import query


@query(
    "pivot_segment_status",
    oracle=f"""
    SELECT c_mktsegment,
           {sql_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS open_total,
           {sql_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS finished_total,
           {sql_dsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS pending_total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def pivot_segment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order totals per market segment, one column per status.
    Values list is explicit (O/F/P) so the plan needs no distinct-values
    pre-pass — at scale an implicit pivot is two jobs, an explicit one is
    one. Compiled to conditional aggregates, same as the oracle's
    CASE-sums."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    piv = (
        joined.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(dsum(F.col("o_totalprice")))
    )
    return piv.select(
        "c_mktsegment",
        F.col("O").alias("open_total"),
        F.col("F").alias("finished_total"),
        F.col("P").alias("pending_total"),
    )


@query(
    "cube_year_status",
    oracle=f"""
    SELECT coalesce(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS yr,
           coalesce(o_orderstatus, 'ALL') AS status,
           COUNT(*) AS n,
           {sql_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY CUBE(year(o_orderdate), o_orderstatus)
    """,
)
def cube_year_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (year, status): all four grouping combinations in one
    pass (Catalyst expands grouping sets; partial aggregation applies to
    each). NULL group markers surfaced as 'ALL'."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube(F.year("o_orderdate").alias("_yr"), F.col("o_orderstatus"))
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice")).alias("total"))
        .select(
            F.coalesce(F.col("_yr").cast("string"), F.lit("ALL")).alias("yr"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n",
            "total",
        )
    )


@query(
    "quantity_quantiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_extendedprice, 0.25) AS price_p25,
           quantile_cont(l_extendedprice, 0.75) AS price_p75
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def quantity_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (holistic aggregate): Spark `percentile` and
    DuckDB `quantile_cont` share the linear-interpolation definition and
    match bit-for-bit. Exact percentile sorts each group — use the
    sketch variant (approx_quantiles_sketch) when groups are huge."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_extendedprice, 0.25)").alias("price_p25"),
        F.expr("percentile(l_extendedprice, 0.75)").alias("price_p75"),
    )


@query("approx_distinct_sketch")  # sketch output: rows-only check by design
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts per returnflag (plus exact twin
    columns for the accuracy tests). Sketches are THE 100 TB answer for
    distinct-heavy dashboards: mergeable fixed-size state instead of a
    distinct shuffle. No SQL oracle — HLL estimates are implementation-
    defined; accuracy pinned to ≤2% vs exact in tests."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.count_distinct("l_partkey").alias("exact_parts"),
    )


@query("approx_quantiles_sketch")  # sketch output: rows-only check by design
def approx_quantiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate percentiles (mergeable sketch, no
    per-group sort). Accuracy pinned vs exact percentile in tests."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median_price"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_median_price"),
    )


@query(
    "daily_orders_gapfilled",
    oracle=f"""
    WITH bounds AS (
      SELECT CAST(min(o_orderdate) AS DATE) AS lo, CAST(max(o_orderdate) AS DATE) AS hi
      FROM orders
    ),
    days AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ),
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n,
             {sql_dsum('o_totalprice')} AS total
      FROM orders GROUP BY 1
    )
    SELECT d.day, coalesce(daily.n, 0) AS n, coalesce(daily.total, 0.0) AS total
    FROM days d LEFT JOIN daily ON daily.day = d.day
    """,
)
def daily_orders_gapfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-filling: a generated day spine left-joined to daily
    aggregates so order-less days surface as zeros — the time-series
    densification every dashboard needs. The spine is sequence() over
    the min/max bounds (one-row broadcast), cost O(days), not O(rows)."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    days = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice")).alias("total")
    )
    return days.join(daily, "day", "left").select(
        "day",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce("total", F.lit(0.0)).alias("total"),
    )


@query(
    "rolling_7day_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS revenue_7d
    FROM orders
    """,
)
def rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based rolling window: per-customer trailing-7-day spend via
    a RANGE frame with an interval bound (value-based, so sparse order
    dates work — a ROWS frame would be wrong). Same-timestamp orders are
    frame peers, summed together in exact decimal, so ties stay
    deterministic."""
    from go_map_reduce_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL '7' DAY PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS revenue_7d
        FROM orders
        """
    )
