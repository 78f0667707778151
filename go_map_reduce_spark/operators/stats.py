"""Exact distributed statistics: OLS regression from integer sufficient
statistics, and positional median + deterministic mode.

Both queries extend the engine's float-determinism discipline
(functions/numeric.py, price_quantity_correlation precedent) to the
remaining classic aggregates Spark offers only as order-sensitive
doubles (regr_slope/regr_r2, percentile, mode): every data-dependent
reduction is an exact integer (or count) sum, and the float arithmetic
afterwards is a fixed per-group op sequence mirrored textually in the
oracle — so the distributed result is bit-identical to the sequential
one at ANY parallelism, the same property the reference gets trivially
from single-threaded reduce (main/mrsequential.go:18-46).

Scale: each query is one scan + one groupBy (sufficient statistics are
map-side combinable); the median's per-group sort rides a window over
the group's rows — bounded by group cardinality, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.registry import query


@query(
    "regression_price_on_quantity",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(round(l_quantity * 100) AS BIGINT) AS qi,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS pi
      FROM lineitem
    ),
    s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(qi) AS DOUBLE) AS sx,
             CAST(SUM(pi) AS DOUBLE) AS sy,
             CAST(SUM(CAST(qi AS DECIMAL(38,0)) * qi) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(pi AS DECIMAL(38,0)) * pi) AS DOUBLE) AS syy,
             CAST(SUM(CAST(qi AS DECIMAL(38,0)) * pi) AS DOUBLE) AS sxy
      FROM c GROUP BY l_returnflag
    ),
    m AS (
      SELECT l_returnflag, n,
             n * sxy AS nxy, sx * sy AS xy,
             n * sxx AS nxx, sx * sx AS xx,
             n * syy AS nyy, sy * sy AS yy,
             sx, sy
      FROM s
    ),
    k AS (
      SELECT l_returnflag, n, sx, sy,
             (nxy - xy) AS cov_n, (nxx - xx) AS varx_n, (nyy - yy) AS vary_n
      FROM m
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           cov_n / varx_n AS slope,
           (sy - cov_n / varx_n * sx) / n / 100.0 AS intercept,
           (cov_n / varx_n) * (cov_n / vary_n) AS r2
    FROM k
    """,
)
def regression_price_on_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag OLS of extendedprice on quantity — slope,
    intercept (dollars), R² — from EXACT integer sufficient statistics
    (n, Σx, Σy, Σxy, Σx², Σy² over cent-ints), single pass, map-side
    combinable, no second scan for residuals.

    R² is computed as slope·(cov/vary) — algebraically (cov²)/(varx·vary)
    but written as the same two-division sequence in both engines so the
    IEEE op order matches bit-for-bit. Intercept converts back to
    dollars at the end (cents cancel in the slope). The only per-group
    state is seven numbers — at 100 TB this aggregates in one shuffle of
    56-byte rows. All three co-moment sums ride DECIMAL(38,0): a cent²
    product is ~1e14 and Σ over 1e9+ rows passes int64's 9.2e18 — the
    silent-wraparound hazard price_quantity_correlation's per-term
    analysis bounds per scale factor is removed here unconditionally."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.select(
        "l_returnflag",
        F.round(F.col("l_quantity") * 100).cast("long").alias("qi"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("pi"),
    )
    s = c.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qi").cast("double").alias("sx"),
        F.sum("pi").cast("double").alias("sy"),
        F.sum(F.col("qi").cast("decimal(38,0)") * F.col("qi"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("pi").cast("decimal(38,0)") * F.col("pi"))
        .cast("double")
        .alias("syy"),
        F.sum(F.col("qi").cast("decimal(38,0)") * F.col("pi"))
        .cast("double")
        .alias("sxy"),
    )
    n = F.col("n")
    m = s.select(
        "l_returnflag",
        "n",
        (n * F.col("sxy")).alias("nxy"),
        (F.col("sx") * F.col("sy")).alias("xy"),
        (n * F.col("sxx")).alias("nxx"),
        (F.col("sx") * F.col("sx")).alias("xx"),
        (n * F.col("syy")).alias("nyy"),
        (F.col("sy") * F.col("sy")).alias("yy"),
        "sx",
        "sy",
    )
    k = m.select(
        "l_returnflag",
        "n",
        "sx",
        "sy",
        (F.col("nxy") - F.col("xy")).alias("cov_n"),
        (F.col("nxx") - F.col("xx")).alias("varx_n"),
        (F.col("nyy") - F.col("yy")).alias("vary_n"),
    )
    slope = F.col("cov_n") / F.col("varx_n")
    return k.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n") / 100.0).alias(
            "intercept"
        ),
        (slope * (F.col("cov_n") / F.col("vary_n"))).alias("r2"),
    )


@query(
    "quantity_median_mode",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, CAST(round(l_quantity * 100) AS BIGINT) AS qi
      FROM lineitem
    ),
    ranked AS (
      SELECT l_returnflag, qi,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY qi) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM c
    ),
    med AS (
      SELECT l_returnflag,
             CAST(MAX(n) AS BIGINT) AS n,
             (CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN qi ELSE 0 END) AS DOUBLE)
              + SUM(CASE WHEN rn = (n + 2) // 2 THEN qi ELSE 0 END)) / 2.0 / 100.0
               AS median_qty
      FROM ranked GROUP BY l_returnflag
    ),
    freq AS (
      SELECT l_returnflag, qi, COUNT(*) AS cnt
      FROM c GROUP BY l_returnflag, qi
    ),
    mode AS (
      SELECT l_returnflag,
             CAST(qi AS DOUBLE) / 100.0 AS mode_qty,
             CAST(cnt AS BIGINT) AS mode_count
      FROM (
        SELECT l_returnflag, qi, cnt,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY cnt DESC, qi) AS rk
        FROM freq
      ) WHERE rk = 1
    )
    SELECT med.l_returnflag, n, median_qty, mode_qty, mode_count
    FROM med JOIN mode ON med.l_returnflag = mode.l_returnflag
    """,
)
def quantity_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median and deterministic mode of l_quantity.

    Spark's `percentile` and `mode` are avoided on purpose: percentile
    interpolates with engine-specific float ops and mode breaks ties
    arbitrarily. Median here is POSITIONAL — rank within group, average
    the two middle cent-ints with one fixed float sequence — and mode
    ties break to the smallest value (rank by count desc, value asc):
    both reproducible on any engine, any parallelism.

    Scale shape: the rank window sorts within each group's hash
    partition (no global sort); the mode is a two-level aggregation
    (group×value counts, then top-1 per group via WindowGroupLimit —
    Spark pushes the rk=1 filter into a partial top-k below the
    shuffle)."""
    c = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_quantity") * 100).cast("long").alias("qi"),
    )
    ranked = c.select(
        "l_returnflag",
        "qi",
        F.row_number()
        .over(Window.partitionBy("l_returnflag").orderBy("qi"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("l_returnflag")).alias("n"),
    )
    lo = (F.col("n") + 1) / 2
    hi = (F.col("n") + 2) / 2
    med = ranked.groupBy("l_returnflag").agg(
        F.max("n").cast("long").alias("n"),
        (
            (
                F.sum(
                    F.when(
                        F.col("rn") == F.floor(lo).cast("long"), F.col("qi")
                    ).otherwise(F.lit(0))
                ).cast("double")
                + F.sum(
                    F.when(
                        F.col("rn") == F.floor(hi).cast("long"), F.col("qi")
                    ).otherwise(F.lit(0))
                )
            )
            / 2.0
            / 100.0
        ).alias("median_qty"),
    )
    freq = c.groupBy("l_returnflag", "qi").agg(F.count(F.lit(1)).alias("cnt"))
    rk = F.row_number().over(
        Window.partitionBy("l_returnflag").orderBy(F.desc("cnt"), F.asc("qi"))
    )
    mode = (
        freq.withColumn("rk", rk)
        .where(F.col("rk") == 1)
        .select(
            "l_returnflag",
            (F.col("qi").cast("double") / 100.0).alias("mode_qty"),
            F.col("cnt").cast("long").alias("mode_count"),
        )
    )
    return med.join(mode, "l_returnflag")
