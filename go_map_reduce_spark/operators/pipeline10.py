"""Round-5 pipeline operators, fifth batch: equi-depth histograms via
broadcast bin edges, week-over-week growth, per-dimension embedding
statistics, and multi-touch (linear) attribution.

`spend_equidepth_histogram` is the scale path that
`customer_spend_deciles` (pipeline6) promises in its docstring: when
the reduced frame outgrows a single window partition, the same cut
comes from percentile BIN EDGES broadcast to a stateless bucketing
map — rank-free, shuffle-free after the rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.functions.numeric import dsum, sql_dsum
from go_map_reduce_spark.registry import query

# --------------------------------------------------------------------------
# Equi-depth histogram: exact percentile edges → broadcast bucketing
# --------------------------------------------------------------------------

EQD_BUCKETS = 10
_EDGE_QS = [i / EQD_BUCKETS for i in range(1, EQD_BUCKETS)]


@query(
    "spend_equidepth_histogram",
    oracle=f"""
    WITH spend AS (
      SELECT o_custkey, {sql_dsum('o_totalprice')} AS spend
      FROM orders GROUP BY o_custkey
    ),
    edges AS (
      SELECT quantile_cont(spend, {_EDGE_QS}) AS e FROM spend
    ),
    bucketed AS (
      SELECT spend,
             1 + len(list_filter(e, x -> x < spend)) AS bucket
      FROM spend CROSS JOIN edges
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           min(spend) AS min_spend, max(spend) AS max_spend
    FROM bucketed GROUP BY bucket
    """,
)
def spend_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-population) histogram of customer spend: exact
    decile EDGES from one holistic percentile aggregate, then a
    stateless bucketing map with the 9-edge array broadcast — the
    rank-free formulation of `customer_spend_deciles` (pipeline6) that
    survives a customer dimension too large for one window partition:
    no global sort, no single-partition window, just (1) the rollup
    shuffle, (2) a 1-row aggregate, (3) a broadcast map pass.

    Boundary convention pinned on both engines: bucket = 1 + count of
    edges STRICTLY below the value, so a row equal to an edge falls in
    the left bucket and buckets partition exactly.
    Spark `percentile` and DuckDB `quantile_cont` share the linear-
    interpolation definition (bit-agreement already pinned by
    quantity_quantiles, analytics.py); the filter-count is integer."""
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(dsum(F.col("o_totalprice")).alias("spend"))
    )
    edges = spend.agg(
        F.percentile("spend", F.lit(_EDGE_QS)).alias("e")
    )
    bucketed = spend.crossJoin(F.broadcast(edges)).select(
        "spend",
        (
            1 + F.size(F.filter("e", lambda x: x < F.col("spend")))
        ).cast("int").alias("bucket"),
    )
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("spend").alias("min_spend"),
        F.max("spend").alias("max_spend"),
    )


# --------------------------------------------------------------------------
# Week-over-week revenue growth
# --------------------------------------------------------------------------


@query(
    "weekly_revenue_growth",
    oracle=f"""
    WITH weekly AS (
      SELECT strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week,
             {sql_dsum('o_totalprice')} AS revenue
      FROM orders GROUP BY 1
    )
    SELECT week, revenue,
           round((revenue - lag(revenue) OVER (ORDER BY week))
                 / lag(revenue) OVER (ORDER BY week), 6) AS wow_growth
    FROM weekly
    """,
)
def weekly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth: weekly revenue rollup + lag ratio — the
    BI trend primitive. Both engines truncate weeks to Monday
    (`date_trunc('week', ...)`), weeks serialize as strings (DATE
    round-trip skew, see dow_seasonality_revenue), revenue is a
    decimal sum so the growth ratio divides two bit-identical doubles.

    The single-partition lag window runs over the WEEKS frame (one row
    per week — thousands of rows for decades), not over orders; the
    only data-sized work is the rollup shuffle."""
    weekly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.date_format(F.date_trunc("week", F.col("o_orderdate")), "yyyy-MM-dd")
            .alias("week")
        )
        .agg(dsum(F.col("o_totalprice")).alias("revenue"))
    )
    prev = F.lag("revenue").over(W.orderBy("week"))
    return weekly.select(
        "week",
        "revenue",
        F.round((F.col("revenue") - prev) / prev, 6).alias("wow_growth"),
    )


# --------------------------------------------------------------------------
# Per-dimension embedding statistics (feature-scaling fit)
# --------------------------------------------------------------------------


@query(
    "embedding_dim_stats",
    oracle="""
    WITH flat AS (
      SELECT dim, CAST(embedding[dim] AS DOUBLE) AS v
      FROM embeddings, unnest(range(1, 65)) AS t(dim)
    )
    SELECT CAST(dim AS INT) AS dim,
           round(CAST(SUM(CAST(v AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 9)
             AS mean,
           round(sqrt(greatest(
             (CAST(SUM(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE)
              - COUNT(*) * pow(CAST(SUM(CAST(v AS DECIMAL(38,12))) AS DOUBLE)
                               / COUNT(*), 2))
             / (COUNT(*) - 1), 0.0)), 9) AS std
    FROM flat GROUP BY dim
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/std over the embedding corpus — the FIT step
    of feature standardization (the scaler a training pipeline
    broadcasts back over the corpus to normalize, exactly the
    two-pass shape of embedding_quantization's min/max). posexplode
    lays the corpus out as (dim, value) rows; both moments are exact
    decimal sums at scale 12 (|v| ≲ 1, so v and v² sit deep inside
    the DECIMAL(38,12) safe range), and the final mean/variance are a
    fixed handful of IEEE ops — engine-identical at any parallelism.

    The 64× explode is the deliberate dimension-row layout (as
    kmeans_ivf_assignments): the shuffle carries (dim, partial decimal
    sums) after map-side combine — 64 rows per partition, independent
    of corpus size."""
    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    flat = emb.select(
        F.posexplode("embedding").alias("pos", "v0")
    ).select((F.col("pos") + 1).cast("int").alias("dim"), F.col("v0").cast("double").alias("v"))
    n = F.count(F.lit(1))
    s1 = F.sum(F.col("v").cast("decimal(38,12)")).cast("double")
    s2 = F.sum((F.col("v") * F.col("v")).cast("decimal(38,12)")).cast("double")
    mean = s1 / n
    var = F.greatest(
        (s2 - n * F.pow(mean, F.lit(2))) / (n - 1), F.lit(0.0)
    )
    return flat.groupBy("dim").agg(
        F.round(mean, 9).alias("mean"),
        F.round(F.sqrt(var), 9).alias("std"),
    )


# --------------------------------------------------------------------------
# Multi-touch (linear) attribution via a RANGE window frame
# --------------------------------------------------------------------------

MT_WINDOW_US = 24 * 3600 * 1_000_000


@query(
    "multi_touch_attribution",
    oracle=f"""
    WITH ev AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events
    )
    SELECT p.event_id, p.user_id,
           CAST((SELECT COUNT(*) FROM ev c
                 WHERE c.user_id = p.user_id AND c.event_type = 'click'
                   AND c.us < p.us AND c.us >= p.us - {MT_WINDOW_US}) AS BIGINT)
             AS n_touches,
           round(1.0 / nullif((SELECT COUNT(*) FROM ev c
                 WHERE c.user_id = p.user_id AND c.event_type = 'click'
                   AND c.us < p.us AND c.us >= p.us - {MT_WINDOW_US}), 0), 6)
             AS credit_per_touch
    FROM ev p WHERE p.event_type = 'purchase'
    """,
)
def multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (multi-touch) attribution: every click in the 24 h
    lookback shares the purchase credit equally — the fairness
    counterpart to `purchase_click_attribution`'s last-touch rule
    (pipeline7), and the RANGE-frame member of the family: the touch
    count is a `RANGE BETWEEN -24h AND -1µs` window over the SAME
    single user-keyed sort (a value-bounded frame, vs last-touch's
    row-bounded carry-forward) — still no self-join, still one
    shuffle. The oracle is the quadratic correlated COUNT.

    Strictly-before is the frame's upper bound (-1 µs); purchases with
    zero touches get NULL credit via nullif — both pinned in pytest."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    tagged = ev.where(F.col("event_type").isin("click", "purchase")).withColumn(
        "is_click", (F.col("event_type") == "click").cast("long")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-MT_WINDOW_US, -1)
    )
    counted = tagged.withColumn("n_touches", F.sum("is_click").over(w))
    return counted.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.coalesce(F.col("n_touches"), F.lit(0)).cast("long").alias("n_touches"),
        F.round(
            F.lit(1.0) / F.nullif(F.coalesce(F.col("n_touches"), F.lit(0)), F.lit(0)),
            6,
        ).alias("credit_per_touch"),
    )
