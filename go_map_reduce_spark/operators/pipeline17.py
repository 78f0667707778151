"""Round-5 pipeline operators, tenth batch: trending ranks with
week-over-week movement, and nearest-in-time (bidirectional as-of)
joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.registry import query, track_cache

# --------------------------------------------------------------------------
# Weekly trending parts: per-week top-k with rank movement
# --------------------------------------------------------------------------

TREND_TOP_K = 5


@query(
    "trending_parts_weekly",
    oracle=f"""
    WITH wk AS (
      SELECT strftime(date_trunc('week', l_shipdate), '%Y-%m-%d') AS week,
             l_partkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1, 2
    ),
    ranked AS (
      SELECT week, l_partkey, qty,
             CAST(row_number() OVER (
               PARTITION BY week ORDER BY qty DESC, l_partkey
             ) AS BIGINT) AS rk
      FROM wk
    ),
    top AS (SELECT * FROM ranked WHERE rk <= {TREND_TOP_K})
    SELECT t.week, t.l_partkey, t.qty, t.rk,
           CAST(prev.rk AS BIGINT) AS prev_rk
    FROM top t
    LEFT JOIN ranked prev
      ON prev.l_partkey = t.l_partkey
     AND prev.week = strftime(CAST(t.week AS DATE) - INTERVAL 7 DAY, '%Y-%m-%d')
    """,
)
def trending_parts_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly top-{TREND_TOP_K} parts by shipped quantity with each
    part's rank in the PREVIOUS week (NULL = new entry) — the
    trending/movers report: rank movement is the signal, the rank
    itself is just the cut. Quantities sum as integers (exact); the
    per-week ranking is WindowGroupLimit-prunable; the movement
    lookup joins the top-k rows (a tiny frame) back against the full
    ranked frame on (part, previous week) — broadcast-sized by
    construction, so rank history costs nothing extra at scale. Weeks
    align via date_trunc('week') on both engines (Monday start), and
    the previous week is literal day arithmetic (−7 days on a week
    start is the previous week start — no week-of-year wraparound
    semantics to disagree on)."""
    li = load_table(spark, sf_dir, "lineitem")
    wk = li.groupBy(
        F.date_format(F.date_trunc("week", F.col("l_shipdate")), "yyyy-MM-dd")
        .alias("week"),
        "l_partkey",
    ).agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    rk = F.row_number().over(
        W.partitionBy("week").orderBy(F.desc("qty"), F.asc("l_partkey"))
    )
    ranked = wk.withColumn("rk", rk.cast("long")).persist().transform(track_cache)  # top + history
    top = ranked.where(F.col("rk") <= TREND_TOP_K)
    prev = ranked.select(
        F.col("l_partkey").alias("p_prev"),
        F.col("week").alias("week_prev"),
        F.col("rk").alias("prev_rk"),
    )
    prev_week = F.date_format(
        F.date_add(F.col("week").cast("date"), -7), "yyyy-MM-dd"
    )
    return top.join(
        prev,
        (F.col("l_partkey") == F.col("p_prev"))
        & (F.col("week_prev") == prev_week),
        "left",
    ).select("week", "l_partkey", "qty", "rk", "prev_rk")


# --------------------------------------------------------------------------
# Nearest-in-time join (bidirectional as-of)
# --------------------------------------------------------------------------


@query(
    "asof_join_nearest",
    oracle="""
    WITH pur AS (
      SELECT event_id, user_id, epoch_us(ts) AS us FROM events
      WHERE event_type = 'purchase'
    ),
    cl AS (
      SELECT user_id, epoch_us(ts) AS us FROM events
      WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id,
           (SELECT min(abs(c.us - p.us)) FROM cl c
            WHERE c.user_id = p.user_id) AS nearest_gap_us
    FROM pur p
    """,
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-in-time match (bidirectional as-of): for every purchase,
    the smallest |Δt| to ANY click of the same user — before or after
    — the sensor-alignment variant of the as-of family
    (asof_join_user_orders is backward-only, asof_join_tolerance adds
    a staleness bound; pandas calls this merge_asof
    direction='nearest'). One union-sort does it with zero self-join:
    on the user-keyed time-ordered frame, each purchase takes the
    last click at-or-before (carry-forward window ≤ current row) and
    the first click after (carry-backward window ≥ current row,
    exclusive of self via frame start +1... here: lead-style
    following frame), and the nearest is the min of the two gaps.
    Ties in |Δt| don't matter — the output IS the gap (the oracle's
    correlated min), sidestepping which-side tie-break divergence.
    NULL when the user never clicked."""
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            F.when(
                F.col("event_type") == "click",
                F.unix_micros(F.col("ts").cast("timestamp")),
            ).alias("click_t"),
        )
    )
    # clicks at the same microsecond as the purchase count (|Δ| = 0):
    # include the current row in the backward frame; click rows
    # themselves carry click_t so a same-instant click is seen there
    wb = (
        W.partitionBy("user_id")
        .orderBy("us")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy("us")
        .rowsBetween(0, W.unboundedFollowing)
    )
    carried = ev.withColumn(
        "prev_click", F.last("click_t", ignorenulls=True).over(wb)
    ).withColumn("next_click", F.first("click_t", ignorenulls=True).over(wf))
    return carried.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.least(
            F.abs(F.col("us") - F.col("prev_click")),
            F.abs(F.col("next_click") - F.col("us")),
        ).alias("nearest_gap_us"),
    )
