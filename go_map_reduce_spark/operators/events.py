"""Event-stream operators (batch form): JSON extraction, time-window
aggregation, sessionization.

The ``events`` table is the streaming fixture (FIXTURES.md §3); these are
the batch formulations — their Structured Streaming twins live in
``go_map_reduce_spark.streaming``. Batch and stream share the same
window semantics, so the DuckDB oracle checks both formulations'
correctness at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.functions.numeric import dsum, sql_dsum
from go_map_reduce_spark.registry import query


@query(
    "events_json_stats",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users,
           {sql_dsum('value')} AS sum_value,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions (ABSENT in the reference beyond its codec,
    SURVEY.md §2c): extract props.$.k, aggregate per event type.
    get_json_object is a native JVM expression — no Python in the path."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("user_id").alias("n_users"),
        dsum(F.col("value")).alias("sum_value"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "events_hourly_windows",
    oracle=f"""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (batch twin of
    streaming.windows.hourly_stream). date_trunc on TIMESTAMP_NTZ is
    timezone-free; grouping key cardinality = hours × types, tiny."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("sum_value"))
    )


@query(
    "events_json_typed",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(json_valid(props) AS BOOLEAN) AS is_valid,
           coalesce(json_extract_string(props, '$.missing'), '<absent>')
             AS missing_field
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) % 10 = 0
    """,
)
def events_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing: from_json with an explicit schema (vs the
    path-extraction of events_json_stats) — struct field access, schema
    enforcement, NULL for absent fields (surfaced via a sentinel so no
    raw NULL string crosses the comparison boundary), validity probing.
    All native Catalyst JSON expressions."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "p", F.from_json("props", "k bigint, missing string")
    )
    return (
        parsed.where(F.col("p.k") % 10 == 0)
        .select(
            "event_id",
            "event_type",
            F.col("p.k").alias("k"),
            F.col("p").isNotNull().alias("is_valid"),
            F.coalesce(F.col("p.missing"), F.lit("<absent>")).alias("missing_field"),
        )
    )


@query(
    "events_sliding_windows",
    oracle=f"""
    SELECT CAST(ws AS TIMESTAMP) AS window_start,
           CAST(ws + INTERVAL 60 MINUTE AS TIMESTAMP) AS window_end,
           event_type,
           COUNT(*) AS n,
           {sql_dsum('value')} AS sum_value
    FROM (
      SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE])
               AS ws,
             event_type, value
      FROM events
    )
    GROUP BY 1, 2, 3
    """,
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 30 min slide): each event lands in
    exactly 2 overlapping windows. Spark's window() expands rows
    window-count times before aggregating — the oracle mirrors that
    expansion with an explicit 2-element unnest. Both engines align
    30-min buckets on :00/:30 (origins 1970/2000 are both aligned)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "user_sessions",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_start
      FROM gaps
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(is_start) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           CAST(min(ts) AS TIMESTAMP) AS session_start,
           CAST(max(ts) AS TIMESTAMP) AS session_end
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap): lag → gap marker →
    running-sum session ids → per-session rollup. Partitioned by user_id
    throughout — one shuffle, reused by both windows and the final
    groupBy. Streaming twin: session_window(ts, '30 minutes')."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "is_start",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL '30' MINUTE")),
            1,
        ).otherwise(0),
    )
    sessions = marked.withColumn(
        "session_id",
        F.sum("is_start").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sessions.groupBy("user_id", F.col("session_id").cast("long").alias("session_id")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "funnel_click_view_purchase",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click
      FROM events GROUP BY user_id
    ),
    views AS (
      SELECT f.user_id, f.t_click, min(e.ts) AS t_view
      FROM firsts f JOIN events e
        ON e.user_id = f.user_id AND e.event_type = 'view'
       AND e.ts > f.t_click AND e.ts <= f.t_click + INTERVAL 24 HOUR
      GROUP BY f.user_id, f.t_click
    ),
    purchases AS (
      SELECT v.user_id, v.t_click, v.t_view, min(e.ts) AS t_purchase
      FROM views v JOIN events e
        ON e.user_id = v.user_id AND e.event_type = 'purchase'
       AND e.ts > v.t_view AND e.ts <= v.t_view + INTERVAL 24 HOUR
      GROUP BY v.user_id, v.t_click, v.t_view
    )
    SELECT CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS n_clicked,
           CAST(COUNT(DISTINCT v.user_id) AS BIGINT) AS n_then_viewed,
           CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS n_then_purchased
    FROM firsts f
    LEFT JOIN views v ON v.user_id = f.user_id
    LEFT JOIN purchases p ON p.user_id = f.user_id
    WHERE f.t_click IS NOT NULL
    """,
)
def funnel_click_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis with a conversion window: users who
    clicked, then viewed within 1 hour AFTER the first click, then
    purchased within 1 hour AFTER that view — the sequential-pattern
    query of product analytics (strictly ordered stages with deadlines,
    not mere event co-occurrence).

    Shape: ONE user-keyed shuffle computes all three stage timestamps
    from a per-user sorted event array — no self-joins (the oracle uses
    the textbook 3-join formulation precisely so the two independent
    strategies cross-check). Per-group state is one user's (ts, type)
    pairs — bounded by per-user activity, which a real deployment caps
    (slice the array / pre-filter to funnel event types) the same way
    sessionization bounds session length."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    t_click = F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
        "t_click"
    )
    per_user = ev.groupBy("user_id").agg(
        t_click,
        F.sort_array(F.collect_list(F.struct("ts", "event_type"))).alias("evs"),
    )
    # first view strictly after first click, first purchase strictly
    # after that view — two ordered scans over the per-user array
    hour = F.expr("INTERVAL '24' HOUR")
    t_view = F.array_min(
        F.transform(
            F.filter(
                F.col("evs"),
                lambda s: (s.event_type == "view")
                & (s.ts > F.col("t_click"))
                & (s.ts <= F.col("t_click") + hour),
            ),
            lambda s: s.ts,
        )
    )
    staged = per_user.where(F.col("t_click").isNotNull()).withColumn("t_view", t_view)
    t_purchase = F.array_min(
        F.transform(
            F.filter(
                F.col("evs"),
                lambda s: (s.event_type == "purchase")
                & (s.ts > F.col("t_view"))
                & (s.ts <= F.col("t_view") + hour),
            ),
            lambda s: s.ts,
        )
    )
    staged = staged.withColumn("t_purchase", t_purchase)
    return staged.agg(
        F.count(F.lit(1)).alias("n_clicked"),
        F.count("t_view").alias("n_then_viewed"),
        F.count(
            F.when(F.col("t_view").isNotNull(), F.col("t_purchase"))
        ).alias("n_then_purchased"),
    )


@query(
    "events_variant_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(COUNT(CASE WHEN json_extract_string(props, '$.missing')
                           IS NULL THEN NULL ELSE 1 END) AS BIGINT) AS n_missing
    FROM events
    GROUP BY event_type
    """,
)
def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the VARIANT type (Spark 4):
    parse_json(props) materializes the open-schema document once as a
    binary variant, then variant_get extracts typed paths — the
    shredded-encoding path for schema-on-read at scale, where one parse
    feeds many extractions instead of re-parsing the JSON string per
    path (get_json_object) or freezing a schema up front (from_json).
    try_variant_get returns NULL (not an error) for absent paths. The
    oracle is the equivalent JSON-string formulation — the values must
    agree regardless of encoding."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("variant_get(v, '$.k', 'bigint')")).alias("sum_k"),
        F.count(F.expr("try_variant_get(v, '$.missing', 'string')")).alias(
            "n_missing"
        ),
    )


@query(
    "max_concurrent_sessions",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_start
      FROM gaps
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(is_start) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM marked
    ),
    sessions AS (
      SELECT user_id, session_id,
             min(ts) AS s_start, max(ts) AS s_end
      FROM numbered GROUP BY user_id, session_id
    ),
    days AS (
      SELECT DISTINCT CAST(u AS DATE) AS day
      FROM (
        SELECT unnest(generate_series(CAST(s_start AS DATE),
                                      CAST(s_end AS DATE),
                                      INTERVAL 1 DAY)) AS u
        FROM sessions
      )
    ),
    carry AS (
      SELECT CAST(u AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS carry_in
      FROM (
        SELECT unnest(generate_series(CAST(s_start AS DATE) + 1,
                                      CAST(s_end AS DATE),
                                      INTERVAL 1 DAY)) AS u
        FROM sessions
        WHERE CAST(s_end AS DATE) > CAST(s_start AS DATE)
      ) GROUP BY 1
    ),
    pts AS (
      SELECT CAST(s_start AS DATE) AS day, s_start AS ts, 1 AS delta
      FROM sessions
      UNION ALL
      SELECT CAST(s_end AS DATE) AS day, s_end AS ts, -1 AS delta
      FROM sessions
    ),
    sweep AS (
      SELECT day,
             SUM(delta) OVER (
               PARTITION BY day ORDER BY ts, delta DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS run
      FROM pts
    ),
    peaks AS (
      SELECT day, MAX(run) AS peak FROM sweep GROUP BY day
    )
    SELECT CAST(days.day AS TIMESTAMP) AS day,
           COALESCE(carry.carry_in, 0) AS carry_in,
           CAST(COALESCE(carry.carry_in, 0)
                + GREATEST(COALESCE(peaks.peak, 0), 0) AS BIGINT)
             AS max_concurrent
    FROM days
    LEFT JOIN carry ON days.day = carry.day
    LEFT JOIN peaks ON days.day = peaks.day
    """,
)
def max_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak session concurrency per day — the capacity-planning sweep
    over the sessionized events (an interval-overlap max, the operator
    behind "max simultaneous users").

    Scale design: a naive sweep is ONE global running sum — an
    unpartitioned window that serializes on a single task. This
    implementation makes the sweep day-partitionable: sessions spanning
    midnight contribute a per-day carry-in count (exploded over their
    spanned days — fan-out bounded by session duration, here ≤ hours),
    and each day's interior is swept independently with a window
    PARTITIONED BY day (start events before end events at equal
    timestamps, so instantaneous overlap counts both sides). Peak(day) =
    carry_in + max(0, max prefix sum). All integers — bit-deterministic
    at any parallelism."""
    sessions = user_sessions(spark, sf_dir).select(
        F.col("session_start").alias("s_start"),
        F.col("session_end").alias("s_end"),
        F.to_date("session_start").alias("d_start"),
        F.to_date("session_end").alias("d_end"),
    )
    days = sessions.select(
        F.explode(F.sequence("d_start", "d_end")).alias("day")
    ).distinct()
    carry = (
        sessions.where(F.col("d_end") > F.col("d_start"))
        .select(
            F.explode(F.sequence(F.date_add("d_start", 1), "d_end")).alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("carry_in"))
    )
    pts = sessions.select(
        F.col("d_start").alias("day"), F.col("s_start").alias("ts"),
        F.lit(1).alias("delta"),
    ).unionAll(
        sessions.select(
            F.col("d_end").alias("day"), F.col("s_end").alias("ts"),
            F.lit(-1).alias("delta"),
        )
    )
    w = W.partitionBy("day").orderBy(F.col("ts"), F.col("delta").desc())
    peaks = (
        pts.withColumn(
            "run",
            F.sum("delta").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
        .groupBy("day")
        .agg(F.max("run").alias("peak"))
    )
    return (
        days.join(carry, "day", "left")
        .join(peaks, "day", "left")
        .select(
            F.col("day").cast("timestamp_ntz").alias("day"),
            F.coalesce(F.col("carry_in"), F.lit(0)).cast("long").alias("carry_in"),
            (
                F.coalesce(F.col("carry_in"), F.lit(0))
                + F.greatest(F.coalesce(F.col("peak"), F.lit(0)), F.lit(0))
            ).cast("long").alias("max_concurrent"),
        )
    )
