"""Round-5 pipeline operators, eighth batch: activity streaks
(gaps-and-islands on dates), per-brand price trends (grouped OLS on
the time axis), and keyword-in-context extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.registry import query

# --------------------------------------------------------------------------
# Longest consecutive-day activity streak per user (gaps-and-islands)
# --------------------------------------------------------------------------


@query(
    "activity_streaks",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    grouped AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY d) AS INT) AS island
      FROM ud
    ),
    streaks AS (
      SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS len
      FROM grouped GROUP BY user_id, island
    )
    SELECT user_id,
           max(len) AS longest_streak,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM streaks GROUP BY user_id
    """,
)
def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    engagement metric retention teams alert on, and the canonical
    GAPS-AND-ISLANDS shape on the date axis: subtracting each active
    day's per-user rank from the day itself maps every unbroken run
    to one constant 'island' key (consecutive days advance both by
    1), so streaks fall out of two grouped counts — no self-join, no
    per-user iteration. (repeated_ngram_spans, pipeline5, is the same
    trick on token positions; here the islands live on calendar
    dates.)

    One shuffle on user (the distinct + window share the
    partitioning); the window orders each user's dates — bounded by
    days-in-horizon per user, never corpus-wide. Integer-only."""
    ud = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("d"))
    grouped = ud.select(
        "user_id", "d", F.date_sub(F.col("d"), rn).alias("island")
    )
    streaks = grouped.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.sum("len").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


# --------------------------------------------------------------------------
# Per-brand price trend: grouped OLS slope on the time axis
# --------------------------------------------------------------------------

TREND_ANCHOR = "1995-01-01"


@query(
    "price_trend_by_brand",
    oracle=f"""
    WITH pts AS (
      SELECT p.p_brand,
             CAST(date_diff('day', DATE '{TREND_ANCHOR}',
                            CAST(l.l_shipdate AS DATE)) AS BIGINT) AS x,
             CAST(round(l.l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    s AS (
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy
      FROM pts GROUP BY p_brand
    )
    SELECT p_brand, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx) / 100.0, 9)
             AS slope_dollars_per_day
    FROM s WHERE n * sxx - sx * sx <> 0
    """,
)
def price_trend_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price trend per brand: OLS slope of line price (dollars) over
    ship date (days) — the per-entity model fit a feature store
    materializes for thousands of groups at once (per-SKU / per-brand
    price drift). Same integer-sufficient-statistics discipline as
    regression_price_on_quantity (stats.py) with the X AXIS DERIVED
    FROM TIME: x = whole days since a fixed anchor (exact integers on
    both engines), y = price cents; all co-moments ride DECIMAL(38,0)
    so nothing wraps at any SF, and the slope is two IEEE divisions
    at the very end.

    Per-group state is five numbers — one map-side-combinable shuffle
    carrying ~40-byte rows regardless of data size; part joins in by
    broadcast. Degenerate groups (zero x-variance) are excluded by
    the same predicate on both engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.lit(TREND_ANCHOR).cast("date")
        ).cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pts = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    s = pts.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).cast("double").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y"))
        .cast("double")
        .alias("sxy"),
    )
    n = F.col("n")
    denom = n * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / denom / F.lit(100.0)
    return s.where(denom != 0).select(
        "p_brand", "n", F.round(slope, 9).alias("slope_dollars_per_day")
    )


# --------------------------------------------------------------------------
# Keyword-in-context (KWIC) concordance extraction
# --------------------------------------------------------------------------

KWIC_TERM = "spark"
KWIC_RADIUS = 3

# KWIC_TERM is interpolated into BOTH generated expressions (the Spark
# SQL expr and the DuckDB oracle f-string); constrain it to a
# quote/backslash-free token class so a future constant change cannot
# break or silently alter either generated expression.  A raised
# ValueError (not assert — asserts vanish under python -O) keeps the
# guard alive in every interpreter mode.
import re as _re  # noqa: E402

if not _re.fullmatch(r"[A-Za-z0-9_\-]+", KWIC_TERM):
    raise ValueError(f"KWIC_TERM must be a quote-free token: {KWIC_TERM!r}")


@query(
    "keyword_in_context",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
      FROM documents
    ),
    hits AS (
      SELECT doc_id, CAST(p AS INT) AS pos, t
      FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS p FROM toks)
      WHERE t[p] = '{KWIC_TERM}'
    )
    SELECT doc_id, pos,
           list_aggregate(t[greatest(pos - {KWIC_RADIUS}, 1):pos + {KWIC_RADIUS}],
                          'string_agg', ' ') AS context
    FROM hits
    """,
)
def keyword_in_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context concordance: every occurrence of
    '{KWIC_TERM}' with ±{KWIC_RADIUS} tokens of context — the
    corpus-inspection tool behind annotation sampling, sense
    disambiguation review, and leakage spot-checks (the page a search
    hit shows AROUND the match).

    The match positions AND their context slices are both computed in
    the array domain (higher-order transform/filter over the token
    array, one row per document), so the generate emits only the hit
    structs: the token array is never duplicated per hit row. The
    previous shape carried `t` through a posexplode — O(len²) bytes
    through the generate for a pathological document whose every token
    matches; this one is O(len + hits·window), the at-scale winner the
    r06 verdict asked for.

    Slice boundaries clamp at both ends (array ends, not errors);
    1-based positions match between Spark's transform index (+1) and
    DuckDB list indexing."""
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", toks.alias("t")
    )
    hits = F.expr(
        f"""
        transform(
          filter(transform(t, (w, i) -> IF(w = '{KWIC_TERM}', i + 1, -1)),
                 p -> p > 0),
          p -> named_struct(
            'pos', CAST(p AS INT),
            'context', array_join(
              slice(t, greatest(p - {KWIC_RADIUS}, 1),
                    least(p + {KWIC_RADIUS}, size(t))
                      - greatest(p - {KWIC_RADIUS}, 1) + 1), ' ')))
        """
    )
    return docs.select("doc_id", F.explode(hits).alias("h")).select(
        "doc_id",
        F.col("h.pos").alias("pos"),
        F.col("h.context").alias("context"),
    )
