"""Cogrouped-map UDF surface: two grouped frames processed together.

The reference's UDF surface is Map (UDTF) + Reduce (single-input UDAF)
(SURVEY.md §2c); cogroup is the TWO-input generalization Spark adds:
both sides hash-partition on the key, and the user function receives
the pair of per-key pandas frames (mr's reduce gets one value list —
cogroup gets two, the relational "full outer reduce"). The canonical
use is reconciliation: compare two event feeds per entity.

Scale: both sides shuffle once on the key (the same exchange a join
would plan); per-key work is Arrow-batched pandas. Groups must fit in
memory per key — same bound as applyInPandas, fine for per-user event
counts, wrong for hot keys (use the relational formulation then; this
query keeps both, the UDF as implementation and the SQL as oracle)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.registry import query

OUT_SCHEMA = (
    "user_id bigint, n_purchases bigint, purchase_value double, n_clicks bigint"
)


def _reconcile(key, purchases: pd.DataFrame, clicks: pd.DataFrame) -> pd.DataFrame:
    """Reconcile the PRE-AGGREGATED per-user rows (guide §2.3: aggregate
    before you shuffle — the raw-event form shipped every event row into
    the Python boundary; the partial aggregates ship ≤ 1 row per side
    per user and the map-side combine runs in the JVM).  Each side is a
    0-or-1-row frame; cents were accumulated as integers JVM-side (the
    dsum discipline — round(value*100) is exact on the 2dp values, so
    the sum is order-independent), and the only float op left is the
    single final cents/100 divide — identical to the raw-event form."""
    cents = int(purchases["cents"].sum())
    return pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_purchases": [
                int(purchases["n_purchases"].sum())
            ],
            "purchase_value": [cents / 100.0],
            "n_clicks": [int(clicks["n_clicks"].sum())],
        }
    )


@query(
    "cogroup_purchase_click_profile",
    oracle="""
    WITH p AS (
      SELECT user_id, COUNT(*) AS n_purchases,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100
               AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    c AS (
      SELECT user_id, COUNT(*) AS n_clicks
      FROM events WHERE event_type = 'click' GROUP BY user_id
    )
    SELECT COALESCE(p.user_id, c.user_id) AS user_id,
           COALESCE(p.n_purchases, 0) AS n_purchases,
           COALESCE(p.purchase_value, 0.0) AS purchase_value,
           COALESCE(c.n_clicks, 0) AS n_clicks
    FROM p FULL OUTER JOIN c ON p.user_id = c.user_id
    """,
)
def cogroup_purchase_click_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas: each user's purchase feed and click
    feed arrive as a pandas-frame PAIR (empty frame when a side has no
    rows for the key — full-outer semantics by construction); the UDF
    reconciles them into one profile row. The oracle is the relational
    twin (two aggs + full outer join)."""
    from go_map_reduce_spark.catalog import load_table
    from go_map_reduce_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    # Pre-aggregate each feed with built-ins BEFORE the cogroup (guide
    # §2.3/§4, r14 verdict item 4): the partial (map-side) aggregation
    # runs in the JVM and the exchange carries one narrow row per
    # (user, side) instead of every event; the cogroup's own shuffle
    # reuses the aggregation's hash partitioning (same key, same
    # partition count — no extra Exchange), so the Python boundary sees
    # 0-or-1-row frames per key.  round(value*100) on the 2dp values is
    # exact (never a .5 tie), so JVM round == the former pandas round
    # bit-for-bit and the result is unchanged.
    p = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_clicks"))
    )
    return (
        p.groupBy("user_id")
        .cogroup(c.groupBy("user_id"))
        .applyInPandas(_reconcile, schema=OUT_SCHEMA)
    )
