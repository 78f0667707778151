"""Round-4 relational-surface depth: null-safe join equality, MapType
higher-order functions, and try_* error-safe arithmetic.

Three places engine dialects classically diverge, each pinned against
the DuckDB oracle: `<=>` join matching NULL keys to NULL keys (ANSI `IS
NOT DISTINCT FROM`), map construction/filter/value-transform (DuckDB
has no higher-order map functions — the oracle proves the semantics
relationally on (key, value) pairs), and division-by-zero returning
NULL instead of raising (`try_divide` vs `x / NULLIF(y, 0)`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.registry import query


@query(
    "null_safe_join_segments",
    oracle="""
    WITH c AS (
      SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg
      FROM customer
    ),
    dim AS (
      SELECT DISTINCT nullif(c_mktsegment, 'BUILDING') AS seg,
             coalesce(nullif(c_mktsegment, 'BUILDING'), 'UNSEGMENTED')
               AS seg_label
      FROM customer
    )
    SELECT seg_label, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM c JOIN dim ON c.seg IS NOT DISTINCT FROM dim.seg
    GROUP BY seg_label
    """,
)
def null_safe_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    MATCH NULL keys — the semantics needed when a dimension carries an
    explicit "unknown" member. A plain equi-join silently drops every
    NULL-keyed row (here: all BUILDING customers, nulled out to model
    missing segmentation); `<=>` routes them to the NULL dim row.
    Physically still a hash join — `<=>` is an equality predicate, so
    no nested-loop fallback; the dim side broadcasts."""
    cust = load_table(spark, sf_dir, "customer")
    c = cust.select(
        "c_custkey", F.nullif("c_mktsegment", F.lit("BUILDING")).alias("seg")
    )
    dim = (
        cust.select(F.nullif("c_mktsegment", F.lit("BUILDING")).alias("seg"))
        .distinct()
        .withColumn("seg_label", F.coalesce("seg", F.lit("UNSEGMENTED")))
    )
    return (
        c.join(F.broadcast(dim), c["seg"].eqNullSafe(dim["seg"]))
        .groupBy("seg_label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )


MIN_DOCS_PER_LANG = 3


@query(
    "map_functions_surface",
    oracle=f"""
    WITH counts AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY source, lang
    ),
    kept AS (
      SELECT source, lang, n * 2 AS scaled
      FROM counts WHERE n >= {MIN_DOCS_PER_LANG}
    ),
    n_langs AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_langs
      FROM counts GROUP BY source
    ),
    entries AS (
      SELECT source, string_agg(lang || '=' || scaled, ',' ORDER BY lang)
               AS kept_entries
      FROM kept GROUP BY source
    )
    SELECT n_langs.source, n_langs.n_langs,
           coalesce(entries.kept_entries, '') AS kept_entries
    FROM n_langs LEFT JOIN entries ON n_langs.source = entries.source
    """,
)
def map_functions_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: build a per-source lang→count map
    (map_from_entries over collected structs), then map_filter (drop
    rare languages), transform_values (scale), map_keys — emitted as a
    canonical sorted "k=v" string so the result is engine-comparable
    (DuckDB has no higher-order map functions; its oracle derives the
    same entries relationally). The map stays bounded: |langs| entries
    per source — collect_list on bounded-cardinality groups only, per
    the engine's determinism rule (sort before serialize)."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    as_map = counts.groupBy("source").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("lang", "n")))
        ).alias("lang_counts")
    )
    kept = F.transform_values(
        F.map_filter(
            F.col("lang_counts"), lambda _k, v: v >= MIN_DOCS_PER_LANG
        ),
        lambda _k, v: v * 2,
    )
    return as_map.select(
        "source",
        F.size(F.map_keys("lang_counts")).cast("long").alias("n_langs"),
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.map_entries(kept)),
                lambda e: F.concat_ws("=", e["key"], e["value"].cast("string")),
            ),
        ).alias("kept_entries"),
    )


@query(
    "try_arithmetic_ratios",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS n_purchases,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_clicks
      FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(n_purchases AS BIGINT) AS n_purchases,
           CAST(n_clicks AS BIGINT) AS n_clicks,
           CAST(n_purchases AS DOUBLE) / NULLIF(n_clicks, 0)
             AS purchase_per_click
    FROM per_user
    """,
)
def try_arithmetic_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic: per-user purchase/click ratio where
    clickless users must yield NULL, not a division error or Inf.
    Spark's `try_divide` is the ANSI-mode-safe form (works identically
    with spark.sql.ansi.enabled on or off — the portability point);
    the oracle spells it NULLIF. One aggregation, conditional counts
    map-side."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_purchases"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("n_clicks"),
    )
    return per_user.select(
        "user_id",
        "n_purchases",
        "n_clicks",
        F.try_divide(F.col("n_purchases").cast("double"), F.col("n_clicks")).alias(
            "purchase_per_click"
        ),
    )
