"""Round-4 pipeline operators, second batch: repeated-span detection
and a declarative data-quality constraint audit.

`repeated_ngram_spans` is the engine's take on exact substring
deduplication (Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better"): the suffix-array pass of that paper finds
exact duplicate token spans; the distributed equivalent fingerprints
every k-token window, keeps fingerprints occurring more than once, and
merges each document's duplicated window positions into maximal spans —
the spans a cleaning pass would excise or down-weight.

`dq_constraint_audit` is the Deequ-style declarative check suite: one
row per constraint (completeness, uniqueness, referential integrity,
range), each computed as an aggregate/anti-join — the gate a pipeline
runs before promoting a snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.registry import query

SPAN_K = 8  # k-gram window (tokens) — spans shorter than K can't be seen

_TOK_SQL = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"


@query(
    "repeated_ngram_spans",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOK_SQL} AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, p,
             md5(list_aggregate(t[p+1:p+{SPAN_K}], 'string_agg', chr(31)))
               AS fp
      FROM (SELECT doc_id, t, unnest(range(len(t) - {SPAN_K} + 1)) AS p
            FROM toks WHERE len(t) >= {SPAN_K})
    ),
    dupfp AS (
      SELECT fp FROM grams GROUP BY fp HAVING COUNT(*) > 1
    ),
    duppos AS (
      SELECT g.doc_id, g.p,
             CASE WHEN lag(g.p) OVER (PARTITION BY g.doc_id ORDER BY g.p)
                       IS DISTINCT FROM g.p - 1
                  THEN 1 ELSE 0 END AS is_start
      FROM grams g JOIN dupfp ON g.fp = dupfp.fp
    ),
    islands AS (
      SELECT doc_id, p,
             SUM(is_start) OVER (
               PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS island
      FROM duppos
    )
    SELECT doc_id,
           CAST(MIN(p) AS BIGINT) AS span_start,
           CAST(MAX(p) - MIN(p) + {SPAN_K} AS BIGINT) AS span_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_windows
    FROM islands
    GROUP BY doc_id, island
    """,
)
def repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated token spans per document: fingerprint every
    {SPAN_K}-token window (md5 over unit-separator-joined tokens),
    keep fingerprints seen >1 time corpus-wide, merge each doc's
    duplicated positions into maximal runs (gaps-and-islands window,
    partitioned by doc). Output: one row per span with its token start,
    length, and window count.

    Scale: the window explode is O(corpus tokens) — the wordcount cost
    class; the duplicate-fingerprint filter is one groupBy on the
    16-byte digest (bodies never shuffle — only (doc, pos, fp)); the
    island merge windows are per-doc (bounded). This is the
    distributed stand-in for the suffix-array pass of exact substring
    dedup: spans ≥ {SPAN_K} tokens are found exactly, shorter ones are
    invisible by construction."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", r"\s+"), lambda x: x != "").alias("t"),
    ).where(F.size("t") >= SPAN_K)
    grams = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - SPAN_K),
                lambda p: F.md5(
                    F.concat_ws("\x1f", F.slice("t", p + 1, SPAN_K))
                ),
            )
        ).alias("p", "fp"),
    )
    dupfp = grams.groupBy("fp").agg(F.count(F.lit(1)).alias("n")).where(
        F.col("n") > 1
    )
    duppos = grams.join(dupfp.select("fp"), "fp")
    w = W.partitionBy("doc_id").orderBy("p")
    marked = duppos.withColumn(
        "is_start",
        F.when(F.lag("p").over(w).isNull(), 1)
        .when(F.lag("p").over(w) != F.col("p") - 1, 1)
        .otherwise(0),
    )
    islands = marked.withColumn(
        "island",
        F.sum("is_start").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("p").cast("long").alias("span_start"),
            (F.max("p") - F.min("p") + SPAN_K).cast("long").alias("span_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_windows"),
        )
        .drop("island")
    )


@query(
    "dq_constraint_audit",
    oracle="""
    SELECT 'lineitem_orderkey_ri' AS constraint_name,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_checked,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
             AS n_violations
    UNION ALL
    SELECT 'orders_custkey_ri',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'orders_orderkey_unique',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
           (SELECT CAST(coalesce(SUM(n - 1), 0) AS BIGINT)
            FROM (SELECT COUNT(*) AS n FROM orders
                  GROUP BY o_orderkey HAVING COUNT(*) > 1))
    UNION ALL
    SELECT 'customer_acctbal_complete',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM customer),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
            WHERE c_acctbal IS NULL)
    UNION ALL
    SELECT 'lineitem_quantity_range',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
            WHERE l_quantity <= 0 OR l_quantity > 50)
    UNION ALL
    SELECT 'customer_acctbal_nonneg',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM customer),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
            WHERE c_acctbal < 0)
    """,
)
def dq_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit (the Deequ/dbt-test shape): six
    constraints — two referential-integrity anti-joins, a key
    uniqueness check, a completeness check, two range checks (one of
    which FIRES: negative account balances exist in the data) — each one
    aggregate row (constraint, rows checked, violations).

    Scale: each RI check is a LEFT ANTI join (broadcast when the
    referenced key set is small; shuffle-hash otherwise — never a
    driver-side set); uniqueness is a groupBy on the key; the rest are
    single-pass conditional counts. The checks stay independent
    frames unioned at the end, so Spark runs them as one job with
    shared scans where AQE finds them."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    def audit_row(name: str, checked: DataFrame, violations: DataFrame):
        n = checked.agg(F.count(F.lit(1)).cast("long").alias("n_checked"))
        v = violations.agg(
            F.count(F.lit(1)).cast("long").alias("n_violations")
        )
        return n.crossJoin(v).select(
            F.lit(name).alias("constraint_name"), "n_checked", "n_violations"
        )

    li_orphans = lineitem.join(
        orders.select("o_orderkey"),
        lineitem["l_orderkey"] == orders["o_orderkey"],
        "left_anti",
    )
    o_orphans = orders.join(
        customer.select("c_custkey"),
        orders["o_custkey"] == customer["c_custkey"],
        "left_anti",
    )
    dup_keys = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .agg(
            F.coalesce(F.sum(F.col("n") - 1), F.lit(0))
            .cast("long")
            .alias("n_violations")
        )
    )
    uniq_row = (
        orders.agg(F.count(F.lit(1)).cast("long").alias("n_checked"))
        .crossJoin(dup_keys)
        .select(
            F.lit("orders_orderkey_unique").alias("constraint_name"),
            "n_checked",
            "n_violations",
        )
    )
    return (
        audit_row("lineitem_orderkey_ri", lineitem, li_orphans)
        .unionAll(audit_row("orders_custkey_ri", orders, o_orphans))
        .unionAll(uniq_row)
        .unionAll(
            audit_row(
                "customer_acctbal_complete",
                customer,
                customer.where(F.col("c_acctbal").isNull()),
            )
        )
        .unionAll(
            audit_row(
                "lineitem_quantity_range",
                lineitem,
                lineitem.where(
                    (F.col("l_quantity") <= 0) | (F.col("l_quantity") > 50)
                ),
            )
        )
        .unionAll(
            audit_row(
                "customer_acctbal_nonneg",
                customer,
                customer.where(F.col("c_acctbal") < 0),
            )
        )
    )
