"""Function-surface depth: window frames/rankers, extended string
functions, and the modern aggregate functions (FILTER/count_if/bool_* /
max_by) — the long tail of SURVEY.md §2c's scalar/window/agg rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.registry import query


@query(
    "window_frame_functions",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           percent_rank()    OVER w AS prnk,
           cume_dist()       OVER w AS cdist,
           CAST(ntile(4)     OVER w AS BIGINT) AS quartile,
           first_value(o_orderkey) OVER w AS first_key,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS range_running
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_frame_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + distribution window functions and a RANGE frame.
    percent_rank/cume_dist are exact integer ratios (rank-1)/(n-1), k/n —
    single IEEE divisions, engine-identical. The RANGE frame sums peers
    together (vs ROWS) — peers are exact duplicates of the sort key, so
    the decimal running sum stays deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wr = w.rangeBetween(W.unboundedPreceding, W.currentRow)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .over(wr)
        .cast("double")
        .alias("range_running"),
    )


@query(
    "string_functions_extended",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           reverse(c_name) AS name_rev,
           replace(c_name, 'Customer', 'Cust') AS name_short,
           regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_masked,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
           repeat(c_mktsegment[1:1], 3) AS seg_x3,
           CAST(strpos(c_name, '1') AS BIGINT) AS first_one_at,
           CAST(levenshtein(c_mktsegment, 'MACHINERY') AS BIGINT) AS lev_to_machinery,
           split_part(c_name, '#', 2) AS name_num,
           trim(concat('  ', c_mktsegment, ' ')) AS seg_trimmed
    FROM customer
    """,
)
def string_functions_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string surface: case, reverse, replace, regexp_replace,
    padding, repeat, search, levenshtein, split_part, trim — all native
    JVM expressions (SURVEY.md §2c: the reference's only string ops live
    inside its plugin apps; here they're engine primitives)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.reverse("c_name").alias("name_rev"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("name_short"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_masked"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.repeat(F.substring("c_mktsegment", 1, 1), 3).alias("seg_x3"),
        F.instr("c_name", "1").cast("long").alias("first_one_at"),
        F.levenshtein("c_mktsegment", F.lit("MACHINERY"))
        .cast("long")
        .alias("lev_to_machinery"),
        F.split_part("c_name", F.lit("#"), F.lit(2)).alias("name_num"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias(
            "seg_trimmed"
        ),
    )


@query(
    "aggregate_function_depth",
    oracle="""
    SELECT o_orderpriority,
           CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_orderstatus = 'P') AS any_pending,
           arg_max(o_custkey, o_orderkey) AS latest_custkey,
           arg_min(o_custkey, o_orderkey) AS earliest_custkey,
           max(o_orderkey) - min(o_orderkey) AS key_span
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def aggregate_function_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern aggregate surface: count_if, FILTER clause, bool_and/or,
    max_by/min_by (arg_max/arg_min). The by-key (o_orderkey) is unique,
    so arg-extremes are deterministic — the rule for using max_by at
    all (ties make it engine-arbitrary)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderstatus") == "P").alias("any_pending"),
        F.max_by("o_custkey", "o_orderkey").alias("latest_custkey"),
        F.min_by("o_custkey", "o_orderkey").alias("earliest_custkey"),
        (F.max("o_orderkey") - F.min("o_orderkey")).alias("key_span"),
    )


@query(
    "higher_order_array_ops",
    oracle=r"""
    SELECT doc_id,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
             AS total_chars,
           CAST(len(list_filter(toks, x -> length(x) > 4)) AS BIGINT) AS n_long,
           len(list_filter(toks, x -> x LIKE 'th%')) > 0 AS any_th,
           len(list_filter(toks, x -> length(x) >= 20)) = 0 AS all_short,
           -- first max-length token; expressed positionally because
           -- DuckDB 1.0 mis-evaluates list_reduce when other lambdas
           -- share the same subquery column (verified: standalone
           -- list_reduce agrees, the combined query does not)
           toks[list_position(list_transform(toks, x -> length(x)),
                              list_max(list_transform(toks, x -> length(x))))]
             AS longest_tok,
           array_to_string(list_transform(range(1, least(len(toks), 3) + 1),
                                          i -> (i - 1) || ':' || toks[i]),
                           ',') AS first3_indexed
    FROM (SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '[^A-Za-z]+'), x -> x <> '')
                   AS toks
          FROM documents)
    WHERE len(toks) > 0
    """,
)
def higher_order_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambda-function surface (SURVEY.md §2c scalar fns):
    aggregate (fold), filter, exists, forall, and an index-aware
    transform — all Catalyst lambda expressions evaluated JVM-side per
    row, zero shuffle. The fold initializes with 0/'' so empty-ish
    inputs are total; longest_tok resolves ties to the FIRST
    max-length token on both engines (fold order is left-to-right by
    definition, which is what makes a fold deterministic where a
    max_by on length would be tie-arbitrary)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", "[^A-Za-z]+"), lambda x: x != "")
    t = docs.select("doc_id", toks.alias("toks")).where(F.size("toks") > 0)
    tk = F.col("toks")
    return t.select(
        "doc_id",
        F.aggregate(
            tk, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("total_chars"),
        F.size(F.filter(tk, lambda x: F.length(x) > 4)).cast("long").alias("n_long"),
        F.exists(tk, lambda x: x.startswith("th")).alias("any_th"),
        F.forall(tk, lambda x: F.length(x) < 20).alias("all_short"),
        F.aggregate(
            tk,
            F.lit(""),
            lambda acc, x: F.when(F.length(x) > F.length(acc), x).otherwise(acc),
        ).alias("longest_tok"),
        F.concat_ws(
            ",",
            F.transform(
                F.slice(tk, 1, 3), lambda x, i: F.concat(i.cast("string"), F.lit(":"), x)
            ),
        ).alias("first3_indexed"),
    )
