"""Relational surface, part 3: subquery shapes (correlated scalar, IN
with HAVING, NOT EXISTS + scalar aggregate) and distribution queries —
the TPC-H Q2/Q13/Q18/Q22 plan families.

Catalyst decorrelates all of these into joins/aggregates; the point of
registering them is (a) the subquery *surface*, (b) pinning that the
decorrelated plans stay shuffle-sane (see tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.catalog import load_table, register_views
from go_map_reduce_spark.functions.numeric import sql_dsum
from go_map_reduce_spark.registry import query


@query(
    "order_count_distribution",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey
    )
    GROUP BY n_orders
    """,
)
def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: count-of-counts (how many customers placed k
    orders). Two cascaded aggregations; the second one's input is
    |customers| rows, its output |distinct k| — shuffles shrink
    monotonically, the shape scales trivially."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "large_quantity_orders",
    oracle=f"""
    SELECT o_orderkey, o_orderpriority, {sql_dsum('l_quantity')} AS total_qty
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 150
    )
    GROUP BY o_orderkey, o_orderpriority
    """,
)
def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery with HAVING over an aggregate. The
    subquery is a semi-join against an aggregated key set; quantities
    compared in exact decimal so the qualifying set is engine-identical
    (a double HAVING boundary could flip rows between engines)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_orderpriority,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 150
        )
        GROUP BY o_orderkey, o_orderpriority
        """
    )


@query(
    "idle_rich_customers",
    oracle="""
    SELECT substr(c_name, 1, 9) AS name_prefix, c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery threshold + NOT EXISTS anti-join.
    avg() of doubles is an aggregation-order hazard — but both engines
    compute THIS avg over the same scan in whatever order and the
    comparison only needs the predicate set to agree; to keep it exact
    the threshold uses the decimal-avg discipline on both sides."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT substr(c_name, 1, 9) AS name_prefix, c_custkey, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6)))
                                       AS DOUBLE) / COUNT(*)
                           FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """
    )


@query(
    "cheapest_supplier_per_part",
    oracle="""
    SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_acctbal
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE l.l_extendedprice = (
      SELECT min(l2.l_extendedprice) FROM lineitem l2
      WHERE l2.l_partkey = p.p_partkey
    )
    GROUP BY p.p_partkey, p.p_name, s.s_suppkey, s.s_acctbal
    """,
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar subquery (min price per part)
    decorrelated by Catalyst into an aggregate + join. The group-by
    collapses ties (several lineitems can hit the min price)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_acctbal
        FROM part p
        JOIN lineitem l ON l.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE l.l_extendedprice = (
          SELECT min(l2.l_extendedprice) FROM lineitem l2
          WHERE l2.l_partkey = p.p_partkey
        )
        GROUP BY p.p_partkey, p.p_name, s.s_suppkey, s.s_acctbal
        """
    )


@query(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '[^A-Za-z]+'),
                                        x -> x <> '')) AS word
      FROM documents
    ),
    tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY doc_id, word),
    df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY word),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, word, tf,
           round(tf * ln(CAST(n_docs AS DOUBLE) / df), 8) AS tfidf
    FROM tf JOIN df USING (word) CROSS JOIN n
    WHERE tf * ln(CAST(n_docs AS DOUBLE) / df) > 0
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF term weighting — the text-analysis classic. tf and df are
    exact integer aggregates; idf's ln() is the one transcendental in
    the whole engine (libm vs JVM may differ in the last ulp), so the
    emitted score is rounded to 8dp. Words present in every document
    (idf = 0) are filtered as information-free."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split("text", "[^A-Za-z]+"), lambda x: x != "")
        ).alias("word"),
    )
    tf = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("word").agg(F.count_distinct("doc_id").alias("df"))
    # Corpus size as a broadcast 1-row aggregate (mirrors the oracle's
    # CROSS JOIN n) — keeps the query fully lazy: no job runs at
    # construction time, and the count fuses into the single DAG.
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    tfidf = F.col("tf") * F.log(F.col("n_docs") / F.col("df"))
    return (
        tf.join(dfreq, "word")
        .crossJoin(F.broadcast(n))
        .where(tfidf > 0)
        .select("doc_id", "word", "tf", F.round(tfidf, 8).alias("tfidf"))
    )


@query(
    "lateral_top_orders_per_segment",
    oracle="""
    SELECT s.c_mktsegment, t.o_orderkey, t.o_totalprice, t.o_custkey
    FROM (SELECT DISTINCT c_mktsegment FROM customer) s,
         LATERAL (
           SELECT o.o_orderkey, o.o_totalprice, o.o_custkey
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           WHERE c.c_mktsegment = s.c_mktsegment
           ORDER BY o.o_totalprice DESC, o.o_orderkey
           LIMIT 3
         ) t
    """,
)
def lateral_top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery with ORDER BY + LIMIT — the
    per-group-top-k shape expressed as a lateral join instead of a
    window (TPC-H has no LATERAL; this covers the subquery surface
    Catalyst decorrelates via DomainJoin + per-domain limit). Same
    result as a row_number() window; registering the LATERAL spelling
    pins that the decorrelation path stays correct."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s.c_mktsegment, t.o_orderkey, t.o_totalprice, t.o_custkey
        FROM (SELECT DISTINCT c_mktsegment FROM customer) s,
             LATERAL (
               SELECT o.o_orderkey, o.o_totalprice, o.o_custkey
               FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
               WHERE c.c_mktsegment = s.c_mktsegment
               ORDER BY o.o_totalprice DESC, o.o_orderkey
               LIMIT 3
             ) t
        """
    )
