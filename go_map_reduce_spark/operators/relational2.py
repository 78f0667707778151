"""Relational surface, part 2: outer joins, date arithmetic, SQL entry
point, and skew-resistant (salted) aggregation.

Complements operators.relational for SURVEY.md §2c "joins (all kinds)"
and scalar-function rows, and demonstrates the two remaining execution
disciplines: the SQL API as a first-class query surface (same Catalyst
plan as the DataFrame API), and two-phase salted aggregation for skewed
keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.catalog import load_table, register_views
from go_map_reduce_spark.functions.numeric import dsum, sql_dsum
from go_map_reduce_spark.functions.texttok import exploded_tokens
from go_map_reduce_spark.registry import query


@query(
    "customer_order_profile_outer",
    oracle=f"""
    SELECT c_custkey, c_mktsegment,
           COUNT(o_orderkey) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_spend,
           coalesce(max(o_orderdate), TIMESTAMP '1970-01-01 00:00:00')
             AS last_order_date
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def customer_order_profile_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + agg: every customer appears, order-less ones
    with n_orders=0 and NULL spend — the null-preserving join semantics
    the inner-join queries can't exercise. The timestamp is coalesced to
    the epoch sentinel: a NULL inside a temporal column is the one value
    whose client representation differs between engines (None vs NaT),
    which would flake any representation-level comparison; NULL doubles
    and strings round-trip identically (see null_handling_profile)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_spend"),
            F.coalesce(
                F.max("o_orderdate"),
                F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'"),
            ).alias("last_order_date"),
        )
    )


@query(
    "supplier_part_full_outer",
    oracle="""
    SELECT coalesce(l.l_suppkey, s.s_suppkey) AS suppkey,
           s.s_name,
           COUNT(l.l_orderkey) AS n_lineitems
    FROM (SELECT DISTINCT l_suppkey, l_orderkey FROM lineitem) l
    FULL OUTER JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY 1, 2
    """,
)
def supplier_part_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: suppliers with no lineitems and (hypothetical)
    lineitem suppkeys with no supplier row both survive."""
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_orderkey").distinct()
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey, "full_outer")
        .groupBy(
            F.coalesce("l_suppkey", "s_suppkey").alias("suppkey"), F.col("s_name")
        )
        .agg(F.count("l_orderkey").alias("n_lineitems"))
    )


@query(
    "order_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_date,
           CAST(CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS TIMESTAMP)
             AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
             AS days_since_epoch_start,
           date_trunc('month', o_orderdate) AS order_month,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01'
    """,
)
def order_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic surface: interval add, day diffs, month trunc,
    last_day — all whole-day operations on midnight timestamps, so both
    engines' boundary-counting semantics coincide exactly."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '2000-01-01 00:00:00'")
    )
    return orders.select(
        "o_orderkey",
        # date arithmetic runs in DATE space, but every temporal output is
        # cast back to timestamp_ntz: Spark DATE reaches pandas as
        # datetime.date while DuckDB DATE reaches it as datetime64, which
        # no representation-level comparator treats as equal.
        F.col("o_orderdate").cast("date").cast("timestamp_ntz").alias("order_date"),
        (F.col("o_orderdate") + F.expr("INTERVAL '90' DAY"))
        .cast("date")
        .cast("timestamp_ntz")
        .alias("due_date"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        )
        .cast("long")
        .alias("days_since_epoch_start"),
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.last_day(F.col("o_orderdate").cast("date"))
        .cast("timestamp_ntz")
        .alias("month_end"),
    )


@query(
    "sql_interface_revenue",
    oracle=f"""
    SELECT n_name,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           {sql_dsum(
               'l_extendedprice * (1 - l_discount)'
           )} AS revenue,
           COUNT(DISTINCT o_orderkey) AS n_orders
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name, year(o_orderdate)
    """,
)
def sql_interface_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL API as a query surface (SURVEY.md §2a F19's
    spark.udf/SQL-exposure requirement): views registered in the
    catalog, the query expressed as SQL text, Catalyst producing the
    same plan the DataFrame API would."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name,
               CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
               COUNT(DISTINCT o_orderkey) AS n_orders
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, year(o_orderdate)
        """
    )


N_SALTS = 16


@query(
    "wordcount_salted",
    oracle="""
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT unnest(regexp_split_to_array(text, '[^A-Za-z]+')) AS word
          FROM documents) t
    WHERE word <> ''
    GROUP BY word
    """,
)
def wordcount_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant wordcount: two-phase aggregation with an explicit
    salt. Phase 1 groups on (word, salt) so a hot key's rows spread over
    N_SALTS reducers; phase 2 merges the partial counts per word.

    Same oracle as `wordcount` — identical semantics, different physical
    strategy. For plain counts Spark's partial aggregation already
    defuses skew, so this exists as the *pattern* for skewed keys under
    holistic aggregates (collect_list/percentile) where map-side combine
    can't save you; there the salt is the difference between a stuck
    straggler and an even reduce stage.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = exploded_tokens(docs.select("text"))
    # Deterministic salt: hash(word, input partition id) is stable under
    # task retry/speculation (monotonically_increasing_id is not), while
    # still fanning a hot word's occurrences — which span many input
    # splits — across up to N_SALTS reducers.
    salted = words.withColumn(
        "salt",
        F.pmod(F.xxhash64("word", F.spark_partition_id()), F.lit(N_SALTS)),
    )
    partial = salted.groupBy("word", "salt").agg(F.count(F.lit(1)).alias("c"))
    return partial.groupBy("word").agg(F.sum("c").alias("cnt"))


@query(
    "salted_join_segment_value",
    oracle=f"""
    SELECT c_mktsegment, COUNT(*) AS n_events, {sql_dsum('value')} AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def salted_join_segment_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant JOIN: the salted-replication pattern for a fact
    table whose join key is hot (a few users produce most events) when
    the other side is too big to broadcast.

    The fact side gets a deterministic per-row salt in [0, N_SALTS); the
    dimension side is replicated N_SALTS times (explode over the salt
    domain); the join key becomes (key, salt), so one hot key's rows
    spread over N_SALTS reducers instead of one straggler partition.
    `shuffle_hash` hint keeps the demonstrated physical strategy honest —
    without it Spark would broadcast this (tiny at test SF) dimension and
    the salt would never reach a shuffle. Results are identical to the
    plain join (oracle is the unsalted SQL); only the partitioning
    differs. At 100 TB prefer AQE skew-join splitting first
    (spark.sql.adaptive.skewJoin, already enabled by session.py) and
    reach for explicit salting when skew is known and extreme."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    salted_fact = ev.withColumn("salt", F.pmod(F.xxhash64("user_id", "value"), F.lit(N_SALTS)))
    replicated_dim = cust.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALTS)]))
    ).hint("shuffle_hash")
    return (
        salted_fact.join(
            replicated_dim,
            (F.col("user_id") == F.col("c_custkey")) & (salted_fact.salt == replicated_dim.salt),
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value")).alias("total_value"))
    )
