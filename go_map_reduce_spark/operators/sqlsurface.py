"""Modern SQL-surface depth: GROUP BY ALL, UNION BY NAME, and join-hint
optimizer control.

These cover the SQL-dialect conveniences a user migrating from the
reference's hand-written Go apps to a SQL engine actually types, and the
one lever (hints) that steers physical strategy without changing
semantics. Each runs the IDENTICAL SQL text on DuckDB where the dialects
agree (GROUP BY ALL), or the documented equivalent where they diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.catalog import load_table, register_views
from go_map_reduce_spark.functions.numeric import sql_dsum
from go_map_reduce_spark.registry import query

_GBA_SQL = f"""
SELECT o_orderpriority,
       o_orderstatus,
       COUNT(*) AS n,
       {sql_dsum("o_totalprice")} AS total
FROM orders
GROUP BY ALL
"""


@query("group_by_all_revenue", oracle=_GBA_SQL)
def group_by_all_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL — both engines (Spark 4 and DuckDB) infer the
    grouping keys from the non-aggregate select items, so the IDENTICAL
    SQL text runs on each side; the decimal-sum twin keeps the total
    bit-exact. Physical shape is an ordinary partial+final hash
    aggregate."""
    register_views(spark, sf_dir)
    return spark.sql(_GBA_SQL)


@query(
    "union_by_name_mix",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders WHERE o_orderkey % 100 = 0
    UNION ALL BY NAME
    SELECT o_totalprice, o_orderkey, NULL AS o_orderpriority
    FROM orders WHERE o_orderkey % 100 = 50
    """,
)
def union_by_name_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION by column NAME, not position: the second branch has a
    different column order and a missing column — `unionByName` with
    allowMissingColumns aligns by name and null-fills, the positional
    UNION ALL would silently mis-map columns (the classic schema-drift
    ingestion bug). DuckDB's `UNION ALL BY NAME` is the oracle twin
    (the missing column is made explicit there because DuckDB
    null-fills only name-matched unions)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    b = orders.where(F.col("o_orderkey") % 100 == 50).select(
        "o_totalprice", "o_orderkey"
    )
    return a.unionByName(b, allowMissingColumns=True)


_HINT_SQL_SPARK = f"""
SELECT /*+ BROADCAST(nation) */ n_name,
       COUNT(*) AS n_customers,
       {sql_dsum("c_acctbal")} AS total_balance
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""

_HINT_SQL_ORACLE = f"""
SELECT n_name,
       COUNT(*) AS n_customers,
       {sql_dsum("c_acctbal")} AS total_balance
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


@query("sql_hint_broadcast", oracle=_HINT_SQL_ORACLE)
def sql_hint_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-hint surface: `/*+ BROADCAST(nation) */` pins the physical
    strategy (BroadcastHashJoin — asserted in tests/test_plans) without
    touching semantics, so the oracle is the hint-free text. This is
    the optimizer-control contract: hints are the ONLY sanctioned
    override, and a wrong hint can't corrupt results — at 100 TB you
    hint the 25-row dimension precisely when statistics are missing or
    stale (e.g. fresh tables with no ANALYZE)."""
    register_views(spark, sf_dir)
    return spark.sql(_HINT_SQL_SPARK)


_PIPE_SQL_SPARK = """
FROM lineitem
|> WHERE l_shipdate >= DATE '1995-01-01'
|> AGGREGATE COUNT(*) AS n_items,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                           AS DECIMAL(38,6))) AS DOUBLE) AS revenue
   GROUP BY l_returnflag, l_linestatus
|> WHERE n_items > 0
|> SELECT l_returnflag, l_linestatus, n_items, revenue
"""

_PIPE_SQL_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       {sql_dsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1995-01-01'
GROUP BY l_returnflag, l_linestatus
HAVING COUNT(*) > 0
"""


@query("sql_pipe_revenue", oracle=_PIPE_SQL_ORACLE)
def sql_pipe_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4, SPARK-49555): the query is written as a
    linear |> dataflow — scan |> filter |> aggregate |> filter |>
    project — the textual form of the reference's map→shuffle→reduce
    pipeline (SURVEY.md §3.3), with Catalyst planning it identically to
    the nested-SQL oracle (same partial+final hash aggregate, same
    pushed filter). The post-AGGREGATE WHERE is pipe-syntax HAVING."""
    register_views(spark, sf_dir)
    return spark.sql(_PIPE_SQL_SPARK)


_SQL_UDF_ORACLE = f"""
SELECT l_returnflag,
       COUNT(*) AS n,
       {sql_dsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")}
         AS net_revenue
FROM lineitem
GROUP BY l_returnflag
"""


@query("sql_udf_net_revenue", oracle=_SQL_UDF_ORACLE)
def sql_udf_net_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative SQL UDF (Spark 4 CREATE FUNCTION ... RETURN expr) —
    the modern analog of the reference's compiled-plugin registry
    (main/mrworker.go:34-51, SURVEY.md §2a F19): the function body is a
    SQL expression, so Catalyst INLINES it into the calling plan —
    whole-stage codegen, no serialization boundary, unlike a Python UDF.
    The oracle textually expands the body, which is exactly what the
    optimizer does."""
    register_views(spark, sf_dir)
    spark.sql("DROP TEMPORARY FUNCTION IF EXISTS net_price")
    spark.sql(
        "CREATE TEMPORARY FUNCTION net_price(price DOUBLE, disc DOUBLE, tax DOUBLE) "
        "RETURNS DOUBLE RETURN price * (1.0 - disc) * (1.0 + tax)"
    )
    return spark.sql(f"""
        SELECT l_returnflag,
               COUNT(*) AS n,
               {sql_dsum("net_price(l_extendedprice, l_discount, l_tax)")}
                 AS net_revenue
        FROM lineitem
        GROUP BY l_returnflag
    """)


_LISTAGG_ORACLE = """
SELECT n_regionkey,
       string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation
GROUP BY n_regionkey
"""


@query("listagg_nations", oracle=_LISTAGG_ORACLE)
def listagg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG ... WITHIN GROUP (Spark 4, SQL:2016): ordered string
    aggregation as a first-class aggregate — the reference's indexer
    reduce (sorted comma-join, mrapps/indexer.go:36-39) as one SQL
    function instead of sort_array(collect_list()). The WITHIN GROUP
    order makes it deterministic per the engine-wide sorted-collection
    rule; DuckDB's ordered string_agg is the oracle twin."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT n_regionkey,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations
        FROM nation
        GROUP BY n_regionkey
    """)


_SESSVAR_ORACLE = f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_dsum('o_totalprice')} AS revenue
FROM orders
WHERE o_totalprice > 150000.0
GROUP BY o_orderpriority
"""


@query("sql_session_variable_revenue", oracle=_SESSVAR_ORACLE)
def sql_session_variable_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (Spark 4, SPARK-42849: DECLARE VARIABLE /
    SET VARIABLE) — the parameterized-job surface: the threshold lives
    in a typed session variable the query references by name, the
    modern analog of the reference's job parameters (nReduce and the
    app name flow into main/mrcoordinator.go as arguments, not literals).
    Catalyst folds the variable reference to a literal at plan time,
    so the filter still pushes into the parquet scan — parameterizing
    a query this way costs nothing at 100 TB; the oracle inlines the
    same constant."""
    register_views(spark, sf_dir)
    spark.sql(
        "DECLARE OR REPLACE VARIABLE price_floor DOUBLE DEFAULT 0.0"
    )
    spark.sql("SET VARIABLE price_floor = 150000.0")
    return spark.sql(f"""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               {sql_dsum('o_totalprice')} AS revenue
        FROM orders
        WHERE o_totalprice > price_floor
        GROUP BY o_orderpriority
    """)


_SCRIPTING_ORACLE = f"""
SELECT c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_above
FROM customer,
     (SELECT {sql_dsum('c_acctbal')} / COUNT(*) AS cutoff FROM customer) t
WHERE c_acctbal > t.cutoff
GROUP BY c_mktsegment
"""


@query("sql_scripting_segment_above_avg", oracle=_SCRIPTING_ORACLE)
def sql_scripting_segment_above_avg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SQL scripting (Spark 4, SPARK-48338: BEGIN ... END with DECLARE
    / SET / statement sequences) — the stored-procedure-shaped surface
    a SQL-first user reaches for instead of driver-side Python: a
    local variable is computed FROM the data (the decimal-detour mean
    balance, so the threshold is bit-identical to the oracle's), then
    the final statement's result set is the script's result.  Control
    flow (WHILE/IF) is exercised by the pytest twin, which pins a
    loop against a python-computed expectation; this gated form pins
    the variable-sequencing semantics the oracle can express.

    100 TB shape: the script is driver-side orchestration of ordinary
    Catalyst statements — the SET's scalar subquery is one
    map-side-combinable aggregate, and the folded variable lets the
    final filter evaluate as a per-row comparison; nothing about the
    scripting layer touches the data path."""
    register_views(spark, sf_dir)
    # The scripting flag is only needed while the script is PARSED and
    # executed inside this spark.sql call (the returned frame is the
    # final statement's already-resolved plan) — restore the previous
    # value so a shared session doesn't carry the flag into every
    # later query/bench run (r13 ADVICE: conf-state leak).
    prev = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return spark.sql("""
            BEGIN
              DECLARE cutoff DOUBLE;
              SET cutoff = (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6)))
                                        AS DOUBLE) / COUNT(*)
                            FROM customer);
              SELECT c_mktsegment AS segment,
                     CAST(COUNT(*) AS BIGINT) AS n_above
              FROM customer WHERE c_acctbal > cutoff
              GROUP BY c_mktsegment;
            END
        """)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.scripting.enabled")
        else:
            spark.conf.set("spark.sql.scripting.enabled", prev)


_COLLATED_ORACLE = """
WITH m(name) AS (
  VALUES ('nation_0'), ('Nation_7'), ('NATION_19'), ('nAtIoN_23'),
         ('unmatched land')
)
SELECT n.n_name, CAST(COUNT(c.c_custkey) AS BIGINT) AS n_customers
FROM nation n
JOIN m ON lower(n.n_name) = lower(m.name)
LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@query("collated_nation_customers", oracle=_COLLATED_ORACLE)
def collated_nation_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4, SPARK-46830): a case-insensitive
    equality join expressed as COLLATE UTF8_LCASE on the join key
    instead of wrapping both sides in lower() — the collation-aware
    comparison keeps the original cased value flowing through the
    plan (the output n_name is the table's casing, untouched), and
    Catalyst hashes under the collation so the join stays a plain
    broadcast hash join of the 5-row matcher dim.  The deliberately
    unmatched row pins that collation changes comparison, not
    membership.  The oracle lowers both sides — the pre-collation
    idiom the feature replaces."""
    register_views(spark, sf_dir)
    return spark.sql("""
        WITH m AS (
          SELECT * FROM VALUES ('nation_0'), ('Nation_7'), ('NATION_19'),
                               ('nAtIoN_23'), ('unmatched land') AS t(name)
        )
        SELECT n.n_name, CAST(COUNT(c.c_custkey) AS BIGINT) AS n_customers
        FROM nation n
        JOIN m ON n.n_name COLLATE UTF8_LCASE = m.name
        LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """)
