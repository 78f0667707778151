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
