"""Round-5 pipeline operators, final batch: right-to-erasure cascade
accounting.

The compliance twin of dq_constraint_audit (pipeline5): where the DQ
audit checks referential integrity EXISTS, the erasure cascade
computes what referential integrity IMPLIES when a subject is deleted
— every dependent row, transitively, before any delete runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.registry import query, track_cache

ERASE_MOD = 97  # deterministic erasure subject set: custkey % 97 == 0


@query(
    "gdpr_erasure_cascade",
    oracle=f"""
    WITH subjects AS (
      SELECT c_custkey FROM customer WHERE c_custkey % {ERASE_MOD} = 0
    ),
    del_orders AS (
      SELECT o_orderkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM subjects)
    )
    SELECT 'customer' AS table_name,
           CAST((SELECT COUNT(*) FROM subjects) AS BIGINT) AS n_rows_to_delete
    UNION ALL
    SELECT 'orders',
           CAST((SELECT COUNT(*) FROM del_orders) AS BIGINT)
    UNION ALL
    SELECT 'lineitem',
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders))
                AS BIGINT)
    """,
)
def gdpr_erasure_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure impact accounting: given a subject keyset
    (every {ERASE_MOD}th customer — in production, the DSR queue),
    count the rows each table must delete, CASCADED through the
    foreign-key graph (customer → orders → lineitem) — the dry-run
    report a deletion pipeline emits for sign-off before rewriting
    files, and the row counts an audit log must retain after.

    Shape: each hop is a LEFT SEMI join on the parent's surviving
    keyset — subjects and the doomed-order keyset are dimension-scale
    frames that broadcast, so the lineitem pass is one map-side
    filtered scan; nothing shuffles but three 1-row counts. The
    actual delete at lake scale is the same semi-join driving a
    partition rewrite (merge_upsert_balances / scd2 machinery);
    counting first is what makes the rewrite auditable."""
    subjects = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % ERASE_MOD == 0)
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    # consumed twice (own count + the lineitem hop): persist
    del_orders = orders.join(
        F.broadcast(subjects), orders.o_custkey == subjects.c_custkey, "left_semi"
    ).select("o_orderkey").persist().transform(track_cache)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    del_lines = li.join(
        F.broadcast(del_orders), li.l_orderkey == del_orders.o_orderkey, "left_semi"
    )

    def count_row(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows_to_delete"),
        )

    # lazy union of three 1-row aggregates — no driver-side actions
    return (
        count_row("customer", subjects)
        .unionByName(count_row("orders", del_orders))
        .unionByName(count_row("lineitem", del_lines))
    )
