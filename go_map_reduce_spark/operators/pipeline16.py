"""Round-5 addendum: single-pass multi-column table profiling — the
ANALYZE TABLE / data-profiler shape (per-column null fraction,
distinct count, min/max), computed for ALL columns in ONE scan via the
stack-to-long trick instead of a scan per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.registry import query

_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderpriority",
]


@query(
    "orders_column_profile",
    oracle=f"""
    WITH longf AS (
      {" UNION ALL ".join(
          f"SELECT '{c}' AS column_name, CAST({c} AS VARCHAR) AS v FROM orders"
          for c in _PROFILE_COLS
      )}
    )
    SELECT column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(v) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
           min(v) AS min_value,
           max(v) AS max_value
    FROM longf GROUP BY column_name
    """,
)
def orders_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level table profile — the statistics ANALYZE TABLE
    collects and every CBO / data-catalog / expectation-suite
    bootstrap needs: per column, row count, null count, exact distinct
    count, and min/max (string domain, so one schema fits every
    column type). All {len(_PROFILE_COLS)} columns profile in a
    SINGLE scan: the table stacks to (column_name, value) long form
    per row (a per-row array explode — the UNPIVOT shape,
    reshape.unpivot_lineitem_measures) and one grouped aggregate
    computes every column's stats, instead of a scan-per-column loop.
    Values string-cast BEFORE comparison so min/max are the same
    lexicographic domain on both engines (double→string formatting is
    pinned by the shared cast of o_totalprice's %.1f-style values;
    timestamps are excluded from the profile set for exactly that
    formatting-parity reason).

    At 100 TB: one pass, |cols|× row amplification in the exploded
    frame but only (name, value) pairs shuffle, and COUNT(DISTINCT)
    runs per column-group — the approx tier swaps in HLL
    (approx_distinct_sketch / hll_daily_rollup) when exact ndv is
    overkill."""
    orders = load_table(spark, sf_dir, "orders")
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(c).cast("string").alias("v"),
            )
            for c in _PROFILE_COLS
        ]
    )
    longf = orders.select(F.explode(pairs).alias("p")).select(
        "p.column_name", "p.v"
    )
    return longf.groupBy("column_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("v")).alias("n_nulls"),
        F.count_distinct("v").alias("n_distinct"),
        F.min("v").alias("min_value"),
        F.max("v").alias("max_value"),
    )
