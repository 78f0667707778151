"""Physical data layout: hive-partitioned writes and small-file compaction.

The two layout levers that matter most at 100 TB:

- **partition pruning**: writing fact tables partitioned by a
  low-cardinality predicate column (ingest date, region) turns scans
  with that predicate into directory-listing skips — the plan shows the
  predicate under PartitionFilters and the scan never opens pruned
  files (asserted in tests/test_layout.py).
- **compaction**: streaming/incremental ingest leaves thousands of tiny
  files per partition; each costs a task + open + footer read. Compact
  rewrites a table to ~target-sized files. (Row-group-level clustering /
  Z-ordering is the lakehouse-format extension of the same idea.)
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def _tree_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet table into ceil(size/target) files; returns the
    new file count. Coalesce (not repartition): merging small outputs
    needs no shuffle. Overwrites in place via a staging directory + two
    renames. The swap is NOT atomic: a crash between the renames leaves
    the table only at path + '__compact_old' — that directory is the
    recovery point (rename it back). Staging is created alongside the
    table (same parent dir), so the renames stay on one filesystem."""
    df = spark.read.parquet(path)
    n_files = max(1, math.ceil(_tree_bytes(path) / target_file_bytes))
    staging = path.rstrip("/") + "__compact_staging"
    df.coalesce(n_files).write.mode("overwrite").parquet(staging)
    backup = path.rstrip("/") + "__compact_old"
    os.rename(path, backup)
    os.rename(staging, path)
    import shutil

    shutil.rmtree(backup)
    return n_files


# ---------------------------------------------------------------- Z-order

ZORDER_BITS = 16  # bits kept per dimension (2 dims → 32-bit z-value)


def _interleave_sql(x: str, y: str, bits: int = ZORDER_BITS) -> str:
    """Bit-interleave SQL (x gets even positions, y odd) — valid in both
    DuckDB and Spark SQL. Every term is fully parenthesized: Postgres
    (and DuckDB) give <<, >>, &, | ONE precedence level, left-assoc, so
    an unwrapped `a << 2 | b << 3` parses as `((a << 2) | b) << 3`."""
    terms = []
    for b in range(bits):
        terms.append(f"(((({x}) >> {b}) & 1) << {2 * b})")
        terms.append(f"(((({y}) >> {b}) & 1) << {2 * b + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_value(x, y, bits: int = ZORDER_BITS):
    """Morton/Z-curve value of two non-negative int columns — the
    multi-dimensional clustering key: sorting by it co-locates rows
    close in BOTH dimensions, so parquet row-group min/max stats stay
    tight on each dimension and scans with a predicate on either column
    skip most files. The lakehouse `OPTIMIZE ZORDER BY` primitive,
    computed as a plain codegen expression (32 shift/mask terms — no
    UDF)."""
    from pyspark.sql import functions as F

    acc = F.lit(0).cast("long")
    for b in range(bits):
        acc = acc.bitwiseOR(
            F.shiftleft(F.shiftright(x.cast("long"), b).bitwiseAND(F.lit(1)), 2 * b)
        ).bitwiseOR(
            F.shiftleft(
                F.shiftright(y.cast("long"), b).bitwiseAND(F.lit(1)), 2 * b + 1
            )
        )
    return acc


def _register_zorder_query() -> None:
    from pyspark.sql import functions as F

    from go_map_reduce_spark.catalog import load_table
    from go_map_reduce_spark.registry import query

    # Both dimensions quantized to comparable bit widths before
    # interleaving — with unbalanced widths the wider dimension's high
    # bits dominate the curve and the narrow dimension gets no
    # locality (measured: day spans 12 bits vs custkey's 8 here, and
    # per-file custkey ranges stayed full-width until day was coarsened
    # to 16-day buckets).
    mask = (1 << ZORDER_BITS) - 1
    sql_x = f"(o_custkey & {mask})"
    sql_y = (
        f"((datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))"
        f" >> 4) & {mask})"
    )

    @query(
        "zorder_layout_keys",
        oracle=f"""
        SELECT o_orderkey,
               CAST({_interleave_sql(sql_x, sql_y)} AS BIGINT) AS zval,
               CAST({_interleave_sql(sql_x, sql_y)} >> {ZORDER_BITS}
                    AS BIGINT) AS zbucket
        FROM orders
        """,
    )
    def zorder_layout_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Z-order clustering keys over orders on (customer, 16-day
        date bucket):
        the write-side layout step — `df.repartitionByRange(zbucket)
        .sortWithinPartitions(zval).write...` — that makes BOTH
        per-customer and per-date scans prune row groups. zbucket
        (the z-value's high bits) is the coarse cluster ≈ one output
        file's key range. The z-value is 32 inlined shift/mask terms
        (whole-stage codegen, no UDF); the oracle computes the
        identical interleave in DuckDB."""
        orders = load_table(spark, sf_dir, "orders")
        x = F.col("o_custkey").bitwiseAND(F.lit(mask))
        y = F.shiftright(
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")),
            4,
        ).bitwiseAND(F.lit(mask))
        z = zorder_value(x, y)
        return orders.select(
            "o_orderkey",
            z.alias("zval"),
            F.shiftright(z, ZORDER_BITS).cast("long").alias("zbucket"),
        )

    _ = zorder_layout_keys


_register_zorder_query()


# ------------------------------------------------- dynamic partition pruning

_DPP_CACHE = "/tmp/gmrs_dpp"


def _dpp_paths(sf_dir: str) -> tuple[str, str]:
    base = os.path.join(_DPP_CACHE, os.path.basename(os.path.normpath(sf_dir)))
    return os.path.join(base, "orders_by_year"), os.path.join(base, "years_dim")


def _ensure_dpp_layout(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Materialize orders hive-partitioned by order year plus a tiny
    year-dimension parquet, once per sf_dir (staging + rename so a
    concurrent caller never reads a half-written table)."""
    from pyspark.sql import functions as F

    from go_map_reduce_spark.catalog import load_table

    fact_path, dim_path = _dpp_paths(sf_dir)
    for path, build in (
        (
            fact_path,
            lambda: load_table(spark, sf_dir, "orders")
            .withColumn("o_year", F.year("o_orderdate"))
            .write.partitionBy("o_year"),
        ),
        (
            dim_path,
            lambda: load_table(spark, sf_dir, "orders")
            .select(F.year("o_orderdate").alias("o_year"))
            .distinct()
            .withColumn(
                "segment_flag",
                F.when(F.col("o_year") % 3 == 0, "target").otherwise("other"),
            )
            .coalesce(1)
            .write,
        ),
    ):
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            continue
        staging = path + "__staging"
        build().mode("overwrite").parquet(staging)
        try:
            os.rename(staging, path)
        except OSError:
            import shutil

            shutil.rmtree(staging, ignore_errors=True)  # lost the race
    return fact_path, dim_path


def _register_dpp_query() -> None:
    from pyspark.sql import functions as F

    from go_map_reduce_spark.functions.numeric import dsum, sql_dsum
    from go_map_reduce_spark.registry import query

    @query(
        "dynamic_partition_pruning",
        oracle=f"""
        SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
               COUNT(*) AS n_orders,
               {sql_dsum("o_totalprice")} AS revenue
        FROM orders
        WHERE year(CAST(o_orderdate AS DATE)) % 3 = 0
        GROUP BY 1
        """,
    )
    def dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Dynamic partition pruning: the fact table is hive-partitioned
        by o_year; the selective predicate lives on the DIMENSION
        (segment_flag = 'target'), so static pruning can't help — at
        planning time the fact predicate is unknown. Spark broadcasts
        the filtered dim, REUSES the broadcast as a subquery filter on
        the fact's partition column (`dynamicpruning` in the plan,
        asserted in tests/test_layout.py), and the scan opens only the
        matching year directories. THE mechanism that makes
        star-schema joins over a 100 TB date-partitioned fact read only
        the queried slice. Oracle: the dim is derived (year % 3), so
        the semantics collapse to a plain year filter over raw orders."""
        fact_path, dim_path = _ensure_dpp_layout(spark, sf_dir)
        fact = spark.read.parquet(fact_path)
        dim = spark.read.parquet(dim_path).where(
            F.col("segment_flag") == "target"
        )
        return (
            fact.join(F.broadcast(dim), "o_year")
            .groupBy(F.col("o_year").cast("int").alias("o_year"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                dsum(F.col("o_totalprice")).alias("revenue"),
            )
        )

    _ = dynamic_partition_pruning


_register_dpp_query()
