"""Table catalog over the driver-provided parquet star schema.

Loads the TESTDATA.md tables (region nation customer supplier part
orders lineitem events documents embeddings) with normalized schemas.
All timestamps surface as TIMESTAMP_NTZ so semantics are wall-clock and
independent of the session timezone (and bit-compatible with the DuckDB
oracle's naive timestamps).

Scale notes: these are plain parquet scans — Catalyst pushes filters and
prunes columns into them (verify with .explain → PushedFilters /
ReadSchema). At 100 TB the same code reads a partitioned table path; no
collect, no driver-side materialization here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.session import ensure_session_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table with schema normalization.

    events.ts arrives as INT64 TIMESTAMP(NANOS) parquet; with
    ``nanosAsLong`` it reads as a long of epoch-nanos, which we rebuild
    into TIMESTAMP_NTZ via timezone-independent arithmetic (epoch-micros
    added to the NTZ epoch — no session-TZ dependence, unlike
    ``timestamp_micros`` which yields LTZ).
    """
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts DIV 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    return df


def ensure_min_parallelism(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Spread a small scan across the cluster before CPU-heavy per-row work.

    A table that fits one parquet row group arrives as ONE partition, so
    an expression-heavy stage (shingling, hashing, regex) would run on a
    single core no matter how wide the cluster is. If (and only if) the
    scan has fewer partitions than the default parallelism, repartition
    up — the shuffle moves just the small input. At 100 TB the scan has
    thousands of splits, the condition is false, and this is a no-op
    (never an unconditional repartition of a big table).
    """
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL surface."""
    for t, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(t)
