"""Custom connector via the Python Data Source API (Spark 4).

The reference's only pluggable ingest is "read files the Go process can
open" (mr/coordinator.go hands file paths to workers); Spark's
equivalent extension point for sources that are NOT files — a service
API, a message queue, a proprietary store — is the DataSource V2
interface, exposed to Python in Spark 4 as `pyspark.sql.datasource`.

This module implements the canonical shape: `partitions()` does the
split planning ON THE DRIVER (cheap metadata only — here arithmetic
ranges; for a real store, shard/segment descriptors), and `read(part)`
runs ON EXECUTORS, each partition fetching/generating its slice
independently. Nothing is materialized driver-side, so parallelism is
the partition count — at 1000 executors you plan 1000+ splits exactly
like a parquet scan plans file splits.

The demo source is deterministic (row i → (i, md5(i), i % GROUPS)), so
the scan is oracle-checkable: DuckDB regenerates the identical rows
from range().
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from go_map_reduce_spark.registry import query

REPLAY_N = 2000
REPLAY_PARTS = 8
REPLAY_GROUPS = 10


class ReplayReader(DataSourceReader):
    """Executor-side reader: one call per InputPartition, generating
    that partition's half-open id range [lo, hi)."""

    def __init__(self, options):
        self.n = int(options.get("n", REPLAY_N))
        self.parts = int(options.get("parts", REPLAY_PARTS))

    def partitions(self):
        per = (self.n + self.parts - 1) // self.parts
        return [
            InputPartition((i * per, min((i + 1) * per, self.n)))
            for i in range(self.parts)
        ]

    def read(self, part):
        lo, hi = part.value
        for i in range(lo, hi):
            yield (i, hashlib.md5(str(i).encode()).hexdigest(), i % REPLAY_GROUPS)


class ReplaySource(DataSource):
    """`spark.read.format("replay")` — deterministic synthetic replay
    log. Options: n (row count), parts (split count)."""

    @classmethod
    def name(cls):
        return "replay"

    def schema(self):
        return "id bigint, h string, grp bigint"

    def reader(self, schema):
        return ReplayReader(self.options)


def register_replay_source(spark: SparkSession) -> None:
    spark.dataSource.register(ReplaySource)


@query(
    "custom_source_scan",
    oracle=f"""
    SELECT CAST(i % {REPLAY_GROUPS} AS BIGINT) AS grp,
           COUNT(*) AS n,
           MIN(md5(CAST(i AS VARCHAR))) AS min_h,
           MAX(md5(CAST(i AS VARCHAR))) AS max_h
    FROM range({REPLAY_N}) t(i)
    GROUP BY 1
    """,
)
def custom_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan through the custom Python DataSource ({REPLAY_PARTS}
    executor-parallel splits, no driver materialization) and aggregate
    per group — the oracle regenerates the same rows from DuckDB's
    range(), so the connector's split planning + executor reads are
    differentially checked end-to-end. `sf_dir` is unused: the source
    is generative (the point is the connector surface, not the
    tables)."""
    register_replay_source(spark)
    df = (
        spark.read.format("replay")
        .option("n", str(REPLAY_N))
        .option("parts", str(REPLAY_PARTS))
        .load()
    )
    return df.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("h").alias("min_h"),
        F.max("h").alias("max_h"),
    )
