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
