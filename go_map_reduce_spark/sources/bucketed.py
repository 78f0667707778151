"""Bucketed tables: shuffle-free co-located joins (SURVEY.md §2c joins row,
the pre-partitioning strategy the pyspark guide calls out).

Writing both join sides bucketed by the join key into the warehouse
(`bucketBy(n, key).sortBy(key).saveAsTable`) lets every later equi-join
or aggregation on that key run with ZERO exchange: each task reads
bucket i of both tables. At 100 TB this converts the nightly fact⋈fact
join from a full shuffle of both tables into a co-located merge — the
single biggest shuffle eliminator Spark offers, at the price of a
one-time bucketed rewrite.

tests/test_bucketed.py asserts the no-Exchange property from the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist df as a bucketed (and bucket-sorted) managed table."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, bucket_col
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_left: str, key_right: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys — Catalyst
    sees matching output partitionings and plans a SortMergeJoin with no
    Exchange on either side. The merge hint declares fact⋈fact intent:
    without it a small-scale run would broadcast instead (legal but it
    bypasses the bucket layout this function exists to exploit)."""
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, left[key_left] == right[key_right])
