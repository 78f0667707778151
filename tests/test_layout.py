"""Partition-pruning and compaction tests."""

import os

from pyspark.sql import functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.sources.layout import compact, write_partitioned


def test_partition_pruning(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    path = str(tmp_path / "events_by_day")
    write_partitioned(events, path, ["day"])
    assert any(d.startswith("day=") for d in os.listdir(path))

    df = spark.read.parquet(path).where(F.col("day") == "2024-01-02")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "PartitionFilters: [isnotnull(day" in plan
    # the data predicate must appear as a partition filter, not a scan filter
    assert plan.count("2024-01-02") >= 1
    n_all = spark.read.parquet(path).count()
    n_day = df.count()
    assert 0 < n_day < n_all


def test_compaction_reduces_files(spark, sf_dir, tmp_path):
    path = str(tmp_path / "fragmented")
    load_table(spark, sf_dir, "orders").repartition(16).write.parquet(path)
    before = sum(f.endswith(".parquet") for f in os.listdir(path))
    assert before == 16
    n = compact(spark, path, target_file_bytes=1 << 30)
    after = sum(f.endswith(".parquet") for f in os.listdir(path))
    assert after == n == 1
    assert spark.read.parquet(path).count() > 0
