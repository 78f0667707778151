"""Text sources/sinks: the reference's I/O surface on Spark (SURVEY.md §2a F1/F2/F9).

The reference reads whole text files — one (filename, contents) pair per
file (mr/worker.go:54-60) — and writes "key value" lines
(mr/worker.go:151). Its S3 mode (mr/s3.go) round-trips the same bytes
through a bucket; in Spark that is just a path scheme (s3a://) on the
same readers, handled by the Hadoop FS layer, so no separate S3 code
exists here by design.

Intermediate-format parity: the reference materializes its shuffle as
JSON-lines {"Key":…,"Value":…} files (mr/worker.go:76-86). Spark's
internal shuffle replaces that wholesale, but `read_kv_json` /
`write_kv_json` speak the format at the boundary so data produced by the
reference can be ingested directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

KV_SCHEMA = T.StructType(
    [
        T.StructField("Key", T.StringType()),
        T.StructField("Value", T.StringType()),
    ]
)


def whole_text_files(spark: SparkSession, path: str) -> DataFrame:
    """One row per file: (filename, content) — the reference's map-task
    input shape (mr/worker.go:54-60; files never split,
    mr/coordinator.go:74-78). Built on wholeTextFiles, so each file is
    one task — matching the reference's semantic corner exactly."""
    rdd = spark.sparkContext.wholeTextFiles(path)
    return spark.createDataFrame(rdd, schema="filename string, content string")


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """One row per line with provenance: (file, line). The scalable text
    scan (files split at block boundaries) — what the reference cannot
    do (SURVEY.md §4: input splitting ABSENT)."""
    return (
        spark.read.text(path)
        .select(F.input_file_name().alias("file"), F.col("value").alias("line"))
    )


def read_kv_json(spark: SparkSession, path: str) -> DataFrame:
    """Read the reference's intermediate JSON-lines KV format
    (mr/worker.go:76: {"Key":"…","Value":"…"} one object per line) into
    (key, value). Explicit schema — no inference pass."""
    return (
        spark.read.schema(KV_SCHEMA)
        .json(path)
        .select(F.col("Key").alias("key"), F.col("Value").alias("value"))
    )


def write_kv_json(df: DataFrame, path: str, n_buckets: int | None = None) -> None:
    """Write (key, value) as the reference's intermediate format,
    optionally hash-partitioned into n_buckets files like mr-X-Y
    bucketing (mr/worker.go:72-81; Murmur3 in FNV's role)."""
    out = df.select(F.col("key").alias("Key"), F.col("value").alias("Value"))
    if n_buckets is not None:
        out = out.repartition(n_buckets, "Key")
    out.write.mode("overwrite").json(path)


def write_kv_text(df: DataFrame, path: str) -> None:
    """The reference's final-output sink: one '"key value"' line per row
    (mr/worker.go:151, mrsequential.go:80-81)."""
    df.select(F.concat_ws(" ", "key", "value")).write.mode("overwrite").text(path)
