"""Binary-file ingestion: the real multimodal ingest path.

`spark.read.format("binaryFile")` turns a directory of media blobs into
(path, modificationTime, length, content) rows — the distributed analog
of the reference's whole-file map-task input model (one task per file,
mr/coordinator.go assigns whole files), but for opaque bytes instead of
text. From there the `operators.multimodal` mapInPandas stages (decode /
feature-extract) apply unchanged: ingestion and decode compose as two
narrow stages with no shuffle.

Scale notes: binaryFile packs many small files per task (bin-packing by
`spark.sql.files.maxPartitionBytes`), so millions of small media blobs
don't mean millions of tasks; `pathGlobFilter` prunes by extension at
listing time, before any bytes are read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Read a directory of opaque files as (path, length, content) rows."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path).select(
        F.col("path"),
        F.col("length"),
        F.col("content"),
    )


def media_features_from_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Ingest a blob directory and extract byte-level features — the
    ingestion-to-features composition a media pipeline starts with:
    binaryFile scan → mapInPandas feature extraction, zero shuffles."""
    from go_map_reduce_spark.operators.multimodal import _payload_features
    from go_map_reduce_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    files = read_binary_files(spark, path, glob=glob)
    # doc_id := stable hash of the file path (no global counter — a
    # monotonically_increasing_id would differ across retries/listings)
    payloads = files.select(
        F.xxhash64("path").alias("doc_id"), F.col("content").alias("payload")
    )
    return payloads.mapInPandas(
        _payload_features,
        schema="doc_id long, n_bytes long, head_byte long, checksum string",
    )
