"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched pandas UDFs via mapInPandas.

Pattern (the 100 TB design): media lives as a `binary` column (or an
object-store URI column) beside typed metadata; decode / feature-extract
/ resize / frame-sample run as `mapInPandas` stages — per-partition
Arrow batches into Python, vectorized work, Arrow back. Partitioning is
inherited from the table scan, so media work scales exactly like any
other narrow transformation: no shuffle, executor-local, bounded-memory
batches (spark.sql.execution.arrow.maxRecordsPerBatch).

The image/audio codec libraries are NOT in this container, so the decode
step is explicitly stubbed (`decode_image` raises NotImplementedError
unless PIL appears); the Spark-side plumbing — BinaryType schema, UDF
signature, batch iteration — is real and oracle-tested via a
deterministic byte-level feature extractor.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.registry import query

try:  # codec libs are absent in this environment; gate, don't import-fail
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except Exception:
    HAS_PIL = False


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal table shape: doc_id, a binary payload, and typed
    metadata. Payloads here are the documents' UTF-8 bytes standing in
    for image/audio blobs — the schema and execution path are the real
    thing, the codec is what's faked."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.col("n_chars").alias("n_chars"),
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):
    """Decode a binary payload into an image object.

    STUB: real decode requires PIL/opencv, not present in this
    container. The Spark plumbing calls byte-level feature extraction
    instead (``_payload_features``); swap this in when codecs exist.
    """
    if not HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL; not available in this environment"
        )
    import io

    return Image.open(io.BytesIO(payload))


def _payload_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic byte-level 'feature extractor' (the decode stand-in):
    size, first byte, md5 checksum. Runs per Arrow batch — the exact
    execution shape a real decoder (decode → resize → embed) uses."""
    import hashlib

    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "head_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype(
                    "int64"
                ),
                "checksum": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
            }
        )


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           CAST(CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1))
                     ELSE -1 END AS BIGINT) AS head_byte,
           md5(text) AS checksum
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction through the real multimodal path:
    BinaryType payload → mapInPandas (Arrow batches) → typed features.
    The oracle recomputes the same byte-level features in SQL (payload is
    the UTF-8 encoding of `text`, so octet_length/ascii/md5 agree
    byte-for-byte)."""
    from go_map_reduce_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    media = media_table(spark, sf_dir).select("doc_id", "payload")
    return media.mapInPandas(
        _payload_features,
        schema="doc_id long, n_bytes long, head_byte long, checksum string",
    )
