"""Incrementally-maintained materialized view via foreachBatch.

The lakehouse pattern: a streaming query maintains a persistent
aggregate table (the MV) by merging each micro-batch's delta — instead
of recomputing the aggregate from scratch per batch (what a naive
batch-recompute pipeline does over 100 TB). foreachBatch is the escape
hatch Structured Streaming provides for sinks with merge semantics the
built-ins lack (JDBC upsert, Delta MERGE INTO; here: versioned parquet
swap, the dependency-free equivalent).

Determinism: the merged measure is COUNT + integer-cents SUM — both
additive and order-free — so the final MV is identical no matter how
the source is split into micro-batches (asserted in
tests/test_multimodal_streaming.py by comparing against the one-shot
batch oracle).

At scale each merge is O(|MV| + |delta|) with both sides hash-keyed on
user_id; a lakehouse table format turns the version-swap into a
transactional MERGE with file-level pruning, same dataflow.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.registry import query
from go_map_reduce_spark.session import ensure_session_confs
from go_map_reduce_spark.streaming.windows import (
    _stream_state_partitions,
    events_raw_schema,
)

N_SPLITS = 4  # micro-batches the source is split into (one file each)


@query(
    "events_incremental_mv",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100
             AS sum_value
    FROM events
    GROUP BY user_id
    """,
)
def events_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user totals maintained INCREMENTALLY: the events table is
    split into N files, streamed one file per micro-batch
    (maxFilesPerTrigger=1), and each batch's per-user delta is merged
    into a versioned parquet MV by foreachBatch. Returns the final MV —
    the oracle is the one-shot batch aggregate, so the gate proves
    batch-split-invariant incremental maintenance."""
    ensure_session_confs(spark)
    tmp = tempfile.mkdtemp(prefix="gmrs_incr_mv_")
    try:
        src_dir = os.path.join(tmp, "src")
        mv_root = os.path.join(tmp, "mv")
        schema = events_raw_schema(spark, sf_dir)
        raw = (
            spark.read.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        raw.repartition(N_SPLITS).write.parquet(src_dir)

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        version = {"v": 0}

        def merge(batch_df: DataFrame, epoch_id: int) -> None:
            delta = batch_df.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
            )
            if version["v"] > 0:
                cur = spark.read.parquet(os.path.join(mv_root, f"v{version['v']}"))
                delta = (
                    cur.unionByName(delta)
                    .groupBy("user_id")
                    .agg(
                        F.sum("n_events").alias("n_events"),
                        F.sum("cents").alias("cents"),
                    )
                )
            version["v"] += 1
            delta.write.mode("overwrite").parquet(
                os.path.join(mv_root, f"v{version['v']}")
            )

        with _stream_state_partitions(spark, 8):
            q = (
                stream.writeStream.foreachBatch(merge)
                .trigger(availableNow=True)
                .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                .start()
            )
            try:
                q.awaitTermination()
            finally:
                q.stop()

        final = spark.read.parquet(os.path.join(mv_root, f"v{version['v']}"))
        # materialize before the temp dir disappears
        out = final.select(
            "user_id",
            "n_events",
            (F.col("cents").cast("double") / 100).alias("sum_value"),
        ).localCheckpoint(eager=True)
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
