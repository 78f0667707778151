"""Streaming-engine semantics tests: watermark late-data dropping in
append mode, and foreachBatch as an exactly-once-style sink. These test
the *streaming machinery* (multi-batch progression, state eviction),
complementing the oracle-checked single-batch streaming queries."""

import os

import pytest

from pyspark.sql import functions as F, types as T

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("k", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)


BATCHES = [
    # batch 0: on-time data through 12:00 → watermark advances to 11:50
    [("2024-01-01 10:00:00", "a", 1), ("2024-01-01 12:00:00", "b", 2)],
    # batch 1: 13:00 advances the watermark to 12:50; at end of this
    # batch the [10:00,11:00) window (end 11:00 < 11:50) is finalized,
    # EMITTED, and its state evicted
    [("2024-01-01 13:00:00", "b", 4)],
    # batch 2: a 10:05 straggler — state for its window no longer
    # exists; append mode guarantees the finalized window is not
    # re-emitted, so this row vanishes from the output
    [("2024-01-01 10:05:00", "a", 8)],
]


@pytest.fixture()
def two_batch_source(spark, tmp_path):
    """Parquet files read one per micro-batch (maxFilesPerTrigger=1),
    staged so a straggler arrives AFTER its window's state was evicted.
    (Spark's watermark contract is one-sided: late rows may still merge
    into live state; only post-eviction arrivals are guaranteed
    dropped — that's the behavior pinned here.)"""
    src = tmp_path / "stream_src"
    src.mkdir()
    for i, rows in enumerate(BATCHES):
        df = spark.createDataFrame(rows, "ts string, k string, v long").select(
            F.col("ts").cast("timestamp").alias("ts"), "k", "v"
        )
        # one file per batch, deterministic order via file naming
        df.coalesce(1).write.mode("overwrite").parquet(str(src / f"batch{i}"))
    # flatten: file source wants one dir of files; stagger mtimes so the
    # source (which orders and batches files by modification time) sees
    # batch0's file strictly first.
    import shutil
    import time

    flat = tmp_path / "flat"
    flat.mkdir()
    now = time.time()
    n = 0
    for i in range(len(BATCHES)):
        for f in sorted(os.listdir(src / f"batch{i}")):
            if f.endswith(".parquet"):
                dst = flat / f"{i:02d}_{n:02d}.parquet"
                shutil.copy(src / f"batch{i}" / f, dst)
                os.utime(dst, (now - 1000 + i * 100, now - 1000 + i * 100))
                n += 1
    return str(flat)


def test_append_mode_drops_late_data(spark, two_batch_source, tmp_path):
    """With a 10-minute watermark and 1h tumbling windows, the late
    10:05 row arriving after the watermark passed 12:50 must NOT appear:
    the 10:00 window was finalized (emitted when the watermark crossed
    11:00) and its state evicted."""
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(two_batch_source)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "k")
        .agg(F.sum("v").alias("total"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_test")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table("late_test").collect()
    out = {}
    for r in rows:
        out.setdefault((r["window"]["start"].hour, r["k"]), []).append(r["total"])
    # the [10:00,11:00) window was finalized with v=1 before the
    # straggler arrived; it appears exactly once and the v=8 is gone
    assert out.get((10, "a")) == [1]


def test_foreach_batch_sink(spark, two_batch_source, tmp_path):
    """foreachBatch: custom sink receiving (batch_df, epoch_id) — the
    exactly-once pattern (idempotent write keyed by epoch). Each epoch
    lands in its own directory exactly once."""
    out_root = tmp_path / "fb_out"
    out_root.mkdir()

    def sink(batch_df, epoch_id):
        batch_df.write.mode("overwrite").parquet(str(out_root / f"epoch={epoch_id}"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(two_batch_source)
    )
    q = stream.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    epochs = sorted(d for d in os.listdir(out_root) if d.startswith("epoch="))
    assert len(epochs) == len(BATCHES)
    total = spark.read.parquet(str(out_root / "epoch=*")).count()
    assert total == sum(len(b) for b in BATCHES)
