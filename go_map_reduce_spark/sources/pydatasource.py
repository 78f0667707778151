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
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

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


# --------------------------------------------------------------------------
# Custom SINK via the Python Data Source writer API — the modern analog
# of the reference's text sink + atomic commit (mr/worker.go writes
# mr-out-* through a temp file + rename so a re-executed task can never
# leave a half-written partition; SURVEY.md §2a F9/F11/F15).
# --------------------------------------------------------------------------

import os  # noqa: E402
import uuid  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceWriter,
    WriterCommitMessage,
)


class KVCommit(WriterCommitMessage):
    """Per-task commit message: (temp path, final name, row count)."""

    def __init__(self, tmp, final, rows):
        self.tmp = tmp
        self.final = final
        self.rows = rows


class KVTextWriter(DataSourceWriter):
    """Task side writes "key<TAB>value" lines to a UNIQUELY-NAMED temp
    file (task retries/speculative copies never collide); the DRIVER
    side commit renames exactly one temp per partition into place and
    writes a _SUCCESS manifest listing the committed files — readers
    that trust the manifest never observe a loser's output. abort()
    removes temps. This is the reference's temp+rename discipline
    (mr/worker.go) and Spark's own FileOutputCommitter v1 contract,
    expressed through the Python writer API."""

    def __init__(self, path, overwrite):
        self.path = path
        self.overwrite = overwrite
        # One id per WRITE JOB (constructed on the driver, shipped in the
        # pickled writer): append-mode part names are namespaced by it so
        # two appends to the same directory never collide.
        self.job_id = uuid.uuid4().hex[:12]

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        attempt = uuid.uuid4().hex[:12]
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".tmp-{pid:05d}-{attempt}")
        final = f"part-{self.job_id}-{pid:05d}.txt"
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(f"{row[0]}\t{row[1]}\n")
                n += 1
        return KVCommit(tmp, final, n)

    def commit(self, messages):
        committed = []
        for m in messages:
            if m is None:
                continue
            os.replace(m.tmp, os.path.join(self.path, m.final))  # atomic
            committed.append((m.final, m.rows))
        manifest = dict(committed)
        success = os.path.join(self.path, "_SUCCESS")
        if self.overwrite:
            # overwrite semantics finish at COMMIT time: once this job's
            # files are in place, drop every part file it didn't write —
            # readers that trust the manifest never see a mixed state,
            # and a pre-commit failure leaves the old data intact.
            for name in os.listdir(self.path):
                if name.startswith("part-") and name not in manifest:
                    os.remove(os.path.join(self.path, name))
        elif os.path.exists(success):
            # append merges the previous manifest (job-id-namespaced
            # names guarantee no collision with this job's files)
            with open(success) as f:
                for line in f:
                    name, rows = line.rstrip("\n").split("\t")
                    manifest.setdefault(name, int(rows))
        with open(success, "w") as f:
            for name in sorted(manifest):
                f.write(f"{name}\t{manifest[name]}\n")

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.tmp):
                os.remove(m.tmp)


class KVTextSink(DataSource):
    """`df.write.format("kvtext").option("path", dir).save()` — a
    two-column (key, value) text sink with manifest commit."""

    @classmethod
    def name(cls):
        return "kvtext"

    def writer(self, schema, overwrite):
        if len(schema.fields) != 2:
            raise ValueError("kvtext sink expects exactly (key, value)")
        path = self.options.get("path")
        if not path:
            raise ValueError("kvtext sink requires .option('path', dir)")
        return KVTextWriter(path, overwrite)


def register_kvtext_sink(spark: SparkSession) -> None:
    spark.dataSource.register(KVTextSink)


# --------------------------------------------------------------------------
# Custom STREAMING source via the Python Data Source stream-reader API —
# the streaming analog of ReplaySource: offset tracking, per-microbatch
# split planning on the driver, executor-side partition reads. This is
# the extension point for "a queue/service Spark has no connector for",
# with exactly-once delivery riding the engine's offset log.
# --------------------------------------------------------------------------

STREAM_N = 1200       # total rows the stream ever emits
# Rows admitted per latestOffset() call (per batch).  r15 (guide §4,
# r14 verdict item 5): each micro-batch costs a full lifecycle —
# driver-side Python offset round-trip, per-partition Python worker
# reads, state-store commit — so the rate limit IS the dominant cost
# knob for a Python streaming source.  600 keeps the multi-batch
# offset protocol demonstrated (2 batches: initialOffset → latestOffset
# advance → commit per batch) at half the lifecycle cost of the old
# 300-row chunk; the result is batch-boundary-independent (integer
# counts/sums, pinned by the oracle).
STREAM_CHUNK = 600
STREAM_PARTS = 4      # executor splits per microbatch


class ReplayStreamReader(DataSourceStreamReader):
    """Offset-based replay: offsets are {"pos": n}; each latestOffset()
    admits the next CHUNK rows (rate limiting lives exactly here in a
    real connector), partitions() splits the admitted range for
    executor-side reads, and commit() is where a real source would ack
    upstream. State is offset-only — a restart resumes from the
    checkpoint's committed offset, nothing else to recover."""

    def __init__(self, options):
        self._n = int(options.get("n", STREAM_N))
        self._chunk = int(options.get("chunk", STREAM_CHUNK))
        self._parts = int(options.get("parts", STREAM_PARTS))
        self._latest = 0

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        self._latest = min(self._latest + self._chunk, self._n)
        return {"pos": self._latest}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["pos"], end["pos"]
        if hi <= lo:
            return [RangePartition(lo, lo)]
        step = max(1, (hi - lo) // self._parts)
        bounds = list(range(lo, hi, step)) + [hi]
        return [
            RangePartition(a, b) for a, b in zip(bounds, bounds[1:])
        ]

    def read(self, part):
        for i in range(part.lo, part.hi):
            yield (i, hashlib.md5(str(i).encode()).hexdigest(), i % REPLAY_GROUPS)

    def commit(self, end: dict) -> None:
        pass


class RangePartition(InputPartition):
    def __init__(self, lo, hi):
        self.lo, self.hi = lo, hi


class ReplayStreamSource(DataSource):
    """Streaming variant of ReplaySource (same row universe)."""

    @classmethod
    def name(cls):
        return "replay_stream"

    def schema(self):
        return "id bigint, h string, grp bigint"

    def streamReader(self, schema):
        return ReplayStreamReader(self.options)


def register_replay_stream_source(spark: SparkSession) -> None:
    spark.dataSource.register(ReplayStreamSource)


@query(
    "stream_source_groups",
    oracle=f"""
    SELECT CAST(i % {REPLAY_GROUPS} AS BIGINT) AS grp,
           COUNT(*) AS n,
           CAST(SUM(i) AS BIGINT) AS id_sum,
           MIN(md5(CAST(i AS VARCHAR))) AS min_h
    FROM range({STREAM_N}) t(i)
    GROUP BY 1
    """,
)
def stream_source_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end streaming ingest through the CUSTOM Python streaming
    source: the engine drives initialOffset → latestOffset →
    partitions → executor read per microbatch ({STREAM_N} rows admitted
    {STREAM_CHUNK} per batch), aggregated in complete mode. The oracle
    regenerates the identical row universe from range() — offset
    planning, split fan-out and batch boundaries cannot change the
    result (integer counts/sums only). `sf_dir` unused (generative
    source)."""
    import uuid as _uuid

    from go_map_reduce_spark.shipping import ensure_package_shipped
    from go_map_reduce_spark.streaming.windows import _stream_state_partitions

    ensure_package_shipped(spark)
    register_replay_stream_source(spark)
    stream = spark.readStream.format("replay_stream").load()
    agg = stream.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("id").cast("long").alias("id_sum"),
        F.min("h").alias("min_h"),
    )
    name = f"streamsrc_{_uuid.uuid4().hex[:12]}"
    with _stream_state_partitions(spark, 8):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(name)
