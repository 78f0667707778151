"""Transactional sink for the streaming curation admit (r10 verdict
task 6): decisions and seen-set version commit ATOMICALLY, closing the
at-least-once window ``streaming/admit.py`` documents and its
read-side dedup only mitigates.

The registered ``streaming_curation_admit`` appends decisions, then
advances the seen-set version, then lets the checkpoint commit — three
separate durability points.  A crash between any two replays the batch
on restart, and a crash AFTER the seen-set advance replays it against
the advanced state, producing divergent twins (is_seen flipped) that
the funnel's deterministic max_by pick must adjudicate.  This module
removes the window instead of adjudicating it:

- Every per-batch artifact (the decisions parquet dir, the next
  seen-set version dir) is written to a staging path and RENAMED into
  place — the reference's own tmpfile+rename discipline
  (``mr/worker.go:65-94``: reduce output goes to ``ioutil.TempFile``
  then ``os.Rename`` so readers never observe a partial file).
- Neither rename is the commit.  The single atomic commit point is the
  rename of a one-line COMMIT MARKER ``commits/<batch_id>`` recording
  ``(batch_id, seen_version)``.  POSIX rename is atomic, so a marker
  either exists with full content or not at all.
- READERS TRUST ONLY MARKERS: the funnel unions exactly the committed
  batch dirs (no dedup — uniqueness is asserted, not repaired), and
  each micro-batch resolves the standing seen-set version from the
  highest committed marker, never from whatever ``seen/`` dirs exist.

Replay is therefore idempotent by construction: a marker present means
the batch is done (merge() no-ops); a marker absent means every
renamed-but-uncommitted dir is dead weight that the retry overwrites,
and the retry recomputes against the same COMMITTED seen version the
crashed attempt used — byte-identical decisions, no double-admit, no
divergent twins, regardless of where the kill landed.

100 TB shape: identical dataflow to the registered admit (one join
against the standing seen-set on the cluster key + one window over the
batch's own groups per micro-batch); the commit protocol adds two
renames and a marker write per batch — O(1) driver-side metadata, the
same class as a Spark commit-protocol job-commit.  On a real
deployment the marker dir lives in the same durable store as the data
(S3: a PUT of a small object is the atomic point instead of rename).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.streaming.admit import (
    _decide_batch,
    _funnel_agg,
    _next_seen,
)
from go_map_reduce_spark.streaming.windows import _stream_state_partitions

# Test hook: set to ("<batch_id>", "<point>") to raise mid-merge, where
# point is one of "after_decisions" (decisions renamed, seen not) or
# "after_seen" (decisions AND seen renamed, marker not written — the
# exact window the registered sink's read-side dedup concedes).
_CRASH_AT: tuple[int, str] | None = None


class _InjectedCrash(RuntimeError):
    pass


def _maybe_crash(batch_id: int, point: str) -> None:
    if _CRASH_AT is not None and _CRASH_AT == (batch_id, point):
        raise _InjectedCrash(f"injected crash: batch {batch_id} {point}")


def _committed(root: str) -> dict[int, int]:
    """batch_id -> seen_version for every committed batch (markers are
    the only source of truth)."""
    cdir = os.path.join(root, "commits")
    out: dict[int, int] = {}
    if not os.path.isdir(cdir):
        return out
    for n in os.listdir(cdir):
        if n.startswith("."):
            continue  # staging tmpfiles are not commits
        with open(os.path.join(cdir, n), encoding="utf-8") as f:
            rec = json.load(f)
        out[int(rec["batch_id"])] = int(rec["seen_version"])
    return out


def _rename_into_place(staging: str, final: str) -> None:
    """tmpfile+rename discipline (mr/worker.go:65-94): the final path
    appears all-or-nothing.  A final dir left by a crashed UNCOMMITTED
    attempt is dead (readers only trust markers) — clear and replace."""
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(staging, final)


def _write_marker(root: str, batch_id: int, seen_version: int) -> None:
    """THE commit point: write the marker beside its final name, fsync,
    rename.  After this rename the batch's decisions are visible to
    funnels and its seen-set version binds future batches."""
    cdir = os.path.join(root, "commits")
    os.makedirs(cdir, exist_ok=True)
    tmp = os.path.join(cdir, f".tmp_{batch_id}")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"batch_id": batch_id, "seen_version": seen_version}, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, os.path.join(cdir, str(batch_id)))


def _merge_txn(
    spark: SparkSession, side: DataFrame, root: str, batch_df: DataFrame,
    batch_id: int,
) -> None:
    """One micro-batch under the transactional protocol: stage
    decisions, stage the advanced seen-set, then commit both with one
    marker rename.  Idempotent under replay from ANY crash point."""
    done = _committed(root)
    if batch_id in done:
        return  # replay of a committed batch: exactly-once no-op
    v = max(done.values(), default=0)  # committed version, never newer

    seen = (
        spark.read.parquet(os.path.join(root, "seen", f"v{v}"))
        if v > 0
        else None
    )
    # The decision dataflow is admit._decide_batch — SHARED with the
    # registered append sink, so the two sinks cannot drift in
    # semantics; only the durability protocol below differs.  (The
    # registered sink also stamps an `epoch` column for its restart
    # bijection test — read-side provenance, not decision semantics;
    # the protocol here keys on the data's own batch_id instead.)
    d = _decide_batch(side, batch_df, seen)

    dec_stage = os.path.join(root, "decisions", f".staging_{batch_id}")
    d.write.mode("overwrite").parquet(dec_stage)
    _rename_into_place(
        dec_stage, os.path.join(root, "decisions", f"b{batch_id}")
    )
    _maybe_crash(batch_id, "after_decisions")

    marked = _next_seen(
        spark.read.parquet(os.path.join(root, "decisions", f"b{batch_id}"))
        .select("group_id"),
        seen,
    )
    seen_stage = os.path.join(root, "seen", f".staging_v{v + 1}")
    marked.write.mode("overwrite").parquet(seen_stage)
    _rename_into_place(seen_stage, os.path.join(root, "seen", f"v{v + 1}"))
    _maybe_crash(batch_id, "after_seen")

    _write_marker(root, batch_id, v + 1)


def run_admit_stream_txn(
    spark: SparkSession, side: DataFrame, root: str
) -> None:
    """One availableNow pass over ``root/src`` through the
    transactional sink — the drop-in twin of admit._run_admit_stream
    with the commit protocol in place of append-then-advance."""
    stream = (
        spark.readStream.schema("doc_id long, batch_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(root, "src"))
    )

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        # One file per trigger and files carry one batch_id each; bind
        # the protocol to the DATA's batch id, not the stream epoch,
        # so a post-crash restart (fresh epoch numbering on a resumed
        # checkpoint) keys the same work to the same marker.
        first = batch_df.select(F.min("batch_id")).first()
        if first is None or first[0] is None:
            return
        _merge_txn(spark, side, root, batch_df, int(first[0]))

    with _stream_state_partitions(spark, 8):
        q = (
            stream.writeStream.foreachBatch(merge)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            q.stop()


def admit_decisions_txn(spark: SparkSession, root: str) -> DataFrame:
    """Committed decisions ONLY — the union of exactly the batch dirs
    with markers.  No read-side dedup: the protocol guarantees each
    (batch_id, doc_id) appears once, and admit_funnel_txn asserts it."""
    done = sorted(_committed(root))
    paths = [os.path.join(root, "decisions", f"b{b}") for b in done]
    if not paths:
        raise ValueError(f"no committed batches under {root}")
    return spark.read.parquet(*paths)


def admit_funnel_txn(spark: SparkSession, root: str) -> DataFrame:
    """Per-batch funnel over committed decisions (the registered
    funnel's aggregate — admit._funnel_agg, SHARED — minus its
    replay-repair dedup: exactly-once makes repair unnecessary)."""
    return _funnel_agg(admit_decisions_txn(spark, root))
