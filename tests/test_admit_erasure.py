"""Erasure reaching the streaming admit state (r13 verdict task 5).

The gate pins the audit counts against the closed form; these pin what
the closed form can't see — that the purge really rewrote the on-disk
state, that the subject set is the SAME ERASE_MOD carve-out the batch
cascade uses, and the crash-replay law: a batch file redelivered AFTER
the purge (the at-least-once window) must not resurrect an erased
subject in the decisions artifact nor re-enter a purged cluster into
the seen-set."""

import pytest

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from go_map_reduce_spark.operators.pipeline15 import ERASE_MOD
from go_map_reduce_spark.registry import ORACLES, QUERIES
from go_map_reduce_spark.streaming.admit import (
    N_STREAM_BATCHES,
    _admit_side,
    _latest_seen_version,
    _run_admit_stream,
    _write_batch_files,
)
from go_map_reduce_spark.streaming.admit_erasure import purge_erased_state

from tests.oracle_util import compare


@pytest.mark.slow  # r15: multi-minute marathon; default run deselects (pytest.ini)
def test_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["streaming_admit_erasure_audit"](spark, sf_dir),
        ORACLES["streaming_admit_erasure_audit"],
        sf_dir,
    )


def test_erased_total_reconciles_with_batch_carveout(spark, sf_dir):
    """Σ n_erased over the decision stores == the corpus's ERASE_MOD
    subject count — streaming erasure and the batch cascade
    (gdpr_erasure_cascade / erasure_derived_stores) share ONE subject
    definition."""
    rows = QUERIES["streaming_admit_erasure_audit"](spark, sf_dir).collect()
    dec = [r for r in rows if r["store"] == "decisions"]
    n_subjects = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where((F.col("doc_id") % ERASE_MOD) == 0)
        .count()
    )
    assert sum(r["n_erased"] for r in dec) == n_subjects
    for r in rows:
        assert r["n_after"] == r["n_before"] - r["n_erased"], r


def test_replay_after_purge_cannot_resurrect_erased_state(spark, sf_dir):
    """The crash-replay pin: run the stream, purge, remember the
    erased ids and the purged (dead) clusters, then redeliver an
    already-processed batch file as a fresh arrival and run the stream
    again.  The tombstone filter on the merge's arrival side must keep
    every erased id out of the decisions artifact and every purged
    cluster out of the seen-set — while the redelivered batch's
    SURVIVING docs still process normally (the filter is per-subject,
    not a batch drop)."""
    tmp = tempfile.mkdtemp(prefix="gmrs_erase_replay_")
    try:
        src = os.path.join(tmp, "src")
        _write_batch_files(
            spark,
            sf_dir,
            src,
            list(range(N_STREAM_BATCHES)),
            os.path.join(tmp, "stage"),
        )
        side = _admit_side(spark, sf_dir)
        _run_admit_stream(spark, side, tmp)

        dec_dir = os.path.join(tmp, "decisions")
        raw = spark.read.parquet(dec_dir)
        erased_ids = {
            r["doc_id"]
            for r in raw.where((F.col("doc_id") % ERASE_MOD) == 0)
            .select("doc_id")
            .distinct()
            .collect()
        }
        assert erased_ids, "fixture must contain erasure subjects"
        dead_groups = {
            r["group_id"]
            for r in raw.groupBy("group_id")
            .agg(
                F.max(((F.col("doc_id") % ERASE_MOD) != 0).cast("int")).alias(
                    "alive"
                )
            )
            .where(F.col("alive") == 0)
            .collect()
        }
        assert dead_groups, "fixture must contain an all-erased cluster"
        # captured BEFORE the purge rewrites dec_dir (raw is lazy over
        # the original files)
        n_surviving_before = raw.where(
            (F.col("doc_id") % ERASE_MOD) != 0
        ).count()

        purge_erased_state(spark, tmp)
        seen_root = os.path.join(tmp, "seen")
        v_purged = _latest_seen_version(seen_root)

        # redeliver batch 0 as a NEW file (new name + newer mtime):
        # FileStreamSource treats it as a fresh arrival — the
        # at-least-once window the module docstring documents.
        replay = os.path.join(src, "batch0_replay.parquet")
        shutil.copy(os.path.join(src, "batch0.parquet"), replay)
        os.utime(replay, (1_000_001_000, 1_000_001_000))
        _run_admit_stream(spark, side, tmp)

        post = spark.read.parquet(dec_dir)
        resurrected = post.where(
            F.col("doc_id").isin(*erased_ids)
        ).count()
        assert resurrected == 0, "erased ids re-entered via replay"
        # the replayed batch's surviving docs DID process (new epoch rows)
        assert post.count() > n_surviving_before

        v_now = _latest_seen_version(seen_root)
        assert v_now > v_purged  # the replay advanced the seen-set
        seen_now = {
            r["group_id"]
            for r in spark.read.parquet(
                os.path.join(seen_root, f"v{v_now}")
            ).collect()
        }
        assert not (seen_now & dead_groups), (
            "purged clusters re-entered the seen-set via replay"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
