"""Transactional streaming admit sink (r10 verdict task 6): the
commit-marker protocol must survive a kill at EVERY point the
append-then-advance sink is vulnerable, with no double-admit and no
divergent twins — exactly-once by construction, pinned by replay.

The critical scenario is "after_seen": decisions renamed into place
AND the seen-set version advanced, marker not yet written — the window
streaming/admit.py's read-side dedup can only adjudicate (the replayed
twins differ in is_seen/admitted).  Under the transactional sink the
retry resolves the standing version from COMMITTED MARKERS, so it
recomputes against the same pre-advance state, overwrites, and
commits: byte-identical decisions, zero twins."""

import os
import tempfile

import pytest

import go_map_reduce_spark.streaming.admit_txn as txn
from go_map_reduce_spark.streaming.admit import (
    N_STREAM_BATCHES,
    _admit_side,
    _write_batch_files,
)
from go_map_reduce_spark.streaming.admit_txn import (
    _committed,
    admit_decisions_txn,
    admit_funnel_txn,
    run_admit_stream_txn,
)


@pytest.fixture(scope="module")
def side(spark, sf_dir):
    return _admit_side(spark, sf_dir)


def _funnel_dict(spark, root):
    return {
        r["batch_id"]: r.asDict()
        for r in admit_funnel_txn(spark, root).collect()
    }


def _run_to_completion(spark, side, root, crash_at=None):
    """Run the availableNow pass; if a crash is injected, swallow the
    failed query and return False (caller restarts)."""
    txn._CRASH_AT = crash_at
    try:
        run_admit_stream_txn(spark, side, root)
        return True
    except Exception as ex:  # StreamingQueryException wrapping the injection
        assert "injected crash" in str(ex), ex
        return False
    finally:
        txn._CRASH_AT = None


def _assert_exactly_once(spark, root, reference):
    """No double-admit, in every observable form: per-key uniqueness,
    one admit per cluster, and funnel identity with the clean run."""
    dec = admit_decisions_txn(spark, root)
    n = dec.count()
    assert n == dec.select("batch_id", "doc_id").distinct().count()
    admits = dec.where("admitted").groupBy("group_id").count()
    assert admits.where("count > 1").count() == 0, "cluster admitted twice"
    assert _funnel_dict(spark, root) == reference


@pytest.fixture(scope="module")
def clean_run(spark, sf_dir, side):
    """Uninterrupted transactional run — the reference state."""
    tmp = tempfile.mkdtemp(prefix="gmrs_txn_clean_")
    _write_batch_files(
        spark,
        sf_dir,
        os.path.join(tmp, "src"),
        range(N_STREAM_BATCHES),
        os.path.join(tmp, "stage"),
    )
    assert _run_to_completion(spark, side, tmp)
    return tmp


def test_clean_run_matches_registered_sink(spark, sf_dir, clean_run):
    """Same dataflow, different durability protocol: the transactional
    funnel must equal the registered streaming_curation_admit's output
    on the same slicing (which the driver gates against the collapsed
    DuckDB recurrence)."""
    from go_map_reduce_spark.registry import QUERIES

    reg = {
        r["batch_id"]: r.asDict()
        for r in QUERIES["streaming_curation_admit"](spark, sf_dir).collect()
    }
    assert _funnel_dict(spark, clean_run) == reg
    assert len(reg) == N_STREAM_BATCHES


@pytest.mark.parametrize("point", ["after_decisions", "after_seen"])
def test_kill_and_replay_is_exactly_once(
    spark, sf_dir, side, clean_run, point
):
    """Kill batch 1 at each vulnerable point, restart on the same
    checkpoint, and pin exactly-once: the 'after_seen' case is the
    kill-between-write-and-advance window the registered sink's dedup
    concedes (decisions AND seen renamed, commit marker absent)."""
    reference = _funnel_dict(spark, clean_run)
    with tempfile.TemporaryDirectory(prefix=f"gmrs_txn_{point}_") as tmp:
        _write_batch_files(
            spark,
            sf_dir,
            os.path.join(tmp, "src"),
            range(N_STREAM_BATCHES),
            os.path.join(tmp, "stage"),
        )
        assert not _run_to_completion(spark, side, tmp, crash_at=(1, point))
        done = _committed(tmp)
        assert 1 not in done, "crashed batch must not be committed"
        assert 0 in done, "pre-crash batch lost"
        if point == "after_seen":
            # The concession window really was entered: the advanced
            # seen dir exists on disk, yet no marker binds it.
            assert os.path.isdir(os.path.join(tmp, "seen", "v2"))
            assert max(done.values()) == 1
        # Restart on the SAME checkpoint: the failed batch replays.
        assert _run_to_completion(spark, side, tmp)
        assert sorted(_committed(tmp)) == list(range(N_STREAM_BATCHES))
        _assert_exactly_once(spark, tmp, reference)


def test_replay_of_committed_batch_is_noop(spark, sf_dir, side, clean_run):
    """Belt-and-braces idempotence: calling the merge again for an
    already-committed batch (a checkpoint-replay shape) changes
    nothing — the marker short-circuits before any write."""
    import pyspark.sql.functions as F

    before = _funnel_dict(spark, clean_run)
    batch1 = spark.read.parquet(
        os.path.join(clean_run, "src", "batch1.parquet")
    )
    mtimes = {
        b: os.stat(os.path.join(clean_run, "decisions", f"b{b}")).st_mtime_ns
        for b in _committed(clean_run)
    }
    txn._merge_txn(spark, side, clean_run, batch1, 1)
    assert _funnel_dict(spark, clean_run) == before
    assert mtimes == {
        b: os.stat(os.path.join(clean_run, "decisions", f"b{b}")).st_mtime_ns
        for b in _committed(clean_run)
    }, "a committed batch dir was rewritten"
