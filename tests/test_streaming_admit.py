"""Streaming first-arrival-wins admit: state, order, and restart.

The oracle differential (collapsed recurrence) is the main gate; the
tests here pin what the collapse can't see — that the state machine
really ran sequentially (epoch↔batch bijection in the decisions
artifact), that the funnel telescopes, that a cluster admits in at
most one batch, and that a clean stop + restart from the checkpoint
reaches the same final state as the one-shot run."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from go_map_reduce_spark.registry import ORACLES, QUERIES
from go_map_reduce_spark.streaming.admit import (
    N_STREAM_BATCHES,
    _admit_funnel,
    _admit_side,
    _run_admit_stream,
    _write_batch_files,
)

from tests.oracle_util import compare


def test_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["streaming_curation_admit"](spark, sf_dir),
        ORACLES["streaming_curation_admit"],
        sf_dir,
    )


def _run_full(spark, sf_dir, tmp, batches):
    _write_batch_files(
        spark,
        sf_dir,
        os.path.join(tmp, "src"),
        batches,
        os.path.join(tmp, "stage"),
    )
    _run_admit_stream(spark, _admit_side(spark, sf_dir), tmp)


def test_funnel_telescopes_and_single_admit_per_cluster(spark, sf_dir):
    rows = QUERIES["streaming_curation_admit"](spark, sf_dir).collect()
    assert len(rows) == N_STREAM_BATCHES
    for r in rows:
        assert r["docs_in"] == (
            r["gate_dropped"]
            + r["dedup_dropped"]
            + r["media_dropped"]
            + r["admitted"]
        ), r
        assert r["tokens_admitted"] >= r["admitted"] >= 0, r
    # the media stage really drops carrier non-survivors in the stream
    # (r13) — non-vacuous, not a column of zeros
    assert sum(r["media_dropped"] for r in rows) > 0
    # the whole corpus arrived exactly once
    import pyspark.sql.functions as F  # noqa: F811

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["docs_in"] for r in rows) == n_docs


def test_decisions_ran_sequentially_and_restart_resumes(spark, sf_dir):
    """Drive the stream in two phases over one checkpoint: files for
    batches 0-1, run; then files 2-3 appear, run again.  Pins (a) the
    epoch↔batch bijection — each micro-batch processed exactly one
    source file, oldest mtime first, (b) per-cluster single-admit
    across ALL batches, (c) the two-phase final state equals the
    one-shot run's (restart-resume correctness)."""
    with tempfile.TemporaryDirectory(prefix="gmrs_admit_2p_") as tmp2:
        _run_full(spark, sf_dir, tmp2, [0, 1])
        _run_full(spark, sf_dir, tmp2, [2, 3])
        # the documented read contract: dedup on (batch_id, doc_id)
        # first, so an at-least-once replayed append can't skew reads
        dec = spark.read.parquet(
            os.path.join(tmp2, "decisions")
        ).dropDuplicates(["batch_id", "doc_id"])
        # (a) each epoch saw exactly one batch_id, in batch order
        pairs = sorted(
            (r["epoch"], r["batch_id"])
            for r in dec.select("epoch", "batch_id").distinct().collect()
        )
        assert pairs == [(i, i) for i in range(N_STREAM_BATCHES)], pairs
        # (b) one admit per cluster, ever
        multi = (
            dec.where("admitted")
            .groupBy("group_id")
            .count()
            .where("count > 1")
            .count()
        )
        assert multi == 0
        # an admitted cluster never re-admits after first_seen
        first_seen = dec.groupBy("group_id").agg(
            F.min("batch_id").alias("fb")
        )
        late_admit = (
            dec.where("admitted")
            .join(first_seen, "group_id")
            .where(F.col("batch_id") != F.col("fb"))
            .count()
        )
        assert late_admit == 0
        two_phase = {
            r["batch_id"]: r
            for r in _admit_funnel(
                spark, os.path.join(tmp2, "decisions")
            ).collect()
        }
    # (c) equal to the one-shot registered run
    one_shot = {
        r["batch_id"]: r
        for r in QUERIES["streaming_curation_admit"](spark, sf_dir).collect()
    }
    assert set(two_phase) == set(one_shot)
    for b in one_shot:
        assert two_phase[b].asDict() == one_shot[b].asDict(), b


def test_collapse_law_holds_for_arbitrary_slicing(spark, sf_dir):
    """First-arrival-wins must equal its closed form for ANY
    deterministic batch assignment, not just the registered
    doc_id % 4: slice into 3 batches by the engine's md5-permille
    draw, run the real stream, and compare the per-doc admitted set
    against the collapsed replay (min batch per cluster + keeper rank
    among minimal-batch members + gate + media) computed directly in
    Spark."""
    from pyspark.sql import Window as W

    from go_map_reduce_spark.operators.pipeline26 import permille_draw_col

    batch_col = permille_draw_col(F.col("doc_id")) % 3
    with tempfile.TemporaryDirectory(prefix="gmrs_admit_law_") as tmp:
        _write_batch_files(
            spark,
            sf_dir,
            os.path.join(tmp, "src"),
            [0, 1, 2],
            os.path.join(tmp, "stage"),
            batch_col=batch_col,
        )
        side = _admit_side(spark, sf_dir)
        _run_admit_stream(spark, side, tmp)
        got = {
            r["doc_id"]
            for r in spark.read.parquet(os.path.join(tmp, "decisions"))
            .dropDuplicates(["batch_id", "doc_id"])
            .where("admitted")
            .collect()
        }
    b = side.join(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", batch_col.cast("long").alias("batch_id")),
        "doc_id",
    )
    fb = b.groupBy("group_id").agg(F.min("batch_id").alias("fb"))
    first = b.join(fb, "group_id").where(F.col("batch_id") == F.col("fb"))
    w = W.partitionBy("group_id").orderBy(F.desc("n_tokens"), "doc_id")
    expected = {
        r["doc_id"]
        for r in first.withColumn("rk", F.row_number().over(w))
        .where(F.col("gate_ok") & (F.col("rk") == 1) & F.col("media_ok"))
        .collect()
    }
    assert got == expected


def test_funnel_unchanged_under_replayed_append(spark, sf_dir):
    """At-least-once mitigation (r09 ADVICE): replay one batch's
    decision appends — the common crash point, where the decisions
    landed but the checkpoint (and seen-set version) did not advance,
    so the replayed rows are byte-identical — and pin that
    _admit_funnel's (batch_id, doc_id) dedup keeps every funnel
    number exactly as before the replay."""
    with tempfile.TemporaryDirectory(prefix="gmrs_admit_rp_") as tmp:
        _run_full(spark, sf_dir, tmp, [0, 1])
        dec_dir = os.path.join(tmp, "decisions")
        before = {
            r["batch_id"]: r.asDict()
            for r in _admit_funnel(spark, dec_dir).collect()
        }
        assert before and all(v["docs_in"] > 0 for v in before.values())
        replayed = (
            spark.read.parquet(dec_dir)
            .where("batch_id = 1")
            .localCheckpoint(eager=True)  # break lineage before self-append
        )
        assert replayed.count() > 0
        replayed.write.mode("append").parquet(dec_dir)
        after = {
            r["batch_id"]: r.asDict()
            for r in _admit_funnel(spark, dec_dir).collect()
        }
        assert after == before


def test_divergent_replay_survivor_is_deterministic(spark, sf_dir):
    """r10 ADVICE closure: when a replay straddles a seen-set advance,
    the replayed rows differ in is_seen/admitted from the originals.
    The read-side pick must be DETERMINISTIC and must keep the row
    written when the decision was actually made (admitted=true /
    is_seen=false beats the replay's seen-marked twin), so repeated
    reads of the same decisions dir agree with each other and with the
    pre-divergence funnel."""
    with tempfile.TemporaryDirectory(prefix="gmrs_admit_dv_") as tmp:
        _run_full(spark, sf_dir, tmp, [0, 1])
        dec_dir = os.path.join(tmp, "decisions")
        before = {
            r["batch_id"]: r.asDict()
            for r in _admit_funnel(spark, dec_dir).collect()
        }
        # Forge the divergent replay: batch 1's rows recomputed AFTER
        # the seen-set advance — every cluster now looks seen, so the
        # replayed twins carry is_seen=true / admitted=false.
        divergent = (
            spark.read.parquet(dec_dir)
            .where("batch_id = 1")
            .withColumn("is_seen", F.lit(True))
            .withColumn("admitted", F.lit(False))
            .localCheckpoint(eager=True)
        )
        assert divergent.count() > 0
        divergent.write.mode("append").parquet(dec_dir)
        reads = [
            {
                r["batch_id"]: r.asDict()
                for r in _admit_funnel(spark, dec_dir).collect()
            }
            for _ in range(3)
        ]
        assert reads[0] == reads[1] == reads[2], "read not deterministic"
        assert reads[0] == before, "survivor pick lost the original decision"
