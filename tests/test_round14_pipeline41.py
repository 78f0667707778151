"""Round-14: training_shard_manifest — the deliverable-artifact
composition (epoch schedule × sequence packing × shard assignment).

The manifest must RECONCILE with the plan tables it composes, not
merely resemble them: per-source token mass equals the epoch
schedule's (hence the waterfill allocation at doc granularity), and
per-epoch sequence counts satisfy the packing tail-waste identity.
The two-level prefix sum (shard-local cumsum + shard-base offsets) is
pinned against a driver-computed global cumsum — the scalable form
must be EXACTLY the serial form, or shard boundaries would corrupt
document offsets at any scale."""

import math

import pytest
from pyspark.sql import functions as F

from go_map_reduce_spark.operators.pipeline41 import (
    doc_start_offsets,
    kept_doc_tokens,
    training_shard_manifest,
)
from go_map_reduce_spark.operators.textstats import PACK_BUDGET
from go_map_reduce_spark.registry import QUERIES


def test_two_level_offsets_equal_global_cumsum(spark):
    """doc_start_offsets' shard-local cumsum + shard-base prefix must
    equal the serial per-source running offset in doc_id order —
    including across shard boundaries (doc_ids straddling multiples of
    PACK_SHARD) and for multi-source interleavings."""
    rows = [
        # (doc_id, source, tok) — doc_ids chosen to straddle the
        # PACK_SHARD=100 boundary and interleave two sources
        (1, "a", 7),
        (99, "a", 11),
        (100, "a", 13),
        (101, "b", 5),
        (205, "a", 17),
        (206, "b", 19),
        (300, "b", 23),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, tok long")
    got = {
        (r["source"], r["doc_id"]): r["start_off"]
        for r in doc_start_offsets(df).collect()
    }
    # serial reference: per-source cumsum in doc_id order
    expect = {}
    for src in {"a", "b"}:
        off = 0
        for did, s, tok in sorted(r for r in rows if r[1] == src):
            expect[(src, did)] = off
            off += tok
    assert got == expect


def test_manifest_token_mass_reconciles_with_schedule(spark, sf_dir):
    """Per source: Σ shard_tokens over the manifest == Σ
    tokens_this_pass over mixture_epoch_schedule — the boundary-doc
    truncation realizes each epoch quota EXACTLY, so the manifest and
    the plan cannot drift by even one document."""
    man = (
        QUERIES["training_shard_manifest"](spark, sf_dir)
        .groupBy("source")
        .agg(F.sum("shard_tokens").alias("t"))
        .collect()
    )
    sched = (
        QUERIES["mixture_epoch_schedule"](spark, sf_dir)
        .groupBy("source")
        .agg(F.sum("tokens_this_pass").alias("t"))
        .collect()
    )
    assert {r["source"]: r["t"] for r in man} == {
        r["source"]: r["t"] for r in sched
    }


def test_manifest_epoch_quota_and_sequence_identity(spark, sf_dir):
    """Per (source, epoch): token mass equals the schedule's quota,
    the occupied sequence span starts at 0, and max(seq_hi)+1 ==
    ceil(quota / PACK_BUDGET) — the packing_efficiency_report
    tail-waste identity (n_seqs·budget − tokens ∈ [0, budget))."""
    man = (
        QUERIES["training_shard_manifest"](spark, sf_dir)
        .groupBy("source", "epoch_idx")
        .agg(
            F.sum("shard_tokens").alias("tokens"),
            F.min("seq_lo").alias("lo"),
            F.max("seq_hi").alias("hi"),
        )
        .collect()
    )
    sched = {
        (r["source"], r["epoch_idx"]): r["tokens_this_pass"]
        for r in QUERIES["mixture_epoch_schedule"](spark, sf_dir).collect()
    }
    seen = set()
    for r in man:
        key = (r["source"], r["epoch_idx"])
        quota = sched[key]
        seen.add(key)
        assert r["tokens"] == quota, key
        assert r["lo"] == 0, key
        assert r["hi"] + 1 == math.ceil(quota / PACK_BUDGET), key
        waste = (r["hi"] + 1) * PACK_BUDGET - quota
        assert 0 <= waste < PACK_BUDGET, key
    # every schedule epoch with a positive quota appears in the manifest
    assert seen == {k for k, q in sched.items() if q > 0}


def test_kept_doc_tokens_aggregates_to_waterfill_input(spark, sf_dir):
    """The doc-level frame must aggregate to EXACTLY the waterfill's
    per-source input (pipeline40.kept_tokens_by_source) — one
    definition of 'kept mass' across plan and manifest."""
    from go_map_reduce_spark.operators.pipeline40 import kept_tokens_by_source

    doc = (
        kept_doc_tokens(spark, sf_dir)
        .groupBy("source")
        .agg(F.sum("tok").alias("tokens_kept"))
        .collect()
    )
    src = kept_tokens_by_source(spark, sf_dir).collect()
    assert {r["source"]: r["tokens_kept"] for r in doc} == {
        r["source"]: r["tokens_kept"] for r in src
    }


def test_manifest_quota_join_is_broadcast(spark, sf_dir):
    """The epochs/quota frame is planning-table sized (≤ #sources ×
    (cap+1) rows) and must ride a broadcast join against the
    corpus-side offsets — a shuffled join here would re-exchange the
    whole corpus on source at 100 TB."""
    plan = (
        training_shard_manifest(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_ivf_compaction_recall_eval_measures_the_tradeoff(spark, sf_dir):
    """Recall across the index rebuild.  Pins: (1) the truth pool is
    exactly N_IVF_QUERIES x IVF_TOP_K (the brute frame covers every
    query — an empty/truncated truth side would silently inflate
    recall); (2) both phases retrieve real quality (floor 0.7 on the
    fixtures); (3) the frozen->compacted gap stays bounded — the
    fixtures show a real, deterministic DIP (tightened cells move true
    neighbors across unprobed boundaries), and this eval existing is
    how an index owner sees it; a gap blowout (> 0.15) would mean the
    compaction broke the index, not just shifted boundaries."""
    from go_map_reduce_spark.operators.kmeans import (
        IVF_TOP_K,
        N_IVF_QUERIES,
    )

    rows = {
        r["phase"]: r
        for r in QUERIES["ivf_compaction_recall_eval"](spark, sf_dir).collect()
    }
    assert set(rows) == {"frozen", "compacted"}
    for r in rows.values():
        assert r["n_truth"] == N_IVF_QUERIES * IVF_TOP_K
        assert 0.7 <= r["recall"] <= 1.0
        assert r["n_hits"] <= r["n_truth"]
    gap = rows["frozen"]["recall"] - rows["compacted"]["recall"]
    assert abs(gap) <= 0.15


def test_compaction_phases_reconcile_with_report(spark, sf_dir):
    """The memoized before/after assignment frames (shared with the
    recall eval) must aggregate to EXACTLY the registered compaction
    report's per-cell populations — one definition of the index
    states."""
    from go_map_reduce_spark.operators.pipeline31 import compaction_phases

    before, after = compaction_phases(spark, sf_dir)
    report = {
        (r["phase"], r["cluster_id"]): r["n_vectors"]
        for r in QUERIES["ivf_index_compaction"](spark, sf_dir).collect()
    }
    for phase, frame in (("before", before), ("after", after)):
        got = {
            (phase, r["cid"]): r["n"]
            for r in frame.groupBy("cid").agg(
                F.count(F.lit(1)).cast("long").alias("n")
            ).collect()
        }
        assert got == {k: v for k, v in report.items() if k[0] == phase}
