"""Round-10: cross-pin of the two incremental-admit policies.

``curation_incremental_admit`` (daily batch vs standing index) and
``streaming_curation_admit`` (first-arrival-wins ingest) model the SAME
morning from two sides.  Run the real stream on the SHARED slicing —
batch 0 = the standing corpus (doc_id % 10 != 7), batch 1 = the daily
batch — and pin that the two policies agree except for the EXACT
characterized divergence: keeper identity inside index-free clusters
(the stream keeps its arrival-order/n_tokens keeper, the batch form
keeps the corpus-wide quality keeper — the concession already pinned
for the batch form in test_round9_pipeline30)."""

import os
import tempfile

import pytest
from pyspark.sql import Window as W, functions as F

from go_map_reduce_spark.operators.pipeline20 import (
    NEW_BATCH_MOD,
    NEW_BATCH_REM,
)
from go_map_reduce_spark.operators.pipeline27 import staged_decisions
from go_map_reduce_spark.operators.pipeline30 import _batch_decisions
from go_map_reduce_spark.streaming.admit import (
    _admit_side,
    _run_admit_stream,
    _write_batch_files,
)


@pytest.fixture(scope="module")
def crosspin(spark, sf_dir):
    """Everything both policies derive from, on the shared slicing:
    the stream's admitted batch-1 docs, the batch form's per-doc
    decisions, and the side frame the stream keeper ranks over."""
    is_batch = (
        (F.col("doc_id") % NEW_BATCH_MOD) == NEW_BATCH_REM
    ).cast("long")
    with tempfile.TemporaryDirectory(prefix="gmrs_crosspin_") as tmp:
        _write_batch_files(
            spark,
            sf_dir,
            os.path.join(tmp, "src"),
            [0, 1],
            os.path.join(tmp, "stage"),
            batch_col=is_batch,
        )
        side = _admit_side(spark, sf_dir)
        _run_admit_stream(spark, side, tmp)
        dec = (
            spark.read.parquet(os.path.join(tmp, "decisions"))
            .dropDuplicates(["batch_id", "doc_id"])
            .collect()
        )
    stream_admitted = {
        r["doc_id"] for r in dec if r["batch_id"] == 1 and r["admitted"]
    }
    batch_rows = {
        r["doc_id"]: r for r in _batch_decisions(spark, sf_dir).collect()
    }
    dedup_ok = {
        r["doc_id"]: r["dedup_ok"]
        for r in staged_decisions(spark, sf_dir).collect()
    }
    # the stream keeper per index-free cluster: rank 1 by (n_tokens
    # desc, doc_id) among the cluster's BATCH members, over the same
    # side frame the stream joined (text_quality_scores n_tokens)
    w = W.partitionBy("group_id").orderBy(F.desc("n_tokens"), "doc_id")
    keepers = {
        r["doc_id"]
        for r in side.where(
            (F.col("doc_id") % NEW_BATCH_MOD) == NEW_BATCH_REM
        )
        .withColumn("rk", F.row_number().over(w))
        .where("rk = 1")
        .collect()
    }
    return stream_admitted, batch_rows, dedup_ok, keepers


def test_stream_side_matches_its_closed_form(spark, sf_dir, crosspin):
    """On this slicing the stream's admitted set has a closed form:
    gate-ok, media-ok batch docs whose cluster has NO standing member
    (the batch form's has_index, derived from the same
    leakage_safe_split groups) and that are their cluster's batch
    keeper.  (Both policies read the same pipeline35 media stage —
    r13.)"""
    stream_admitted, batch_rows, _, keepers = crosspin
    expected = {
        d
        for d, r in batch_rows.items()
        if r["gate_ok"]
        and r["media_ok"]
        and not r["has_index"]
        and d in keepers
    }
    assert stream_admitted == expected


def test_divergence_is_exactly_keeper_identity(spark, sf_dir, crosspin):
    """The two admitted sets agree except where the stream keeper and
    the corpus quality keeper are different documents of the same
    index-free cluster:

    - S \\ B: stream keepers the corpus keep-best did NOT keep
      (dedup_ok False) — admitted by arrival policy, not by quality;
    - B \\ S: corpus keepers that are not their cluster's stream
      keeper (outranked on n_tokens, or the batch form also requires
      no direct index match — which the direct=>has_index pin already
      confines to has_index clusters that neither policy admits).

    Both sides of every divergence are gate-ok docs of index-free
    clusters; nothing else may differ."""
    stream_admitted, batch_rows, dedup_ok, keepers = crosspin
    batch_admitted = {
        d
        for d, r in batch_rows.items()
        if r["gate_ok"] and r["admit_ok"] and r["media_ok"]
    }
    only_stream = stream_admitted - batch_admitted
    only_batch = batch_admitted - stream_admitted
    for d in only_stream:
        r = batch_rows[d]
        assert r["gate_ok"] and r["media_ok"], d
        assert not r["has_index"] and d in keepers, d
        assert not dedup_ok[d] or r["direct_match"], d
    for d in only_batch:
        r = batch_rows[d]
        assert r["gate_ok"] and r["media_ok"], d
        assert not r["has_index"], d
        assert dedup_ok[d] and not r["direct_match"], d
        assert d not in keepers, d  # outranked by the stream keeper
    # and the agreement is the normal case, not vacuous
    agree = stream_admitted & batch_admitted
    assert len(agree) > 0
    assert len(agree) > len(only_stream) + len(only_batch)
