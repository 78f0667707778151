"""Round-13: video joins the cross-modal capstone and the funnel's
media stage; erasure reaches the unified clusters.

The oracle differentials (in test_round12_pipeline35) pin the
clustering and elections bit-for-bit; these pin the r12 verdict's
done-conditions the oracle can't express: that re-uploaded video
duplicates are actually UNIFIED with their twins, that the funnel's
media stage really drops video carrier non-survivors, and that an
erased unified keeper re-elects under the composed policy in
reconciliation with the capstone."""

import pandas as pd

from go_map_reduce_spark.operators.pipeline15 import ERASE_MOD
from go_map_reduce_spark.operators.pipeline34 import AUD_RANK, IMG_RANK
from go_map_reduce_spark.operators.pipeline35 import (
    MEDIA_CARRIER_MOD,
    MEDIA_VID_REM,
    VID_RANK,
    _carrier_media_frames,
    _crossmodal_members,
)
from go_map_reduce_spark.registry import QUERIES


def test_video_carrier_duplicates_are_unified(spark, sf_dir):
    """The capstone's new claim: two video carriers whose containers
    are byte-distinct variants of the same clip land in the SAME
    unified cluster, and the capstone's absorption column counts the
    video clusters it swallowed."""
    out = QUERIES["crossmodal_dedup_survivors"](spark, sf_dir).toPandas()
    assert int(out["n_vid_clusters"].sum()) > 0, "no video cluster absorbed"

    _, _, vidc = _carrier_media_frames(spark, sf_dir)
    pdf = vidc.select("doc_id", "variant", "vfp").toPandas()
    multi = pdf.groupby("vfp").filter(
        lambda g: g["variant"].nunique() > 1
    )
    assert len(multi) > 0, "no multi-variant video carrier cluster at sf"

    mem = _crossmodal_members(spark, sf_dir).select(
        "doc_id", "cluster_id"
    ).toPandas()
    j = multi.merge(mem, on="doc_id")
    per_fp = j.groupby("vfp")["cluster_id"].nunique()
    assert (per_fp == 1).all(), "video variants not unified"


def test_funnel_media_stage_drops_video_nonsurvivors(spark, sf_dir):
    """The media stage's video slice is a REAL funnel stage: some
    video carrier fails it (clusters have >1 member), and every
    admitted video carrier is its cluster's survivor."""
    dec = QUERIES["media_admit_decision"](spark, sf_dir).toPandas()
    vid = dec[dec["doc_id"] % MEDIA_CARRIER_MOD == MEDIA_VID_REM]
    assert len(vid) > 0
    assert vid["is_carrier"].all()
    assert not vid["media_ok"].all(), "video stage never drops"
    assert vid["media_ok"].any(), "video stage drops everything"

    _, _, vidc = _carrier_media_frames(spark, sf_dir)
    pdf = vidc.select("doc_id", "variant", "vfp").toPandas()
    pdf["r"] = pdf["variant"].map(VID_RANK)
    expect = set(
        pdf.sort_values(["vfp", "r", "doc_id"])
        .groupby("vfp")
        .first()["doc_id"]
    )
    admitted = set(vid[vid["media_ok"]]["doc_id"])
    assert admitted == expect


def test_erasure_crossmodal_reconciles_with_capstone(spark, sf_dir):
    """The 'crossmodal' store rows ARE the capstone's clusters minus
    the erased set: keeper_before equals the capstone's survivor and
    n_before its n_docs for every affected cluster, and — because
    every document lives in exactly ONE unified cluster — the store's
    n_erased sums to the corpus's full erased-doc count (same for the
    new 'video' store, whose universe also covers every doc)."""
    from go_map_reduce_spark.catalog import load_table

    out = QUERIES["erasure_derived_stores"](spark, sf_dir).toPandas()
    xm = out[out["store"] == "crossmodal"].copy()
    assert len(xm) > 0

    n_erased_docs = (
        load_table(spark, sf_dir, "documents")
        .where(f"doc_id % {ERASE_MOD} = 0")
        .count()
    )
    for store in ("crossmodal", "video"):
        got = int(out[out["store"] == store]["n_erased"].sum())
        assert got == n_erased_docs, (store, got, n_erased_docs)

    cap = QUERIES["crossmodal_dedup_survivors"](spark, sf_dir).toPandas()
    xm["cluster_id"] = xm["key"].astype("int64")
    j = xm.merge(cap, on="cluster_id", how="left")
    assert j["survivor_doc_id"].notna().all()
    assert (
        j["keeper_before"].astype("int64") == j["survivor_doc_id"]
    ).all(), "keeper_before drifted from the capstone survivor"
    assert (j["n_before"] == j["n_docs"]).all()


def test_erased_unified_keeper_reelects_composed(spark, sf_dir):
    """The verdict's edge pin, lifted to the unified tier: at least
    one crossmodal store row has its keeper ERASED, the re-elected
    keeper differs, and every keeper_after is the composed-policy
    arg-min (n_tokens DESC, image/audio/video rank, doc_id) over the
    cluster's surviving members — recomputed independently here in
    pandas from the capstone's own member frame."""
    out = QUERIES["erasure_derived_stores"](spark, sf_dir).toPandas()
    xm = out[out["store"] == "crossmodal"].copy()
    erased_keeper = xm[xm["keeper_before"].astype("int64") % ERASE_MOD == 0]
    assert len(erased_keeper) > 0, "no erased unified keeper at this sf"
    assert (
        erased_keeper["keeper_after"] != erased_keeper["keeper_before"]
    ).all()

    mem = _crossmodal_members(spark, sf_dir).toPandas()
    mem["ir"] = mem["codec"].map(IMG_RANK)
    mem["ar"] = mem["layout"].map(AUD_RANK)
    mem["vr"] = mem["variant"].map(VID_RANK)
    for _, row in xm.iterrows():
        members = mem[mem["cluster_id"] == int(row["key"])]
        alive = members[members["doc_id"] % ERASE_MOD != 0]
        if len(alive) == 0:
            assert pd.isna(row["keeper_after"])
            continue
        best = alive.sort_values(
            ["n_tokens", "ir", "ar", "vr", "doc_id"],
            ascending=[False, True, True, True, True],
        ).iloc[0]
        assert int(row["keeper_after"]) == int(best["doc_id"]), row
