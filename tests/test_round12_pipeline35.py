"""Round-12: cross-modal dedup capstone + the media admit stage.

The oracle differentials pin the unified clustering and the composed
survivor policy bit-for-bit; these pin what the oracle can't express:
that each per-modality clustering REFINES the unified one, that the
survivor election reconciles per modality and with the registered
media_dedup_survivors policy, and that the composed preference order
(quality, then lossless media, then doc_id) is the one actually
applied."""

import pandas as pd

from go_map_reduce_spark.operators.pipeline34 import (
    AUD_RANK,
    IMG_RANK,
    _rank_col,
    _survivor_agg,
)
from go_map_reduce_spark.operators.pipeline35 import (
    MEDIA_CARRIER_MOD,
    MEDIA_CARRIER_REM,
    MEDIA_VID_REM,
    VID_RANK,
    _carrier_media_frames,
    _crossmodal_labels,
    media_survivor_ids,
)
from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare


def test_crossmodal_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["crossmodal_dedup_survivors"](spark, sf_dir),
        ORACLES["crossmodal_dedup_survivors"],
        sf_dir,
    )


def test_media_admit_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["media_admit_decision"](spark, sf_dir),
        ORACLES["media_admit_decision"],
        sf_dir,
    )


def _members(spark, sf_dir) -> pd.DataFrame:
    """(doc_id, cluster_id) for every doc: labels ∪ singletons."""
    from go_map_reduce_spark.catalog import load_table

    labels = _crossmodal_labels(spark, sf_dir).toPandas()
    docs = load_table(spark, sf_dir, "documents").select("doc_id").toPandas()
    m = docs.merge(labels, on="doc_id", how="left")
    m["cluster_id"] = m["cluster_id"].fillna(m["doc_id"]).astype("int64")
    return m


def test_modality_clusters_refine_unified(spark, sf_dir):
    """Every per-modality cluster (carrier image ahash group, carrier
    audio afp group, carrier video vfp group — r13 — and text
    near-dup component) lands INSIDE exactly one unified cluster —
    refinement, the structural claim that makes 'one cluster graph'
    true."""
    m = _members(spark, sf_dir).set_index("doc_id")["cluster_id"]

    imgc, audc, vidc = _carrier_media_frames(spark, sf_dir)
    for frame, key in ((imgc, "ahash"), (audc, "afp"), (vidc, "vfp")):
        pdf = frame.select("doc_id", key).toPandas()
        pdf["ucl"] = pdf["doc_id"].map(m)
        per_key = pdf.groupby(key)["ucl"].nunique()
        assert (per_key == 1).all(), f"{key} cluster straddles unified"

    txt = QUERIES["dedup_clusters_largestar"](spark, sf_dir).toPandas()
    txt["ucl"] = txt["doc_id"].map(m)
    per_txt = txt.groupby("cluster_id")["ucl"].nunique()
    assert (per_txt == 1).all(), "text component straddles unified"


def test_survivors_reconcile_per_modality(spark, sf_dir):
    """Conservation + absorption accounting: every doc in exactly one
    unified cluster; the per-cluster absorbed-modality counts sum to
    the total number of carrier clusters of that modality; the
    survivor is a member of its own cluster."""
    from go_map_reduce_spark.catalog import load_table

    out = QUERIES["crossmodal_dedup_survivors"](spark, sf_dir).toPandas()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert int(out["n_docs"].sum()) == n_docs
    assert (out["cut_count"] == out["n_docs"] - 1).all()

    imgc, audc, vidc = _carrier_media_frames(spark, sf_dir)
    n_img = imgc.select("ahash").distinct().count()
    n_aud = audc.select("afp").distinct().count()
    n_vid = vidc.select("vfp").distinct().count()
    assert int(out["n_img_clusters"].sum()) == n_img
    assert int(out["n_aud_clusters"].sum()) == n_aud
    assert int(out["n_vid_clusters"].sum()) == n_vid

    m = _members(spark, sf_dir)
    surv = out.merge(
        m,
        left_on=["cluster_id", "survivor_doc_id"],
        right_on=["cluster_id", "doc_id"],
        how="left",
    )
    assert surv["doc_id"].notna().all(), "survivor not a cluster member"


def test_composed_policy_is_quality_then_media_then_id(spark, sf_dir):
    """Recompute the survivor independently in pandas under the stated
    order (n_tokens DESC, image rank, audio rank, video rank, doc_id)
    and demand bit-agreement for every cluster."""
    from go_map_reduce_spark.operators.pipeline33 import (
        audio_fp_frame,
        cc_hashed_frame,
    )
    from go_map_reduce_spark.operators.pipeline35 import video_fp_frame

    out = QUERIES["crossmodal_dedup_survivors"](spark, sf_dir).toPandas()
    m = _members(spark, sf_dir)
    q = (
        QUERIES["text_quality_scores"](spark, sf_dir)
        .select("doc_id", "n_tokens")
        .toPandas()
    )
    img = cc_hashed_frame(spark, sf_dir).select("doc_id", "codec").toPandas()
    aud = audio_fp_frame(spark, sf_dir).select("doc_id", "layout").toPandas()
    vid = (
        video_fp_frame(spark, sf_dir).select("doc_id", "variant").toPandas()
    )
    df = (
        m.merge(q, on="doc_id", how="left")
        .merge(img, on="doc_id")
        .merge(aud, on="doc_id")
        .merge(vid, on="doc_id")
    )
    df["n_tokens"] = df["n_tokens"].fillna(0).astype("int64")
    df["ir"] = df["codec"].map(IMG_RANK)
    df["ar"] = df["layout"].map(AUD_RANK)
    df["vr"] = df["variant"].map(VID_RANK)
    expect = (
        df.sort_values(
            ["cluster_id", "n_tokens", "ir", "ar", "vr", "doc_id"],
            ascending=[True, False, True, True, True, True],
        )
        .groupby("cluster_id")
        .first()
        .reset_index()[["cluster_id", "doc_id"]]
        .rename(columns={"doc_id": "expect_doc"})
    )
    j = out.merge(expect, on="cluster_id")
    assert len(j) == len(out)
    assert (j["survivor_doc_id"] == j["expect_doc"]).all()


def test_media_stage_admits_one_survivor_per_carrier_cluster(spark, sf_dir):
    """The funnel stage's invariants: survivors are carriers; exactly
    one admitted carrier per carrier-populated cluster; every
    non-carrier passes vacuously; and the election IS the registered
    media_dedup_survivors arg-min (recomputed via _survivor_agg)."""
    dec = QUERIES["media_admit_decision"](spark, sf_dir).toPandas()
    carriers = dec[dec["is_carrier"]]
    non = dec[~dec["is_carrier"]]
    assert non["media_ok"].all()
    rem = dec["doc_id"] % MEDIA_CARRIER_MOD
    assert (
        dec["is_carrier"]
        == ((rem == MEDIA_CARRIER_REM) | (rem == MEDIA_VID_REM))
    ).all()

    sv = set(media_survivor_ids(spark, sf_dir).toPandas()["doc_id"])
    assert sv <= set(carriers["doc_id"]), "a survivor is not a carrier"
    admitted = set(carriers[carriers["media_ok"]]["doc_id"])
    assert admitted == sv

    imgc, audc, vidc = _carrier_media_frames(spark, sf_dir)
    n_clusters = (
        imgc.select("ahash").distinct().count()
        + audc.select("afp").distinct().count()
        + vidc.select("vfp").distinct().count()
    )
    assert len(sv) == n_clusters, "must admit exactly one per cluster"

    re_img = _survivor_agg(
        imgc, "ahash", "codec", _rank_col("codec", IMG_RANK)
    ).toPandas()
    re_aud = _survivor_agg(
        audc, "afp", "layout", _rank_col("layout", AUD_RANK)
    ).toPandas()
    re_vid = _survivor_agg(
        vidc, "vfp", "variant", _rank_col("variant", VID_RANK)
    ).toPandas()
    assert (
        set(re_img["survivor_doc_id"])
        | set(re_aud["survivor_doc_id"])
        | set(re_vid["survivor_doc_id"])
        == sv
    )


def test_video_dedup_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["video_perceptual_dedup"](spark, sf_dir),
        ORACLES["video_perceptual_dedup"],
        sf_dir,
    )


def test_video_variants_byte_distinct_but_fingerprint_identical():
    """The tier's reason to exist: four byte-distinct containers (two
    with a DIFFERENT frame count) carry the same content and must
    fingerprint identically; a whole-payload hash collapses nothing."""
    import hashlib
    import struct

    import pandas as pd

    from go_map_reduce_spark.operators.pipeline35 import (
        VPD_RESIDUES,
        _vpd_fingerprint_batch,
        _vpd_synth_batch,
    )

    res = 3
    ids = [res + k * VPD_RESIDUES for k in range(4)]  # one per variant
    synth = pd.concat(list(_vpd_synth_batch(iter([pd.DataFrame({"doc_id": ids})]))))
    assert sorted(synth["variant"]) == sorted(
        ["master", "reencoded", "padded", "reenc_padded"]
    )
    payloads = [bytes(p) for p in synth["payload"]]
    assert len({hashlib.md5(p).hexdigest() for p in payloads}) == 4
    frame_counts = {
        struct.unpack_from("<4sI", p, 0)[1] for p in payloads
    }
    assert frame_counts == {6, 7, 9}, frame_counts

    printed = pd.concat(list(_vpd_fingerprint_batch(iter([synth]))))
    assert printed["vfp"].nunique() == 1, "variants must collapse"
    # and a different residue does NOT collapse into it
    other = pd.concat(
        list(_vpd_synth_batch(iter([pd.DataFrame({"doc_id": [res + 1]})])))
    )
    o_printed = pd.concat(list(_vpd_fingerprint_batch(iter([other]))))
    assert o_printed["vfp"].iloc[0] != printed["vfp"].iloc[0]


def test_video_survivor_act_reconciles(spark, sf_dir):
    """Survivor columns reconcile with the pipeline34 policy: every
    cluster containing a master keeps the lowest-id master; corpus
    conservation holds (sum of group sizes == corpus size)."""
    from go_map_reduce_spark.catalog import load_table

    out = QUERIES["video_perceptual_dedup"](spark, sf_dir).toPandas()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert int(out["group_size"].sum()) == n_docs
    assert (out["cut_count"] == out["group_size"] - 1).all()
    with_master = out[out["n_master"] > 0]
    assert len(with_master) > 0
    assert (with_master["survivor_variant"] == "master").all()
    # the oracle differential pins the full packed (rank, doc_id)
    # ordering; master-wins-wherever-present pins the rank table's
    # direction independently of the oracle's own packing.
    assert (out["n_variants"] >= 1).all()


def test_erasure_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["erasure_derived_stores"](spark, sf_dir),
        ORACLES["erasure_derived_stores"],
        sf_dir,
    )


def test_erasure_ivf_occupancy_reconciles_with_upsert(spark, sf_dir):
    """The 'ivf' rows are the upsert report's occupancy columns in
    reverse: n_before must equal the registered ivf_index_upsert's
    n_standing + n_new cell by cell, and the erased totals must
    account for every erased vector."""
    from go_map_reduce_spark.operators.pipeline15 import ERASE_MOD

    out = QUERIES["erasure_derived_stores"](spark, sf_dir).toPandas()
    ivf = out[out["store"] == "ivf"].copy()
    ivf["cell"] = ivf["key"].astype("int64")
    ups = QUERIES["ivf_index_upsert"](spark, sf_dir).toPandas()
    j = ivf.merge(ups, left_on="cell", right_on="cluster_id", how="outer")
    assert j["cell"].notna().all() and j["cluster_id"].notna().all()
    assert (j["n_before"] == j["n_standing"] + j["n_new"]).all()

    from go_map_reduce_spark.catalog import load_table

    n_vec_erased = (
        load_table(spark, sf_dir, "embeddings")
        .where(f"vec_id % {ERASE_MOD} = 0")
        .count()
    )
    assert int(ivf["n_erased"].sum()) == n_vec_erased
    assert (out["n_after"] == out["n_before"] - out["n_erased"]).all()


def test_erasure_media_stores_account_for_every_erased_doc(spark, sf_dir):
    """Each doc lives in exactly one image and one audio perceptual
    cluster, so each media store's n_erased must sum to the erased doc
    count; text clusters cover only clustered docs, so its sum is
    bounded by it."""
    from go_map_reduce_spark.catalog import load_table
    from go_map_reduce_spark.operators.pipeline15 import ERASE_MOD

    out = QUERIES["erasure_derived_stores"](spark, sf_dir).toPandas()
    n_erased_docs = (
        load_table(spark, sf_dir, "documents")
        .where(f"doc_id % {ERASE_MOD} = 0")
        .count()
    )
    for store in ("image", "audio"):
        got = int(out[out["store"] == store]["n_erased"].sum())
        assert got == n_erased_docs, (store, got, n_erased_docs)
    assert (
        int(out[out["store"] == "text"]["n_erased"].sum()) <= n_erased_docs
    )


def test_erased_keeper_cluster_elects_next_preference(spark, sf_dir):
    """The verdict's edge pin: when a cluster's KEEPER is erased, the
    report elects the next-preference member — recomputed
    independently here from the cluster members minus the erased set —
    and at least one such re-election actually occurs at this sf
    (doc 0 is erased and is the mono lowest-id audio survivor)."""
    from go_map_reduce_spark.operators.pipeline15 import ERASE_MOD
    from go_map_reduce_spark.operators.pipeline33 import (
        audio_fp_frame,
        cc_hashed_frame,
    )

    out = QUERIES["erasure_derived_stores"](spark, sf_dir).toPandas()
    media = out[out["store"].isin(["image", "audio"])].copy()
    erased_keeper = media[
        media["keeper_before"].astype("int64") % ERASE_MOD == 0
    ]
    assert len(erased_keeper) > 0, "no erased-keeper case at this sf"
    assert (
        erased_keeper["keeper_after"] != erased_keeper["keeper_before"]
    ).all()

    frames = {
        "image": (cc_hashed_frame(spark, sf_dir).toPandas(), "ahash",
                  "codec", IMG_RANK),
        "audio": (audio_fp_frame(spark, sf_dir).toPandas(), "afp",
                  "layout", AUD_RANK),
    }
    for _, row in media.iterrows():
        pdf, key, fmt, ranks = frames[row["store"]]
        members = pdf[pdf[key] == row["key"]].copy()
        alive = members[members["doc_id"] % ERASE_MOD != 0]
        if len(alive) == 0:
            assert row["keeper_after"] is None
            continue
        alive = alive.assign(r=alive[fmt].map(ranks)).sort_values(
            ["r", "doc_id"]
        )
        assert int(row["keeper_after"]) == int(alive.iloc[0]["doc_id"]), row


def test_video_sampler_never_decodes_unsampled_interior_frames(monkeypatch):
    """The tier's scale contract, pinned mechanically: decode cost
    scales with frames KEPT. For a padded clip (2 lead + 6 content +
    1 trail) the stage may decode only the trim inspections (2 lead +
    1 trail + the first/last content frames it touches to find the
    bounds) plus the sampled content frames (indices 0, 2, 4) — the
    interior unsampled frames (1, 3) and nothing else."""
    import pandas as pd

    import go_map_reduce_spark.operators.multimodal as mm
    from go_map_reduce_spark.operators.pipeline35 import (
        VPD_RESIDUES,
        _vpd_fingerprint_batch,
        _vpd_synth_batch,
    )

    padded_id = 7 + 2 * VPD_RESIDUES  # variant index 2 = 'padded'
    synth = pd.concat(
        list(_vpd_synth_batch(iter([pd.DataFrame({"doc_id": [padded_id]})])))
    )
    assert synth["variant"].iloc[0] == "padded"

    calls = []
    real = mm.decode_image

    def counting(payload):
        calls.append(len(payload))
        return real(payload)

    monkeypatch.setattr(mm, "decode_image", counting)
    out = pd.concat(list(_vpd_fingerprint_batch(iter([synth]))))
    monkeypatch.undo()

    # 9 frames total; sampled content = 3 (t=0,2,4). Decodes: lead trim
    # walks 2 pads + first content frame (3), trail trim walks 1 pad +
    # last content frame (2), sampling decodes t=0,2,4 (3) — frames 0
    # and 5 may be decoded once by the trim AND once by the sampler
    # (t=0 is sampled; t=5 is not), so the ceiling is 8 < 9, and the
    # interior unsampled frames account for the gap to the naive
    # decode-everything 9 + sampled 3 = 12.
    assert len(out) == 1 and out["vfp"].iloc[0].count("|") == 2
    assert len(calls) == 8, (
        f"decoded {len(calls)} frames — expected exactly the 3 lead-trim"
        " + 2 trail-trim + 3 sampled decodes (and a zero count would"
        " mean the monkeypatch missed the stage's import)"
    )
