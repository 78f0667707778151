"""Round-13 incremental cross-modal admit: oracle differential + the
decision-path and cost-model pins the oracle can't express.

The in-batch election (media_dup_batch) is corpus-DEGENERATE on the
synthetic tiers — every perceptual content also exists among standing
carriers — so its mechanics are pinned on a synthetic novel-content
frame through the SAME _media_decisions operator the registered query
composes, and the corpus pin asserts the degeneracy itself (all-false
with a recomputed empty novel set), not a vacuous any()."""

import pandas as pd

from go_map_reduce_spark.operators.pipeline34 import AUD_RANK, IMG_RANK
from go_map_reduce_spark.operators.pipeline35 import VID_RANK
from go_map_reduce_spark.operators.pipeline38 import (
    XM_BATCH_MOD,
    XM_BATCH_REM,
    _all_carrier_fps,
    _media_decisions,
)
from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare


def test_incremental_admit_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["crossmodal_incremental_admit"](spark, sf_dir),
        ORACLES["crossmodal_incremental_admit"],
        sf_dir,
    )


def test_batch_carveout_spans_modalities_and_paths(spark, sf_dir):
    """The reason this tier has its OWN carve-out: the batch must
    contain image, audio AND video carriers plus non-carriers (the
    pipeline20 residue would alias every batch doc onto the
    image/audio carrier slice); the standing-dup and admit paths must
    fire on the corpus."""
    out = QUERIES["crossmodal_incremental_admit"](spark, sf_dir).toPandas()
    assert (out["doc_id"] % XM_BATCH_MOD == XM_BATCH_REM).all()
    assert set(out["modality"]) == {"none", "image", "audio", "video"}
    assert out["admit"].any(), "nothing admitted"
    assert out["media_dup_standing"].any(), "standing-dup path never fired"


def test_corpus_batch_election_degeneracy_is_real(spark, sf_dir):
    """media_dup_batch is all-false on the corpus BECAUSE the novel
    set is empty — recompute it: every batch carrier fingerprint must
    exist among standing carriers (the synthetic tiers use ~11-16
    contents corpus-wide). If a future corpus gains genuinely novel
    batch content, this pin flips and the corpus exercises the
    election for real."""
    out = QUERIES["crossmodal_incremental_admit"](spark, sf_dir).toPandas()
    car = _all_carrier_fps(spark, sf_dir).toPandas()
    is_new = car["doc_id"] % XM_BATCH_MOD == XM_BATCH_REM
    standing = set(
        map(tuple, car[~is_new][["modality", "fp"]].drop_duplicates().values)
    )
    batch = car[is_new]
    novel = [
        (m, f)
        for m, f in zip(batch["modality"], batch["fp"])
        if (m, f) not in standing
    ]
    assert novel == [], "corpus gained novel batch content — update pins"
    assert not out["media_dup_batch"].any()
    # and every batch carrier is therefore standing-rejected
    dec = out.set_index("doc_id")
    assert dec.loc[batch["doc_id"], "media_dup_standing"].all()


def test_no_double_reject_semantics(spark, sf_dir):
    """media_dup_standing and media_dup_batch are mutually exclusive;
    non-carriers never media-reject; admit == none of the reasons."""
    out = QUERIES["crossmodal_incremental_admit"](spark, sf_dir).toPandas()
    assert not (out["media_dup_standing"] & out["media_dup_batch"]).any()
    non = out[out["modality"] == "none"]
    assert len(non) > 0
    assert not non["media_dup_standing"].any()
    assert not non["media_dup_batch"].any()
    expect = ~(
        out["text_dup"] | out["media_dup_standing"] | out["media_dup_batch"]
    )
    assert (out["admit"] == expect).all()


def _decisions(spark, batch_rows, standing_rows) -> pd.DataFrame:
    batchc = spark.createDataFrame(
        batch_rows, "doc_id long, modality string, fp string, rnk long"
    )
    standing = spark.createDataFrame(
        standing_rows or [(None, None)], "modality string, fp string"
    ).where("modality IS NOT NULL")
    return (
        _media_decisions(batchc, standing)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )


def test_synthetic_batch_election_elects_one_keeper(spark):
    """The election mechanics on a NOVEL fingerprint: three batch
    carriers share novel fp 'X' (ranks 2, 0, 1) — the rank-0 member
    wins regardless of doc_id order; the others batch-reject; a
    standing-known fp standing-rejects everyone; a unique novel fp
    admits its only carrier."""
    out = _decisions(
        spark,
        [
            (10, "image", "X", 2),
            (11, "image", "X", 0),
            (12, "image", "X", 1),
            (20, "audio", "Y", 0),
            (21, "audio", "Y", 1),
            (30, "video", "Z", 3),
        ],
        [("audio", "Y")],
    )
    assert not out.loc[11, "media_dup_batch"]  # rank-0 keeper
    assert out.loc[10, "media_dup_batch"] and out.loc[12, "media_dup_batch"]
    assert not out.loc[[10, 11, 12], "media_dup_standing"].any()
    assert out.loc[[20, 21], "media_dup_standing"].all()
    assert not out.loc[[20, 21], "media_dup_batch"].any()
    assert not out.loc[30, "media_dup_standing"]
    assert not out.loc[30, "media_dup_batch"]


def test_synthetic_election_tiebreaks_on_doc_id(spark):
    """Equal ranks: lowest doc_id wins — the packed (rank, doc_id)
    arg-min's low bits."""
    out = _decisions(
        spark,
        [(7, "video", "N", 1), (5, "video", "N", 1), (9, "video", "N", 1)],
        [],
    )
    assert not out.loc[5, "media_dup_batch"]
    assert out.loc[7, "media_dup_batch"] and out.loc[9, "media_dup_batch"]


def test_rank_table_directions():
    """The preference tables the election packs (direction pins)."""
    assert IMG_RANK["png"] < IMG_RANK["jpeg"]
    assert AUD_RANK["mono"] < AUD_RANK["loud"]
    assert VID_RANK["master"] < VID_RANK["padded"]


def test_media_decision_law_on_arbitrary_frames(spark):
    """The election LAW on arbitrary generated frames (not just the
    fixed cases): for every (modality, fp) group — any sizes, any rank
    multisets, any standing overlap — standing-known groups reject all
    members as standing-dups and elect nobody; novel groups reject all
    but exactly one, and the keeper is the (rank, doc_id) lexicographic
    minimum. Deterministic sweep over a seeded grid (hypothesis-style
    law, enumerated so the Spark session isn't re-entered per example)."""
    import itertools
    import random

    rng = random.Random(42)
    batch_rows, standing_rows, expect_keeper = [], [], {}
    doc = 100
    for i, (mod, n, standing) in enumerate(
        itertools.product(["image", "audio", "video"], [1, 2, 4], [0, 1])
    ):
        fp = f"fp{i}"
        members = []
        for _ in range(n):
            members.append((doc, mod, fp, rng.randint(0, 3)))
            doc += 1
        rng.shuffle(members)
        batch_rows.extend(members)
        if standing:
            standing_rows.append((mod, fp))
        else:
            expect_keeper[(mod, fp)] = min(
                (r, d) for d, _, _, r in members
            )[1]
    out = _decisions(spark, batch_rows, standing_rows)
    for d, mod, fp, _ in batch_rows:
        row = out.loc[d]
        if (mod, fp) not in expect_keeper:
            assert row["media_dup_standing"] and not row["media_dup_batch"]
        else:
            assert not row["media_dup_standing"]
            assert row["media_dup_batch"] == (d != expect_keeper[(mod, fp)])
