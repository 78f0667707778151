"""Round-11: media dedup survivors + time-shift-robust audio dedup.

The oracle differentials pin the survivor identity and every envelope
digit; these pin what the oracle can't: that the survivor policy is
the LOSSLESS/master-preferring one (not an accident of input order),
that the act reconciles with the cluster reports it consumes, that
the shifted payloads are genuinely byte-distinct yet
fingerprint-identical, and that the START-anchored pipeline33 profile
really cannot collapse them (the blind spot this tier closes)."""

import pandas as pd

from go_map_reduce_spark.operators.pipeline33 import AUD_Q
from go_map_reduce_spark.operators.pipeline34 import (
    ASD_FRAME_LEN,
    ASD_WINDOW,
    ASD_WINDOW_FRAMES,
    _shift_fingerprint_batch,
    _synth_shift_variant_batch,
)
from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare


def test_survivors_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["media_dedup_survivors"](spark, sf_dir),
        ORACLES["media_dedup_survivors"],
        sf_dir,
    )


def test_shift_dedup_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["audio_shift_dedup"](spark, sf_dir),
        ORACLES["audio_shift_dedup"],
        sf_dir,
    )


# --------------------------------------------------------------------------
# Survivor policy pins
# --------------------------------------------------------------------------


def test_image_survivors_prefer_lossless(spark, sf_dir):
    """The verdict pin: every image survivor is PNG/BMP whenever the
    cluster contains one — and since doc_id mod 48 covers every
    (residue, codec) pair, every cluster here contains PNG, so the
    survivor is ALWAYS the top-preference lossless format."""
    rows = {
        r["cluster_key"]: r
        for r in QUERIES["media_dedup_survivors"](spark, sf_dir)
        .where("media_type = 'image'")
        .collect()
    }
    report = QUERIES["image_cross_codec_dedup"](spark, sf_dir).collect()
    assert rows and len(report) == len(rows)
    for rep in report:
        surv = rows[rep["ahash"]]
        if rep["n_png"] + rep["n_bmp"] > 0:
            assert surv["survivor_format"] in ("png", "bmp"), surv
        if rep["n_png"] > 0:
            assert surv["survivor_format"] == "png", surv
        # reconciliation with the cluster report's per-format counts
        assert surv["group_size"] == rep["group_size"]
        assert surv["cut_count"] == rep["group_size"] - 1
        assert rep[f"n_{surv['survivor_format']}"] > 0
        # the survivor really belongs to its format class
        assert surv["survivor_doc_id"] % 3 == {
            "jpeg": 0,
            "png": 1,
            "bmp": 2,
        }[surv["survivor_format"]]


def test_audio_survivors_prefer_master(spark, sf_dir):
    """Audio sibling: every cluster spans all three layouts at this
    SF, so the survivor is always the untouched mono master — and it
    is the LOWEST mono doc_id of the cluster (deterministic
    tiebreak)."""
    surv = (
        QUERIES["media_dedup_survivors"](spark, sf_dir)
        .where("media_type = 'audio'")
        .collect()
    )
    report = {
        r["afp"]: r for r in QUERIES["audio_layout_dedup"](spark, sf_dir).collect()
    }
    assert surv and len(surv) == len(report)
    for s in surv:
        rep = report[s["cluster_key"]]
        assert s["group_size"] == rep["group_size"]
        assert s["cut_count"] == rep["group_size"] - 1
        if rep["n_mono"] > 0:
            assert s["survivor_format"] == "mono", s
            assert s["survivor_doc_id"] % 3 == 0


def test_cut_list_conserves_corpus(spark, sf_dir):
    """Survivors + cuts account for every document exactly once per
    media tier: sum(group_size) == n_docs and
    sum(cut_count) == n_docs - n_clusters."""
    df = QUERIES["media_dedup_survivors"](spark, sf_dir).toPandas()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    for _, g in df.groupby("media_type"):
        assert int(g["group_size"].sum()) == n_docs
        assert int(g["cut_count"].sum()) == n_docs - len(g)
        assert g["survivor_doc_id"].is_unique


# --------------------------------------------------------------------------
# Shift-invariance pins (stage functions, no cluster)
# --------------------------------------------------------------------------


def _local(doc_ids):
    media = pd.concat(
        list(
            _synth_shift_variant_batch(
                iter([pd.DataFrame({"doc_id": doc_ids})])
            )
        ),
        ignore_index=True,
    )
    fps = pd.concat(
        list(_shift_fingerprint_batch(iter([media]))), ignore_index=True
    )
    return media, fps


def test_shifted_payloads_byte_distinct_but_fingerprint_identical():
    """ids 0/16/32/48 all carry content residue 0 under the four
    variants ((doc_id // 16) % 4 = 0..3): payloads pairwise
    byte-distinct (pad / clip / stereo all change the RIFF data),
    fingerprints identical.  A doc_id % 4 variant key would have been
    coupled to the residue (4 | 16) and never produced this id set —
    the coupling bug this test exists to keep dead."""
    ids = [0, 16, 32, 48]
    media, fps = _local(ids)
    assert list(media["variant"]) == [
        "master",
        "padded",
        "clipped_loud",
        "stereo_padded",
    ]
    payloads = [bytes(p) for p in media["payload"]]
    assert len(set(payloads)) == 4
    assert len(set(fps["sfp"])) == 1


def test_same_variant_pad_lengths_byte_distinct():
    """Two padded copies of the same residue with different per-doc
    pad lengths are byte-distinct (and different sizes) yet collapse
    — the pad length itself carries no identity."""
    ids = [16, 80]  # res 0, both variant 'padded'; pads 7+1=8 and 7+0=7
    media, fps = _local(ids)
    assert set(media["variant"]) == {"padded"}
    p = [bytes(x) for x in media["payload"]]
    assert p[0] != p[1] and len(p[0]) != len(p[1])
    assert fps["sfp"][0] == fps["sfp"][1]


def test_start_anchored_profile_cannot_collapse_the_pad():
    """The blind spot is real: the pipeline33-style START-anchored
    digits (frame energies from sample 0, permille of the same-width
    window's total) computed on the padded payload differ from the
    master's — only the end-anchored window collapses them."""
    import numpy as np

    from go_map_reduce_spark.operators.multimodal import decode_wav

    media, fps = _local([0, 16])  # res 0: master, padded (lead 8)
    assert fps["sfp"][0] == fps["sfp"][1]  # end-anchored: collapsed

    def start_digits(payload):
        _r, ch, n, data = decode_wav(bytes(payload))
        v = (
            np.frombuffer(data, dtype="<i2")
            .astype(np.int64)
            .reshape(n, ch)
            .sum(axis=1)
        )[:ASD_WINDOW]
        e = (v * v).reshape(ASD_WINDOW_FRAMES, ASD_FRAME_LEN).sum(axis=1)
        return tuple(int(x) * AUD_Q // int(e.sum()) for x in e)

    a, b = (start_digits(p) for p in media["payload"])
    assert a != b  # start-anchored: the pad shifts the frames


def test_cluster_shape(spark, sf_dir):
    rows = QUERIES["audio_shift_dedup"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["group_size"] for r in rows) == n_docs
    for r in rows:
        # dense doc_ids cover every (residue, variant) pair mod 64, so
        # every cluster spans all four shift variants — the tier's
        # reason to exist, corpus-wide
        assert r["n_variants"] == 4, r
        assert (
            r["n_master"] + r["n_padded"] + r["n_clipped"] + r["n_stereo"]
            == r["group_size"]
        )


# --------------------------------------------------------------------------
# Letterbox-invariant image dedup pins
# --------------------------------------------------------------------------


def test_letterbox_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["image_letterbox_dedup"](spark, sf_dir),
        ORACLES["image_letterbox_dedup"],
        sf_dir,
    )


def _lb_local(doc_ids):
    from go_map_reduce_spark.operators.pipeline34 import (
        _lb_hash_batch,
        _lb_synth_batch,
    )

    media = pd.concat(
        list(_lb_synth_batch(iter([pd.DataFrame({"doc_id": doc_ids})]))),
        ignore_index=True,
    )
    hashed = pd.concat(
        list(_lb_hash_batch(iter([media]))), ignore_index=True
    )
    return media, hashed


def test_framed_payloads_byte_distinct_but_hash_identical():
    """ids 0/16/32/48 carry content residue 0 under the four framing
    variants: three different canvas shapes, pairwise byte-distinct
    payloads, ONE perceptual hash after the exact border trim."""
    import numpy as np

    from go_map_reduce_spark.operators.multimodal import decode_image

    ids = [0, 16, 32, 48]
    media, hashed = _lb_local(ids)
    assert list(media["variant"]) == [
        "bare",
        "letterbox",
        "pillarbox",
        "framed",
    ]
    payloads = [bytes(p) for p in media["payload"]]
    assert len(set(payloads)) == 4
    dims = {decode_image(p)[:2] for p in payloads}
    assert len(dims) >= 3  # genuinely different canvas shapes
    assert len(set(hashed["ahash"])) == 1


def test_raw_whole_canvas_hash_cannot_collapse_the_bars():
    """The blind spot is real: average-hashing the RAW canvas (no
    trim) of the letterboxed payload disagrees with the bare one —
    the black bars shift every cell boundary and drag the mean."""
    import numpy as np

    from go_map_reduce_spark.operators.multimodal import decode_image

    media, hashed = _lb_local([0, 16])  # res 0: bare, letterbox
    assert hashed["ahash"][0] == hashed["ahash"][1]  # trimmed: collapsed

    def raw_hash(payload):
        w, h, _bpp, px = decode_image(bytes(payload))
        gray = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)[:, :, 0]
        # canvas-relative 8x8 cells (what a trim-less hash would do)
        ch, cw = h // 8, w // 8
        cells = (
            gray[: ch * 8, : cw * 8]
            .astype(np.int64)
            .reshape(8, ch, 8, cw)
            .sum(axis=(1, 3))
        )
        total = int(cells.sum())
        return tuple((64 * cells > total).ravel().tolist())

    a, b = (raw_hash(p) for p in media["payload"])
    assert a != b


def test_letterbox_cluster_shape(spark, sf_dir):
    rows = QUERIES["image_letterbox_dedup"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["group_size"] for r in rows) == n_docs
    for r in rows:
        assert r["n_variants"] == 4, r
        assert (
            r["n_bare"] + r["n_letterbox"] + r["n_pillarbox"] + r["n_framed"]
            == r["group_size"]
        )
    # same residue->hash collision structure as the cross-codec tier
    assert 1 < len(rows) < 16


def test_survivor_pref_overflow_fails_loudly(spark):
    """A doc_id >= 2^40 would corrupt the packed rank*2^40+doc_id
    preference order IDENTICALLY in both engines (the oracle replays
    the same packing), so the hash gate cannot catch it — the runtime
    raise_error guard must (r11 ADVICE)."""
    import pytest

    from go_map_reduce_spark.operators.pipeline34 import (
        _PREF_BASE,
        IMG_RANK,
        _rank_col,
        _survivor_agg,
    )

    frame = spark.createDataFrame(
        [(_PREF_BASE + 7, "png", "h1"), (3, "bmp", "h1")],
        "doc_id long, codec string, ahash string",
    )
    out = _survivor_agg(frame, "ahash", "codec", _rank_col("codec", IMG_RANK))
    with pytest.raises(Exception, match="overflows the packed preference"):
        out.collect()
    # in-range ids keep the registered behavior
    ok = spark.createDataFrame(
        [(_PREF_BASE - 1, "png", "h1"), (3, "bmp", "h1")],
        "doc_id long, codec string, ahash string",
    )
    row = (
        _survivor_agg(ok, "ahash", "codec", _rank_col("codec", IMG_RANK))
        .collect()[0]
    )
    assert row.survivor_doc_id == _PREF_BASE - 1  # png outranks bmp
    assert row.survivor_format == "png"
