"""Round-10: format-invariant image dedup.

The oracle differential pins every hash bit; these pin what it can't:
that cross-codec payloads of the same pixels are genuinely
byte-distinct yet hash-identical (the operator's reason to exist),
that every cluster spans all three formats, and that the synthesis
really produces three different container formats."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from go_map_reduce_spark.operators.pipeline33 import (
    CC_RESIDUES,
    _cc_gray,
    _cross_codec_hash_batch,
    _synth_cross_codec_batch,
)
from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare


def test_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["image_cross_codec_dedup"](spark, sf_dir),
        ORACLES["image_cross_codec_dedup"],
        sf_dir,
    )


def _local_pipeline(doc_ids):
    """Run the two mapInPandas stage functions locally on a plain
    pandas frame — the Arrow batch shape without a cluster."""
    import pandas as pd

    batches = _synth_cross_codec_batch(iter([pd.DataFrame({"doc_id": doc_ids})]))
    media = pd.concat(list(batches), ignore_index=True)
    hashed = pd.concat(
        list(_cross_codec_hash_batch(iter([media]))), ignore_index=True
    )
    return media, hashed


def test_cross_codec_payloads_byte_distinct_but_hash_identical():
    """The verdict pin, stated directly on the stage functions: ids
    0 (jpeg), 16 (png) and 32 (bmp) all carry content residue 0, so
    their payloads must be pairwise byte-distinct (three different
    containers) while their perceptual hashes are identical (same
    pixels up to brightness jitter)."""
    ids = [0, 16, 32]  # res 0; codecs jpeg/png/bmp; jitters 0/2/1
    media, hashed = _local_pipeline(ids)
    payloads = [bytes(p) for p in media["payload"]]
    assert len({p[:2] for p in payloads}) == 3  # three container magics
    assert len(set(payloads)) == 3  # byte-distinct
    assert set(hashed["codec"]) == {"jpeg", "png", "bmp"}
    assert len(set(hashed["ahash"])) == 1  # one perceptual cluster


def test_same_codec_jitter_is_byte_distinct_but_hash_invariant():
    """Within one codec, the brightness jitter makes payloads
    byte-distinct (exact dedup fails) while the exact-integer hash
    cancels the uniform shift algebraically."""
    # same residue AND codec need ids 48 apart (48 = lcm(3, 16)); the
    # pair differs only in jitter when (r//3)%3 != ((r+48)//3)%3
    ids = [6, 54]  # res 6, codec jpeg; jitters (6//3)%3=2, (54//3)%3=0
    media, hashed = _local_pipeline(ids)
    payloads = [bytes(p) for p in media["payload"]]
    assert payloads[0] != payloads[1]
    assert hashed["ahash"][0] == hashed["ahash"][1]
    assert _cc_gray(6)[0][0] != _cc_gray(54)[0][0]  # jitter really moved


def test_every_cluster_spans_all_three_formats(spark, sf_dir):
    """doc_id mod 48 covers every (residue, codec) pair, so at any SF
    with >= 48*k docs per class every perceptual cluster contains all
    three formats and the per-format counts telescope."""
    rows = QUERIES["image_cross_codec_dedup"](spark, sf_dir).collect()
    assert rows
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["group_size"] for r in rows) == n_docs
    for r in rows:
        assert r["n_codecs"] == 3, r
        assert r["n_bmp"] + r["n_png"] + r["n_jpeg"] == r["group_size"], r
    # perceptual grouping is non-trivial: fewer clusters than residues
    # (some residues collide by design) but more than one
    assert 1 < len(rows) < CC_RESIDUES


# --------------------------------------------------------------------------
# Audio cross-layout dedup
# --------------------------------------------------------------------------


def test_audio_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["audio_layout_dedup"](spark, sf_dir),
        ORACLES["audio_layout_dedup"],
        sf_dir,
    )


def _audio_local(doc_ids):
    import pandas as pd

    from go_map_reduce_spark.operators.pipeline33 import (
        _audio_fingerprint_batch,
        _synth_audio_layout_batch,
    )

    media = pd.concat(
        list(
            _synth_audio_layout_batch(
                iter([pd.DataFrame({"doc_id": doc_ids})])
            )
        ),
        ignore_index=True,
    )
    fps = pd.concat(
        list(_audio_fingerprint_batch(iter([media]))), ignore_index=True
    )
    return media, fps


def test_audio_layouts_byte_distinct_but_fingerprint_identical():
    """ids 0 (mono), 16 (stereo), 32 (loud) share waveform residue 0:
    three byte-distinct RIFF payloads, one fingerprint — and the
    invariance is exact, not tolerance-based."""
    media, fps = _audio_local([0, 16, 32])
    payloads = [bytes(p) for p in media["payload"]]
    assert len(set(payloads)) == 3
    assert set(fps["layout"]) == {"mono", "stereo", "loud"}
    assert len(set(fps["afp"])) == 1


def test_audio_every_cluster_spans_all_layouts(spark, sf_dir):
    """doc_id mod 48 covers every (residue, layout) pair; the 16
    waveform residues produce 16 distinct fingerprints (verified at
    design time), each spanning all three layouts."""
    rows = QUERIES["audio_layout_dedup"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["group_size"] for r in rows) == n_docs
    assert len(rows) == 16
    for r in rows:
        assert r["n_layouts"] == 3, r
        assert r["n_mono"] + r["n_stereo"] + r["n_loud"] == r["group_size"]
