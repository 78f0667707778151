"""Round-13 composed-transform tier: oracle differentials + the
corpus-shape pins the oracle can't express (byte-distinct payloads,
full-composition collapse, conservation)."""

import hashlib

import pandas as pd

from go_map_reduce_spark.operators.pipeline37 import (
    ACD_RESIDUES,
    ICD_RESIDUES,
    _acd_fingerprint_batch,
    _acd_synth_batch,
    _icd_hash_batch,
    _icd_synth_batch,
)
from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare


def test_audio_composed_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["audio_composed_dedup"](spark, sf_dir),
        ORACLES["audio_composed_dedup"],
        sf_dir,
    )


def test_image_composed_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["image_composed_dedup"](spark, sf_dir),
        ORACLES["image_composed_dedup"],
        sf_dir,
    )


def test_audio_variants_byte_distinct_but_collapse():
    """Four byte-distinct RIFF payloads (three rates, two layouts, two
    amplitudes) with ONE fingerprint; a different residue does not
    join."""
    res = 5
    ids = [res + k * ACD_RESIDUES for k in range(4)]
    synth = pd.concat(
        list(_acd_synth_batch(iter([pd.DataFrame({"doc_id": ids})])))
    )
    assert sorted(synth["variant"]) == sorted(
        ["base", "rs2_stereo", "rs4_loud", "stereo_loud"]
    )
    payloads = [bytes(p) for p in synth["payload"]]
    assert len({hashlib.md5(p).hexdigest() for p in payloads}) == 4
    assert len({len(p) for p in payloads}) >= 3  # three sizes at least
    printed = pd.concat(list(_acd_fingerprint_batch(iter([synth]))))
    assert printed["cfp"].nunique() == 1
    other = pd.concat(
        list(_acd_synth_batch(iter([pd.DataFrame({"doc_id": [res + 1]})])))
    )
    o = pd.concat(list(_acd_fingerprint_batch(iter([other]))))
    assert o["cfp"].iloc[0] != printed["cfp"].iloc[0]


def test_image_variants_byte_distinct_but_collapse():
    """Four byte-distinct payloads (three canvas sizes, three codecs —
    one lossy) with ONE hash; a different residue does not join."""
    res = 7
    ids = [res + k * ICD_RESIDUES for k in range(4)]
    synth = pd.concat(
        list(_icd_synth_batch(iter([pd.DataFrame({"doc_id": ids})])))
    )
    assert sorted(synth["variant"]) == sorted(
        ["base", "up2_png", "up2_jpeg", "up4_jpeg"]
    )
    payloads = [bytes(p) for p in synth["payload"]]
    assert len({hashlib.md5(p).hexdigest() for p in payloads}) == 4
    magics = {p[:2] for p in payloads}
    assert b"BM" in magics and b"\x89P" in magics and b"\xff\xd8" in magics
    hashed = pd.concat(list(_icd_hash_batch(iter([synth]))))
    assert hashed["chash"].nunique() == 1
    other = pd.concat(
        list(_icd_synth_batch(iter([pd.DataFrame({"doc_id": [res + 1]})])))
    )
    o = pd.concat(list(_icd_hash_batch(iter([other]))))
    assert o["chash"].iloc[0] != hashed["chash"].iloc[0]


def test_conservation_and_multiaxis_spread(spark, sf_dir):
    """Every doc lands in exactly one cluster per tier, and wherever a
    residue has all four variant classes present the cluster spans
    them (n_variants == 4) — the multi-axis collapse, corpus-wide."""
    from go_map_reduce_spark.catalog import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    aud = QUERIES["audio_composed_dedup"](spark, sf_dir).toPandas()
    img = QUERIES["image_composed_dedup"](spark, sf_dir).toPandas()
    assert int(aud["group_size"].sum()) == n_docs
    assert int(img["group_size"].sum()) == n_docs
    # at any sf with >= 64 docs every residue x variant cell is hit
    if n_docs >= 64 * 8:
        assert (aud["n_variants"] == 4).all()
        assert (img["n_variants"] == 4).all()
