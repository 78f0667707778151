"""Round-12 second batch: resample/rescale-robust media dedup.

The oracle differentials pin every digit/bit; these pin what they
can't: that the variant payloads are genuinely byte-distinct (and of
different sizes/rates), that the scale-AWARE statistic collapses them
while the fixed-window one provably cannot (the blind spot each tier
closes), and the corpus-wide cluster shape."""

import hashlib

import pandas as pd

from go_map_reduce_spark.operators.pipeline36 import (
    ARS_BASE_RATE,
    ARS_RESIDUES,
    IRS_RESIDUES,
    IRS_SIDE,
    _ars_fingerprint_batch,
    _ars_synth_batch,
    _irs_hash_batch,
    _irs_synth_batch,
)
from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare


def test_resample_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["audio_resample_dedup"](spark, sf_dir),
        ORACLES["audio_resample_dedup"],
        sf_dir,
    )


def test_rescale_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["image_rescale_dedup"](spark, sf_dir),
        ORACLES["image_rescale_dedup"],
        sf_dir,
    )


def _one_per_variant(res: int, residues: int) -> list[int]:
    return [res + k * residues for k in range(3)]


def test_resampled_payloads_byte_distinct_but_fingerprint_identical():
    ids = _one_per_variant(5, ARS_RESIDUES)
    synth = pd.concat(list(_ars_synth_batch(iter([pd.DataFrame({"doc_id": ids})]))))
    payloads = [bytes(p) for p in synth["payload"]]
    assert len({hashlib.md5(p).hexdigest() for p in payloads}) == 3
    assert len({len(p) for p in payloads}) == 3, "three different lengths"

    from go_map_reduce_spark.operators.multimodal import decode_wav

    rates = {decode_wav(p)[0] for p in payloads}
    assert rates == {ARS_BASE_RATE, 2 * ARS_BASE_RATE, 4 * ARS_BASE_RATE}

    printed = pd.concat(list(_ars_fingerprint_batch(iter([synth]))))
    assert printed["rfp"].nunique() == 1, "variants must collapse"
    other = pd.concat(
        list(_ars_synth_batch(iter([pd.DataFrame({"doc_id": [6]})])))
    )
    assert (
        pd.concat(list(_ars_fingerprint_batch(iter([other]))))["rfp"].iloc[0]
        != printed["rfp"].iloc[0]
    )


def test_fixed_frame_fingerprint_cannot_collapse_resample():
    """The blind spot: the pipeline33 FIXED-16-sample-frame digit
    string over the upsampled clip differs from the base clip's —
    rate-awareness is necessary, not just sufficient."""
    import numpy as np

    from go_map_reduce_spark.operators.multimodal import decode_wav
    from go_map_reduce_spark.operators.pipeline33 import AUD_Q
    from go_map_reduce_spark.operators.pipeline36 import ARS_FRAME_LEN

    ids = _one_per_variant(5, ARS_RESIDUES)
    synth = pd.concat(list(_ars_synth_batch(iter([pd.DataFrame({"doc_id": ids})]))))

    def fixed_frame_fp(payload: bytes) -> str:
        _r, ch, n, data = decode_wav(payload)
        v = (
            np.frombuffer(data, dtype="<i2")
            .astype(np.int64)
            .reshape(n, ch)
            .sum(axis=1)
        )
        e = (v * v).reshape(n // ARS_FRAME_LEN, ARS_FRAME_LEN).sum(axis=1)
        total = int(e.sum())
        return "-".join(f"{int(x) * AUD_Q // total:04d}" for x in e)

    fps = {fixed_frame_fp(bytes(p)) for p in synth["payload"]}
    assert len(fps) == 3, "fixed-length frames must FAIL to collapse"


def test_rescaled_payloads_byte_distinct_but_hash_identical():
    ids = _one_per_variant(9, IRS_RESIDUES)
    synth = pd.concat(list(_irs_synth_batch(iter([pd.DataFrame({"doc_id": ids})]))))
    payloads = [bytes(p) for p in synth["payload"]]
    assert len({hashlib.md5(p).hexdigest() for p in payloads}) == 3

    from go_map_reduce_spark.operators.multimodal import decode_image

    sides = {decode_image(p)[0] for p in payloads}
    assert sides == {IRS_SIDE, 2 * IRS_SIDE, 4 * IRS_SIDE}

    hashed = pd.concat(list(_irs_hash_batch(iter([synth]))))
    assert hashed["shash"].nunique() == 1, "variants must collapse"
    other = pd.concat(
        list(_irs_synth_batch(iter([pd.DataFrame({"doc_id": [10]})])))
    )
    assert (
        pd.concat(list(_irs_hash_batch(iter([other]))))["shash"].iloc[0]
        != hashed["shash"].iloc[0]
    )


def test_fixed_cell_hash_cannot_even_compare_across_scales():
    """The blind spot: a fixed 4-px cell grid over the 2x canvas
    yields a 256-bit string — structurally incomparable to the base
    64-bit hash, so scale-awareness is the only way to a shared key."""
    import numpy as np

    from go_map_reduce_spark.operators.multimodal import decode_image

    ids = [9, 9 + IRS_RESIDUES]  # base and up2 of one residue
    synth = pd.concat(list(_irs_synth_batch(iter([pd.DataFrame({"doc_id": ids})]))))

    def fixed_cell_bits(payload: bytes) -> str:
        w, h, _bpp, px = decode_image(payload)
        gray = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)[:, :, 0]
        cells = (
            gray.astype(np.int64)
            .reshape(w // 4, 4, w // 4, 4)
            .sum(axis=(1, 3))
        )
        total = int(gray.astype(np.int64).sum())
        n = (w // 4) ** 2
        bits = n * cells > total
        return "".join("1" if b else "0" for b in bits.ravel())

    lens = {len(fixed_cell_bits(bytes(p))) for p in synth["payload"]}
    assert lens == {64, 256}


def test_cluster_shape(spark, sf_dir):
    """Corpus conservation + full variant span wherever all residue x
    variant combinations exist (they do at both gate SFs: 500 docs
    cover doc_id // 16 in 0..31)."""
    from go_map_reduce_spark.catalog import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    for name, counts in (
        ("audio_resample_dedup", ("n_base", "n_up2", "n_up4")),
        ("image_rescale_dedup", ("n_base", "n_up2", "n_up4")),
    ):
        out = QUERIES[name](spark, sf_dir).toPandas()
        assert int(out["group_size"].sum()) == n_docs
        assert (
            out[list(counts)].sum(axis=1) == out["group_size"]
        ).all()
        assert (out["n_variants"] == 3).all(), name
