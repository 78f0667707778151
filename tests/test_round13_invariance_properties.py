"""Round-13 composed-transform invariance, on ARBITRARY content.

The pipeline37 oracles pin the closed-form corpus bit-for-bit; these
pin the algebra itself: the composed fingerprints are invariant under
the FULL transform product for random content — any integer resample
factor x any channel duplication x any amplitude scale for audio, any
integer rescale factor x any codec (including the lossy baseline JPEG
on block-constant content) for images — and the single-axis
fingerprints really do have the blind spots the tier closes."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from go_map_reduce_spark.functions.jpegcodec import encode_jpeg_gray
from go_map_reduce_spark.operators.multimodal import (
    encode_bmp,
    encode_png,
    encode_wav,
)
from go_map_reduce_spark.operators.pipeline33 import (
    _audio_fingerprint_batch,
)
from go_map_reduce_spark.operators.pipeline37 import (
    ACD_BASE_RATE,
    ACD_CONTENT,
    ICD_SIDE,
    _acd_fingerprint_batch,
    _icd_hash_batch,
)

seeds = st.integers(min_value=0, max_value=2**31 - 1)


def _run_stage(stage, payloads, out_col):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(payloads)),
            "variant": ["v"] * len(payloads),
            "payload": payloads,
        }
    )
    out = pd.concat(list(stage(iter([pdf]))), ignore_index=True)
    return list(out[out_col])


def _wav_of(v, k=1, channels=1, amp=1):
    frames = [[amp * int(x)] * channels for x in v for _ in range(k)]
    return encode_wav(channels, ACD_BASE_RATE * k, frames)


@settings(max_examples=25, deadline=None)
@given(
    seed=seeds,
    k=st.sampled_from([2, 3, 4, 5, 8]),
    channels=st.sampled_from([1, 2]),
    amp=st.sampled_from([1, 2, 3]),
)
def test_composed_audio_invariance_arbitrary_content(seed, k, channels, amp):
    """digits(base) == digits(k-fold ZOH x channel-dup x amp-scale)
    for random nonzero content under the FULL composition — including
    the non-power-of-two factors and the triple-axis combinations the
    synthetic corpus doesn't exercise."""
    rng = np.random.default_rng(seed)
    v = rng.integers(-500, 500, size=ACD_CONTENT).astype(np.int64)
    v[v == 0] = 1
    base = _wav_of(v)
    composed = _wav_of(v, k=k, channels=channels, amp=amp)
    assert base != composed
    fps = _run_stage(_acd_fingerprint_batch, [base, composed], "cfp")
    assert fps[0] == fps[1]


@settings(max_examples=10, deadline=None)
@given(seed=seeds)
def test_fixed_frame_fingerprint_misses_composed_audio(seed):
    """The blind spot the tier closes, demonstrated: the pipeline33
    FIXED-frame fingerprint — exact for layout and amplitude alone —
    chops the 2x-resampled clip's frames in half and produces a
    DIFFERENT digit string (while the composed print collapses it)."""
    rng = np.random.default_rng(seed)
    v = rng.integers(-500, 500, size=ACD_CONTENT).astype(np.int64)
    v[v == 0] = 1
    # pipeline33's stage asserts n_frames == 128, so feed it the first
    # 128 frames of the 2x clip — base-time content halved, misaligned.
    up = [int(x) for x in v for _ in range(2)][:ACD_CONTENT]
    base = encode_wav(1, ACD_BASE_RATE, [[int(x)] for x in v])
    up_wav = encode_wav(1, ACD_BASE_RATE, [[x] for x in up])

    def run33(payloads):
        pdf = pd.DataFrame(
            {
                "doc_id": range(len(payloads)),
                "layout": ["mono"] * len(payloads),
                "payload": payloads,
            }
        )
        out = pd.concat(
            list(_audio_fingerprint_batch(iter([pdf]))), ignore_index=True
        )
        return list(out["afp"])

    fixed = run33([base, up_wav])
    assert fixed[0] != fixed[1], "fixed-frame print must miss resample"


def _gray_payload(gray, codec):
    side = len(gray)
    if codec == "jpeg":
        img = bytes(int(v) for row in gray for v in row)
        return encode_jpeg_gray(side, side, img)
    rows = [bytes(b for v in row for b in (int(v),) * 3) for row in gray]
    if codec == "png":
        return encode_png(side, side, rows)
    return encode_bmp(side, side, rows[::-1])


@settings(max_examples=20, deadline=None)
@given(
    seed=seeds,
    k=st.sampled_from([2, 3, 4]),
    base_codec=st.sampled_from(["bmp", "png"]),
    up_codec=st.sampled_from(["bmp", "png", "jpeg"]),
)
def test_composed_image_invariance_block_content(
    seed, k, base_codec, up_codec
):
    """hash(base under codec A) == hash(kxk upsample under codec B)
    for random 8x8-BLOCK-CONSTANT content (the construction under
    which the lossy JPEG branch is bit-exact) — every (k, A, B)
    composition, not just the corpus's three."""
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 203, size=(4, 4)).astype(int)
    gray = blocks.repeat(8, axis=0).repeat(8, axis=1)
    assert gray.shape == (ICD_SIDE, ICD_SIDE)
    up = gray.repeat(k, axis=0).repeat(k, axis=1)
    p_base = _gray_payload(gray, base_codec)
    p_up = _gray_payload(up, up_codec)
    assert p_base != p_up
    hs = _run_stage(_icd_hash_batch, [p_base, p_up], "chash")
    assert hs[0] == hs[1]


@settings(max_examples=20, deadline=None)
@given(seed=seeds, k=st.sampled_from([2, 4]))
def test_composed_image_invariance_arbitrary_content_lossless(seed, k):
    """For ARBITRARY (non-block) content the lossless compositions
    (BMP/PNG x rescale) are still exactly invariant — the JPEG branch
    legitimately isn't, which is exactly why the corpus constrains it
    to block-constant pixels (documented blind spot, not a bug)."""
    rng = np.random.default_rng(seed)
    gray = rng.integers(0, 256, size=(ICD_SIDE, ICD_SIDE)).astype(int)
    up = gray.repeat(k, axis=0).repeat(k, axis=1)
    hs = _run_stage(
        _icd_hash_batch,
        [_gray_payload(gray, "bmp"), _gray_payload(up, "png")],
        "chash",
    )
    assert hs[0] == hs[1]
