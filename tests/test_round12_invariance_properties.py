"""Property tests (hypothesis) for the round-12 invariance algebra.

The registered oracles pin the CLOSED-FORM synthetic content bit for
bit; these pin the invariance claims for ARBITRARY content — "the
algebra holds", not merely "the oracle agrees on this construction"
(the r11 property-test discipline, applied to the r12 tiers):

- the RATE-AWARE energy envelope (audio_resample_dedup) is invariant
  under any integer zero-order-hold upsample of random nonzero int16
  content;
- the RESOLUTION-AWARE average hash (image_rescale_dedup) is
  invariant under any integer nearest-neighbor upsample of random
  pixel content;
- the video TEMPORAL trim + sequence fingerprint
  (video_perceptual_dedup) is invariant under any leading/trailing
  black-pad counts and under per-frame re-encoding (BMP vs PNG) of
  random content frames with pixels >= 1;
- the transformed payloads really differ byte-wise (the invariance
  is doing work, not comparing identical bytes).

All stage-function level (pure pandas, no SparkSession) — the same
batch code the Arrow stages execute.
"""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from go_map_reduce_spark.operators.multimodal import (
    encode_bmp,
    encode_png,
    encode_video,
    encode_wav,
)
from go_map_reduce_spark.operators.pipeline35 import (
    VPD_SIDE,
    _vpd_fingerprint_batch,
)
from go_map_reduce_spark.operators.pipeline36 import (
    ARS_BASE_RATE,
    ARS_CONTENT,
    IRS_SIDE,
    _ars_fingerprint_batch,
    _irs_hash_batch,
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


@settings(max_examples=25, deadline=None)
@given(seed=seeds, k=st.sampled_from([2, 3, 4, 5, 8]))
def test_rate_aware_envelope_invariance_arbitrary_content(seed, k):
    """digits(base) == digits(k-fold zero-order-hold upsample) for
    random nonzero content at ANY integer factor, including the
    non-power-of-two ones the synthetic corpus doesn't exercise."""
    rng = np.random.default_rng(seed)
    v = rng.integers(-500, 500, size=ARS_CONTENT).astype(np.int64)
    v[v == 0] = 1  # keep the envelope total nonzero
    base = encode_wav(1, ARS_BASE_RATE, [[int(x)] for x in v])
    up = encode_wav(
        1, ARS_BASE_RATE * k, [[int(x)] for x in v for _ in range(k)]
    )
    assert base != up
    fps = _run_stage(_ars_fingerprint_batch, [base, up], "rfp")
    assert fps[0] == fps[1]


@settings(max_examples=25, deadline=None)
@given(seed=seeds, k=st.sampled_from([2, 3, 4]))
def test_resolution_aware_hash_invariance_arbitrary_content(seed, k):
    """hash(base) == hash(kxk nearest-neighbor upsample) for random
    pixel content at any integer factor."""
    rng = np.random.default_rng(seed)
    gray = rng.integers(0, 256, size=(IRS_SIDE, IRS_SIDE)).astype(int)

    def png_of(g):
        rows = [
            bytes(b for v in row for b in (int(v),) * 3) for row in g
        ]
        return encode_png(len(g[0]), len(g), rows)

    up = gray.repeat(k, axis=0).repeat(k, axis=1)
    p_base, p_up = png_of(gray), png_of(up)
    assert p_base != p_up
    hs = _run_stage(_irs_hash_batch, [p_base, p_up], "shash")
    assert hs[0] == hs[1]


@settings(max_examples=15, deadline=None)
@given(
    seed=seeds,
    lead=st.integers(min_value=0, max_value=5),
    trail=st.integers(min_value=0, max_value=5),
    png=st.booleans(),
)
def test_video_trim_and_reencode_invariance_arbitrary_content(
    seed, lead, trail, png
):
    """The sequence fingerprint of a clip of random content frames
    (pixels >= 1) is invariant under any leading/trailing black-pad
    counts AND under per-frame codec choice (BMP vs PNG) — the two
    transforms video_perceptual_dedup composes."""
    rng = np.random.default_rng(seed)
    frames_gray = [
        rng.integers(1, 256, size=(VPD_SIDE, VPD_SIDE)).astype(int)
        for _ in range(6)
    ]

    def enc(g, use_png):
        rows = [
            bytes(b for v in row for b in (int(v),) * 3) for row in g
        ]
        if use_png:
            return encode_png(VPD_SIDE, VPD_SIDE, rows)
        return encode_bmp(VPD_SIDE, VPD_SIDE, rows[::-1])

    black = np.zeros((VPD_SIDE, VPD_SIDE), dtype=int)
    base = encode_video([enc(g, False) for g in frames_gray])
    padded = encode_video(
        [enc(black, png)] * lead
        + [enc(g, png) for g in frames_gray]
        + [enc(black, png)] * trail
    )
    if lead or trail or png:
        assert base != padded
    fps = _run_stage(_vpd_fingerprint_batch, [base, padded], "vfp")
    assert fps[0] == fps[1]
