"""Property tests (hypothesis) for the round-11 invariance algebra.

The registered oracles pin the CLOSED-FORM synthetic content bit for
bit; these pin the invariance claims for ARBITRARY content — the
difference between "the oracle agrees on this construction" and "the
algebra holds", which the r11 review pass noted was verified only by
hand:

- the end-anchored energy envelope (audio_shift_dedup) is invariant
  under any leading-silence pad, any trailing-silence pad, any prefix
  clip that leaves the window intact, channel duplication, and 2x
  amplitude — for random nonzero int16 content, not just the odd-
  sample closed form;
- the border-trim average hash (image_letterbox_dedup) is invariant
  under any bar geometry for random content with pixels >= 1;
- both raw payloads really change under the transforms (the
  invariance is doing work, not comparing identical bytes).

All stage-function level (pure pandas, no SparkSession) — the same
batch code the Arrow stages execute.
"""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from go_map_reduce_spark.operators.multimodal import encode_png, encode_wav
from go_map_reduce_spark.operators.pipeline34 import (
    ASD_WINDOW,
    _lb_hash_batch,
    _shift_fingerprint_batch,
)

seeds = st.integers(min_value=0, max_value=2**31 - 1)


def _fingerprint_payloads(payloads):
    """Run the registered fingerprint stage on raw WAV payloads."""
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(payloads)),
            "variant": ["v"] * len(payloads),
            "payload": payloads,
        }
    )
    out = pd.concat(
        list(_shift_fingerprint_batch(iter([pdf]))), ignore_index=True
    )
    return list(out["sfp"])


@settings(max_examples=25, deadline=None)
@given(
    seed=seeds,
    lead=st.integers(min_value=0, max_value=37),
    trail=st.integers(min_value=0, max_value=23),
    clip=st.integers(min_value=0, max_value=32),
)
def test_end_anchored_envelope_invariance_arbitrary_content(
    seed, lead, trail, clip
):
    """For RANDOM nonzero int16 content (no closed form), the
    end-anchored fingerprint is identical across: the master, a
    lead/trail-padded copy, a prefix-clipped 2x-amplitude copy, and a
    padded channel-duplicated stereo copy."""
    rng = np.random.RandomState(seed)
    n = ASD_WINDOW + 32  # clip <= 32 always leaves the window intact
    # nonzero samples in [-1000, 1000] \ {0}: the anchor is exact
    v = rng.randint(-1000, 1000, size=n)
    v[v == 0] = 7
    variants = [
        encode_wav(1, 8000, [[int(x)] for x in v]),
        encode_wav(
            1,
            8000,
            [[0]] * lead + [[int(x)] for x in v] + [[0]] * trail,
        ),
        encode_wav(1, 8000, [[2 * int(x)] for x in v[clip:]]),
        encode_wav(
            2, 8000, [[0, 0]] * lead + [[int(x), int(x)] for x in v]
        ),
    ]
    fps = _fingerprint_payloads(variants)
    assert len(set(fps)) == 1, fps
    # the transforms genuinely changed the bytes (when they transform)
    if lead or trail:
        assert variants[1] != variants[0]
    assert variants[2] != variants[0]
    assert variants[3] != variants[0]


def _hash_payloads(payloads):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(payloads)),
            "variant": ["v"] * len(payloads),
            "payload": payloads,
        }
    )
    out = pd.concat(list(_lb_hash_batch(iter([pdf]))), ignore_index=True)
    return list(out["ahash"])


@settings(max_examples=20, deadline=None)
@given(
    seed=seeds,
    top=st.integers(min_value=0, max_value=9),
    bottom=st.integers(min_value=0, max_value=9),
    left=st.integers(min_value=0, max_value=9),
    right=st.integers(min_value=0, max_value=9),
)
def test_border_trim_hash_invariance_arbitrary_content(
    seed, top, bottom, left, right
):
    """For RANDOM 32x32 content with every pixel >= 1, the trimmed
    average hash is identical between the bare image and a copy framed
    by ANY rectangle of zero bars (asymmetric geometries included)."""
    rng = np.random.RandomState(seed)
    gray = rng.randint(1, 256, size=(32, 32), dtype=np.uint8)

    def png_of(canvas):
        rows = [
            bytes(b for v in row for b in (int(v),) * 3) for row in canvas
        ]
        return encode_png(len(canvas[0]), len(canvas), rows)

    bare = png_of(gray.tolist())
    w = 32 + left + right
    framed_rows = (
        [[0] * w] * top
        + [[0] * left + row + [0] * right for row in gray.tolist()]
        + [[0] * w] * bottom
    )
    framed = png_of(framed_rows)
    hashes = _hash_payloads([bare, framed])
    assert hashes[0] == hashes[1]
    if top or bottom or left or right:
        assert bare != framed
