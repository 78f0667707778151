"""Property tests (hypothesis) for the pure-Python codec tiers.

The fixed-seed unit tests pin known shapes; these drive the codecs
with generated dimensions and content, the way the reference's
property-style fuzz discipline would:

- PNG round-trip is BIT-EXACT for any 8-bit RGB image (lossless codec).
- Baseline JPEG round-trip is within 1 of the source everywhere with
  the all-ones quant table (float-DCT rounding is the only loss).
- JPEG DC-only images (per-8x8-block constant) round-trip EXACTLY —
  the invariant the multimodal_jpeg_decode oracle is built on.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from go_map_reduce_spark.functions.jpegcodec import (
    decode_jpeg_gray,
    encode_jpeg_gray,
)
from go_map_reduce_spark.operators.multimodal import decode_png, encode_png

dims = st.integers(min_value=1, max_value=24)
seeds = st.integers(min_value=0, max_value=2**31 - 1)


@settings(max_examples=30, deadline=None)
@given(w=dims, h=dims, seed=seeds)
def test_png_roundtrip_bit_exact(w, h, seed):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w * 3), dtype=np.uint8)
    rows = [img[y].tobytes() for y in range(h)]
    gw, gh, bpp, px = decode_png(encode_png(w, h, rows))
    assert (gw, gh, bpp) == (w, h, 24)
    assert px == b"".join(rows)


@settings(max_examples=30, deadline=None)
@given(w=dims, h=dims, seed=seeds)
def test_jpeg_roundtrip_within_dct_rounding(w, h, seed):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
    gw, gh, bpp, px = decode_jpeg_gray(encode_jpeg_gray(w, h, a.tobytes()))
    assert (gw, gh, bpp) == (w, h, 8)
    b = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


@settings(max_examples=30, deadline=None)
@given(
    bw=st.integers(min_value=1, max_value=4),
    bh=st.integers(min_value=1, max_value=4),
    seed=seeds,
)
def test_jpeg_block_constant_roundtrip_exact(bw, bh, seed):
    rng = np.random.RandomState(seed)
    vals = rng.randint(0, 256, size=(bh, bw), dtype=np.uint8)
    a = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    w, h = bw * 8, bh * 8
    _gw, _gh, _bpp, px = decode_jpeg_gray(encode_jpeg_gray(w, h, a.tobytes()))
    assert px == a.tobytes()


@settings(max_examples=20, deadline=None)
@given(w=dims, h=dims, seed=seeds)
def test_jpeg_420_constant_color_roundtrip_exact(w, h, seed):
    """4:2:0 property: on a solid-color image the 2x2 chroma averaging
    is the identity, so the subsampled layout round-trips within the
    same ±1 bound as 4:4:4 (one integer rounding in each direction of
    the YCbCr conversion) — subsampling itself adds NO error."""
    from go_map_reduce_spark.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg_color_420,
    )

    rng = np.random.RandomState(seed)
    color = rng.randint(0, 256, size=3)
    a = np.empty((h, w, 3), dtype=np.uint8)
    a[:] = color
    gw, gh, bpp, px = decode_jpeg(encode_jpeg_color_420(w, h, a.tobytes()))
    assert (gw, gh, bpp) == (w, h, 24)
    b = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
    # and every pixel decodes IDENTICALLY (constant in → constant out)
    assert (b == b[0, 0]).all()


@settings(max_examples=25, deadline=None)
@given(w=dims, h=dims, seed=seeds)
def test_bmp_roundtrip_bit_exact(w, h, seed):
    """BMP is uncompressed: any 24-bit image round-trips bit-exactly
    through encode_bmp/decode_bmp under generated dimensions (odd
    widths exercise the row-padding strip)."""
    from go_map_reduce_spark.operators.multimodal import decode_bmp, encode_bmp

    rng = np.random.RandomState(seed)
    rows = [rng.randint(0, 256, size=w * 3).astype(np.uint8).tobytes() for _ in range(h)]
    gw, gh, bpp, px = decode_bmp(encode_bmp(w, h, rows))
    assert (gw, gh, bpp) == (w, h, 24)
    assert px == b"".join(rows)


@settings(max_examples=25, deadline=None)
@given(
    channels=st.integers(min_value=1, max_value=4),
    n_frames=st.integers(min_value=0, max_value=64),
    seed=seeds,
)
def test_wav_roundtrip_bit_exact(channels, n_frames, seed):
    """RIFF/PCM-16 is lossless: interleaved frames round-trip exactly
    for any channel count and length, including the empty stream."""
    from go_map_reduce_spark.operators.multimodal import (
        WAV_RATE,
        decode_wav,
        encode_wav,
    )

    rng = np.random.RandomState(seed)
    frames = [
        [int(v) for v in rng.randint(-32768, 32768, size=channels)]
        for _ in range(n_frames)
    ]
    rate, ch, nf, body = decode_wav(encode_wav(channels, WAV_RATE, frames))
    assert (rate, ch, nf) == (WAV_RATE, channels, n_frames)
    import struct

    got = [
        list(struct.unpack_from(f"<{channels}h", body, i * channels * 2))
        for i in range(n_frames)
    ]
    assert got == frames


@settings(max_examples=25, deadline=None)
@given(w=dims, h=dims, seed=seeds)
def test_progressive_gray_equals_baseline_decode(w, h, seed):
    """Progressive (SOF2) invariant: the completed progression carries
    EXACTLY the baseline path's coefficients, so for any dims/content
    the decoded bytes must be identical — not merely within rounding."""
    from go_map_reduce_spark.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg_progressive_gray,
    )

    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
    _w, _h, bpp, px = decode_jpeg(encode_jpeg_progressive_gray(w, h, a.tobytes()))
    assert (_w, _h, bpp) == (w, h, 8)
    _, _, _, px0 = decode_jpeg_gray(encode_jpeg_gray(w, h, a.tobytes()))
    assert px == px0


@settings(max_examples=15, deadline=None)
@given(w=dims, h=dims, seed=seeds, coarse=st.booleans(), sub=st.booleans())
def test_progressive_color_equals_baseline_decode(w, h, seed, coarse, sub):
    """Color progressive across generated dims, quant coarseness, and
    4:4:4/4:2:0 — always bit-identical to the corresponding baseline
    layout's decode."""
    from go_map_reduce_spark.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg_color,
        encode_jpeg_color_420,
        encode_jpeg_progressive_color,
    )

    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    quant = [9] * 64 if coarse else None
    _, _, _, px = decode_jpeg(
        encode_jpeg_progressive_color(
            w, h, a.tobytes(), quant=quant, subsample=sub
        )
    )
    base = encode_jpeg_color_420 if sub else encode_jpeg_color
    _, _, _, px0 = decode_jpeg(base(w, h, a.tobytes(), quant=quant))
    assert px == px0
