"""Baseline-JPEG codec tier: round-trip exactness on block-constant
content, bounded error on arbitrary content, entropy-path coverage
(ZRL, byte stuffing, negative extend), corruption rejection, and the
gated query's oracle pin."""

import numpy as np
import pytest

from go_map_reduce_spark.functions.jpegcodec import (
    AC_BITS,
    AC_VALS,
    DC_BITS,
    DC_VALS,
    ZIGZAG,
    build_codes,
    build_decode_map,
    decode_jpeg_gray,
    encode_jpeg_gray,
)
from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare


def test_zigzag_is_a_permutation_with_known_anchors():
    assert sorted(r * 8 + c for r, c in ZIGZAG) == list(range(64))
    # spec anchors: start, the first diagonal, and the end
    assert ZIGZAG[:4] == [(0, 0), (0, 1), (1, 0), (2, 0)]
    assert ZIGZAG[-1] == (7, 7)


def test_huffman_tables_are_prefix_free_and_complete():
    for bits, vals in ((DC_BITS, DC_VALS), (AC_BITS, AC_VALS)):
        codes = build_codes(bits, vals)
        assert len(codes) == len(vals)
        entries = sorted(
            (length, code) for code, length in codes.values()
        )
        # prefix-free: no code is a prefix of a longer one
        for la, ca in entries:
            for lb, cb in entries:
                if lb > la:
                    assert (cb >> (lb - la)) != ca
        # decode map inverts the encode map
        dm = build_decode_map(bits, vals)
        for sym, (code, length) in codes.items():
            assert dm[(length, code)] == sym


def test_block_constant_roundtrip_is_exact():
    w, h = 24, 16
    img = bytes(
        (5 * 7 + (x // 8) * 13 + (y // 8) * 29) % 256
        for y in range(h)
        for x in range(w)
    )
    gw, gh, bpp, px = decode_jpeg_gray(encode_jpeg_gray(w, h, img))
    assert (gw, gh, bpp) == (w, h, 8) and px == img


@pytest.mark.parametrize("w,h", [(8, 8), (21, 13), (1, 1), (40, 9)])
def test_arbitrary_content_roundtrips_within_dct_rounding(w, h):
    rng = np.random.RandomState(w * 100 + h)
    a = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
    gw, gh, _bpp, px = decode_jpeg_gray(encode_jpeg_gray(w, h, a.tobytes()))
    assert (gw, gh) == (w, h)
    b = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_sparse_block_exercises_zrl_and_negative_extend():
    """A block with isolated extreme pixels produces long AC zero runs
    (ZRL path) and large negative coefficients (extend path); 0xFF
    entropy bytes appear with these tables, exercising stuffing."""
    a = np.full((8, 8), 128, dtype=np.uint8)
    a[0, 0], a[7, 7], a[3, 4] = 255, 0, 17
    _w, _h, _bpp, px = decode_jpeg_gray(encode_jpeg_gray(8, 8, a.tobytes()))
    b = np.frombuffer(px, dtype=np.uint8).reshape(8, 8)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_quantization_table_is_applied():
    """With a coarse quant table the stream must shrink and the decoded
    image must differ from the fine-quant result — proof DQT is read
    and applied, not ignored."""
    rng = np.random.RandomState(7)
    a = rng.randint(0, 256, size=(16, 16), dtype=np.uint8)
    fine = encode_jpeg_gray(16, 16, a.tobytes())
    coarse = encode_jpeg_gray(16, 16, a.tobytes(), quant=[40] * 64)
    assert len(coarse) < len(fine)
    _, _, _, px = decode_jpeg_gray(coarse)
    b = np.frombuffer(px, dtype=np.uint8).reshape(16, 16)
    err = np.abs(a.astype(int) - b.astype(int)).max()
    assert 1 < err < 160  # lossy but recognizable


def test_corruption_and_foreign_payloads_rejected():
    img = bytes(range(64))
    good = encode_jpeg_gray(8, 8, img)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"PNG nope")
    with pytest.raises(ValueError):
        decode_jpeg_gray(good[:20])  # truncated mid-segments
    headless = good[:2] + good[4:]  # shear a marker boundary
    with pytest.raises(ValueError):
        decode_jpeg_gray(headless)


def test_decode_image_routes_baseline_jpeg_natively():
    from go_map_reduce_spark.operators.multimodal import decode_image

    img = bytes((x * 3 + y * 5) % 256 for y in range(8) for x in range(8))
    w, h, bpp, _px = decode_image(encode_jpeg_gray(8, 8, img))
    assert (w, h, bpp) == (8, 8, 8)


def test_jpeg_query_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["multimodal_jpeg_decode"](spark, sf_dir),
        ORACLES["multimodal_jpeg_decode"],
        sf_dir,
    )


def test_color_roundtrip_within_conversion_rounding():
    """YCbCr 4:4:4 color tier: two color-matrix roundings plus DCT
    rounding bound the error at 2 per channel."""
    from go_map_reduce_spark.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg_color,
    )

    rng = np.random.RandomState(11)
    a = rng.randint(0, 256, size=(13, 21, 3), dtype=np.uint8)
    w, h, bpp, px = decode_jpeg(encode_jpeg_color(21, 13, a.tobytes()))
    assert (w, h, bpp) == (21, 13, 24)
    b = np.frombuffer(px, dtype=np.uint8).reshape(13, 21, 3)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 2


def test_color_components_are_independent():
    """Pure-channel images must decode with the energy in the right
    channel — catches swapped Cb/Cr or broken per-component DC
    predictors (which a gray roundtrip can't see)."""
    from go_map_reduce_spark.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg_color,
    )

    for ch in range(3):
        a = np.zeros((8, 16, 3), dtype=np.uint8)
        a[..., ch] = 200
        _w, _h, _bpp, px = decode_jpeg(encode_jpeg_color(16, 8, a.tobytes()))
        b = np.frombuffer(px, dtype=np.uint8).reshape(8, 16, 3)
        assert abs(int(b[..., ch].mean()) - 200) <= 2
        for other in range(3):
            if other != ch:
                assert b[..., other].mean() <= 8


def test_decode_image_routes_color_jpeg_natively():
    from go_map_reduce_spark.functions.jpegcodec import encode_jpeg_color
    from go_map_reduce_spark.operators.multimodal import decode_image

    a = np.full((8, 8, 3), 99, dtype=np.uint8)
    w, h, bpp, _px = decode_image(encode_jpeg_color(8, 8, a.tobytes()))
    assert (w, h, bpp) == (8, 8, 24)


def test_420_constant_color_roundtrips_exactly():
    """Constant chroma loses nothing to 2x2 subsampling: THIS color
    triple is lossless through the YCbCr integer rounding, so the
    4:2:0 layout must return it bit-exactly (the general constant-
    color bound is ±1 from the color conversion alone — pinned by the
    hypothesis property test — but a triple that survives 4:4:4
    exactly must survive 4:2:0 exactly too)."""
    from go_map_reduce_spark.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg_color_420,
    )

    a = np.zeros((13, 21, 3), dtype=np.uint8)
    a[..., 0], a[..., 1], a[..., 2] = 180, 64, 201
    w, h, bpp, px = decode_jpeg(encode_jpeg_color_420(21, 13, a.tobytes()))
    assert (w, h, bpp) == (21, 13, 24)
    assert np.abs(
        a.astype(int) - np.frombuffer(px, dtype=np.uint8).reshape(13, 21, 3)
    ).max() == 0


def test_420_preserves_luma_detail():
    """Gray content (constant chroma, full luma detail): the four-Y MCU
    geometry carries luma at full resolution, so error stays at the
    DCT-rounding bound even though chroma is subsampled."""
    from go_map_reduce_spark.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg_color_420,
    )

    g = np.random.RandomState(5).randint(0, 256, size=(16, 32), dtype=np.uint8)
    rgb = np.stack([g, g, g], axis=-1)
    _w, _h, _bpp, px = decode_jpeg(encode_jpeg_color_420(32, 16, rgb.tobytes()))
    b = np.frombuffer(px, dtype=np.uint8).reshape(16, 32, 3)
    assert np.abs(rgb.astype(int) - b.astype(int)).max() <= 1


def test_420_is_smaller_than_444_on_real_dims():
    """The point of subsampling: half the chroma blocks — on any image
    bigger than one MCU the 4:2:0 stream must be no larger than the
    4:4:4 stream of the same content."""
    from go_map_reduce_spark.functions.jpegcodec import (
        encode_jpeg_color,
        encode_jpeg_color_420,
    )

    rng = np.random.RandomState(2)
    a = rng.randint(0, 256, size=(32, 48, 3), dtype=np.uint8)
    assert len(encode_jpeg_color_420(48, 32, a.tobytes())) < len(
        encode_jpeg_color(48, 32, a.tobytes())
    )


def test_decode_image_routes_420_natively():
    from go_map_reduce_spark.functions.jpegcodec import encode_jpeg_color_420
    from go_map_reduce_spark.operators.multimodal import decode_image

    a = np.full((16, 16, 3), 77, dtype=np.uint8)
    w, h, bpp, _px = decode_image(encode_jpeg_color_420(16, 16, a.tobytes()))
    assert (w, h, bpp) == (16, 16, 24)


def test_restart_markers_roundtrip_and_are_verified():
    """DRI/RSTn support (T.81 E.1.4 — the error-resilience layout most
    camera JPEGs use): byte-aligned restart markers every N MCUs with
    DC-predictor resets must round-trip, and a wrong restart sequence
    number must be rejected (the decoder VERIFIES the modulo-8 count,
    it doesn't skip blind)."""
    from go_map_reduce_spark.functions.jpegcodec import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = np.random.RandomState(8)
    a = rng.randint(0, 256, size=(24, 40), dtype=np.uint8)  # 15 MCUs
    for ri in (1, 4, 7):
        p = encode_jpeg_gray(40, 24, a.tobytes(), restart_interval=ri)
        n_rst = sum(
            1
            for i in range(len(p) - 1)
            if p[i] == 0xFF and 0xD0 <= p[i + 1] <= 0xD7
        )
        assert n_rst == (15 - 1) // ri  # markers between segments only
        _w, _h, _bpp, px = decode_jpeg_gray(p)
        b = np.frombuffer(px, dtype=np.uint8).reshape(24, 40)
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
    # corrupt one restart marker's sequence number → detected
    p = bytearray(encode_jpeg_gray(40, 24, a.tobytes(), restart_interval=2))
    for i in range(len(p) - 1):
        if p[i] == 0xFF and p[i + 1] == 0xD1:  # second restart
            p[i + 1] = 0xD5
            break
    with pytest.raises(ValueError, match="RST"):
        decode_jpeg_gray(bytes(p))


def test_two_table_set_layout_keys_tables_by_destination():
    """The dominant real-world layout: one multi-table DQT segment
    (destinations 0+1), separate chroma Huffman tables (DC1/AC1 with a
    DIFFERENT symbol ordering), SOF Tq and SOS Td/Ta per component. A
    decoder that ignores destination IDs (last-defined-table-wins)
    would dequantize luma with the coarse chroma table and read luma
    symbols through the reversed chroma Huffman map — garbage, not a
    ±1 image. Gray-valued RGB has exactly-constant chroma (Cb=Cr=128),
    so with a coarse chroma quant the image must STILL come back within
    DCT rounding."""
    from go_map_reduce_spark.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg_color,
    )

    g = np.random.RandomState(3).randint(0, 256, size=(16, 24), dtype=np.uint8)
    rgb = np.stack([g, g, g], axis=-1)
    stream = encode_jpeg_color(24, 16, rgb.tobytes(), chroma_quant=[99] * 64)
    # structural: exactly one DQT segment, four DHT segments
    assert stream.count(b"\xff\xdb") == 1
    assert stream.count(b"\xff\xc4") == 4
    w, h, bpp, px = decode_jpeg(stream)
    assert (w, h, bpp) == (24, 16, 24)
    b = np.frombuffer(px, dtype=np.uint8).reshape(16, 24, 3)
    assert np.abs(rgb.astype(int) - b.astype(int)).max() <= 1


def test_two_table_set_chroma_quant_hits_chroma_only():
    """Coarse chroma quant must degrade color content but leave
    gray-axis content alone — proof each component dequantizes with
    ITS Tq table."""
    from go_map_reduce_spark.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg_color,
    )

    rng = np.random.RandomState(21)
    a = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    fine = decode_jpeg(encode_jpeg_color(16, 16, a.tobytes(), chroma_quant=[1] * 64))
    coarse = decode_jpeg(
        encode_jpeg_color(16, 16, a.tobytes(), chroma_quant=[80] * 64)
    )
    ef = np.abs(
        a.astype(int) - np.frombuffer(fine[3], dtype=np.uint8).reshape(16, 16, 3).astype(int)
    ).max()
    ec = np.abs(
        a.astype(int) - np.frombuffer(coarse[3], dtype=np.uint8).reshape(16, 16, 3).astype(int)
    ).max()
    assert ef <= 2 and ec > ef  # chroma loss shows, luma path unharmed


def test_scan_referencing_undefined_table_is_rejected():
    """SOS naming a Huffman destination that no DHT defined must raise
    ValueError (so decode_image's fallback gate engages) rather than
    decode with the wrong table."""
    from go_map_reduce_spark.functions.jpegcodec import decode_jpeg

    good = bytearray(encode_jpeg_gray(8, 8, bytes(range(64))))
    # SOS payload for gray: 01 01 00 00 3f 00 — set Td/Ta to table 3
    at = good.find(b"\xff\xda")
    assert at > 0
    good[at + 6] = 0x33
    with pytest.raises(ValueError, match="undefined table"):
        decode_jpeg(bytes(good))


@pytest.mark.parametrize("cut", [2, 25, -10])
def test_truncated_streams_normalize_to_valueerror(cut):
    """Truncation anywhere — mid-segment or mid-entropy-stream — must
    surface as ValueError, never raw IndexError/struct.error, so the
    multimodal decode_image fallback only needs one exception type."""
    good = encode_jpeg_gray(8, 8, bytes(range(64)))
    trunc = good[: cut if cut > 0 else len(good) + cut]
    with pytest.raises(ValueError):
        decode_jpeg_gray(trunc)


# ---------------------------------------------------------------------------
# r06 forged-dimension guard (ADVICE): decoders must reject implausible
# SOF dimensions BEFORE allocating pixel/coefficient planes, mirroring
# the BMP forged-dimension guard.
# ---------------------------------------------------------------------------


def _forged_sof(marker: int, width: int, height: int) -> bytes:
    """SOI + a single forged 1-component SOF segment (nothing else —
    the guard must fire at SOF parse time, before any allocation)."""
    import struct as _s

    sof = _s.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    return (
        b"\xff\xd8"
        + bytes([0xFF, marker])
        + _s.pack(">H", 2 + len(sof))
        + sof
    )


def test_baseline_forged_huge_dimensions_rejected():
    from go_map_reduce_spark.functions.jpegcodec import decode_jpeg

    with pytest.raises(ValueError, match="JPEG_MAX_PIXELS"):
        decode_jpeg(_forged_sof(0xC0, 65535, 65535))


def test_progressive_forged_huge_dimensions_rejected():
    from go_map_reduce_spark.functions.jpegcodec import decode_jpeg

    with pytest.raises(ValueError, match="JPEG_MAX_PIXELS"):
        decode_jpeg(_forged_sof(0xC2, 65535, 65535))


def test_baseline_under_cap_but_implausible_block_count_rejected():
    """3000x3000 is under the pixel cap, but a sequential scan needs
    >= 2 bits per block — a ~20-byte payload cannot hold 140k blocks."""
    from go_map_reduce_spark.functions.jpegcodec import decode_jpeg

    with pytest.raises(ValueError, match="implausible"):
        decode_jpeg(_forged_sof(0xC0, 3000, 3000))


def test_decode_image_fallback_gate_engages_on_forged_sof():
    """The multimodal entry point normalizes the guard's ValueError the
    same way as every other malformed payload."""
    from go_map_reduce_spark.operators.multimodal import decode_image

    with pytest.raises(ValueError):
        decode_image(_forged_sof(0xC0, 65535, 65535))


def test_legitimate_small_frames_pass_the_guard():
    """The guard must not reject real streams: round-trip an encode at
    a few sizes through BOTH paths (the plausibility floor counts the
    actual payload, which always holds >= 2 bits per block)."""
    from go_map_reduce_spark.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg_gray,
        encode_jpeg_progressive_gray,
    )

    pixels = bytes(
        (x * 7 + y) % 256 for y in range(16) for x in range(24)
    )
    for enc in (encode_jpeg_gray, encode_jpeg_progressive_gray):
        w, h, bpp, _px = decode_jpeg(enc(24, 16, pixels))
        assert (w, h, bpp) == (24, 16, 8)


# ---------------------------------------------------------------------------
# r07 ADVICE: a malformed GMRS_JPEG_MAX_PIXELS override must fall back
# to the default, not raise at import time (the parse runs when the
# package is first imported, so a bad env value would take down every
# consumer, not just the override).
# ---------------------------------------------------------------------------


def test_max_pixels_env_parse_is_guarded(monkeypatch):
    from go_map_reduce_spark.functions.jpegcodec import _max_pixels_from_env

    monkeypatch.setenv("GMRS_JPEG_MAX_PIXELS", "not-a-number")
    assert _max_pixels_from_env() == 4096 * 4096
    monkeypatch.setenv("GMRS_JPEG_MAX_PIXELS", "1000000")
    assert _max_pixels_from_env() == 1000000
    # nonpositive is malformed too (a 0 cap would reject every frame)
    monkeypatch.setenv("GMRS_JPEG_MAX_PIXELS", "0")
    assert _max_pixels_from_env() == 4096 * 4096
    monkeypatch.setenv("GMRS_JPEG_MAX_PIXELS", "-5")
    assert _max_pixels_from_env() == 4096 * 4096
    monkeypatch.delenv("GMRS_JPEG_MAX_PIXELS")
    assert _max_pixels_from_env() == 4096 * 4096
