"""Progressive JPEG (SOF2, T.81 Annex G) tier: the completed
progression must reconstruct EXACTLY the coefficients the baseline
path produces for the same content and quant table, so every
round-trip here is pinned bit-for-bit against the already-proven
baseline decode — not just within a tolerance. Covers DC first +
refinement (successive approximation), AC spectral bands, AC
refinement with correction bits, EOBRUN, gray / 4:4:4 / 4:2:0, odd
dimensions (natural vs MCU-padded block grids), and decode_image
routing."""

import numpy as np
import pytest

from go_map_reduce_spark.functions.jpegcodec import (
    decode_jpeg,
    decode_jpeg_gray,
    encode_jpeg_color,
    encode_jpeg_color_420,
    encode_jpeg_gray,
    encode_jpeg_progressive_color,
    encode_jpeg_progressive_gray,
)


@pytest.mark.parametrize("w,h", [(8, 8), (24, 16), (21, 13), (1, 1), (40, 9)])
def test_progressive_gray_matches_baseline_decode_bitexact(w, h):
    a = np.random.RandomState(w * 100 + h).randint(
        0, 256, size=(h, w), dtype=np.uint8
    )
    _w, _h, bpp, px = decode_jpeg(encode_jpeg_progressive_gray(w, h, a.tobytes()))
    assert (_w, _h, bpp) == (w, h, 8)
    _, _, _, px0 = decode_jpeg_gray(encode_jpeg_gray(w, h, a.tobytes()))
    assert px == px0


def test_progressive_stream_is_sof2_with_multiple_scans():
    a = np.random.RandomState(1).randint(0, 256, size=(16, 16), dtype=np.uint8)
    p = encode_jpeg_progressive_gray(16, 16, a.tobytes())
    assert b"\xff\xc2" in p and b"\xff\xc0" not in p
    # 6-scan script for one component: DC first/refine + 2 bands x 2
    assert p.count(b"\xff\xda") == 6


def test_progressive_color_444_matches_baseline_decode():
    rng = np.random.RandomState(11)
    a = rng.randint(0, 256, size=(13, 21, 3), dtype=np.uint8)
    _w, _h, bpp, px = decode_jpeg(
        encode_jpeg_progressive_color(21, 13, a.tobytes())
    )
    assert bpp == 24
    _, _, _, px0 = decode_jpeg(encode_jpeg_color(21, 13, a.tobytes()))
    assert px == px0


@pytest.mark.parametrize("w,h", [(40, 24), (21, 13), (16, 16)])
def test_progressive_420_matches_baseline_420_decode(w, h):
    a = np.random.RandomState(h).randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    _w, _h, bpp, px = decode_jpeg(
        encode_jpeg_progressive_color(w, h, a.tobytes(), subsample=True)
    )
    assert (_w, _h, bpp) == (w, h, 24)
    _, _, _, px0 = decode_jpeg(encode_jpeg_color_420(w, h, a.tobytes()))
    assert px == px0


def test_progressive_coarse_quant_matches_baseline():
    """Coarse quantization shrinks coefficient magnitudes into the
    successive-approximation sweet spot (lots of ±1 'newly nonzero'
    refinement placements + long EOBRUNs) — still must complete to the
    baseline coefficients exactly."""
    a = np.random.RandomState(9).randint(0, 256, size=(24, 24, 3), dtype=np.uint8)
    _, _, _, px = decode_jpeg(
        encode_jpeg_progressive_color(24, 24, a.tobytes(), quant=[12] * 64)
    )
    _, _, _, px0 = decode_jpeg(
        encode_jpeg_color(24, 24, a.tobytes(), quant=[12] * 64)
    )
    assert px == px0


def test_progressive_sparse_content_exercises_eobrun_and_zrl():
    g = np.zeros((48, 64), dtype=np.uint8)
    g[10:14, 20:24] = 255
    g[40, 60] = 128
    p = encode_jpeg_progressive_gray(64, 48, g.tobytes())
    _, _, _, px = decode_jpeg(p)
    _, _, _, px0 = decode_jpeg_gray(encode_jpeg_gray(64, 48, g.tobytes()))
    assert px == px0


def test_progressive_truncation_normalizes_to_valueerror():
    a = np.random.RandomState(2).randint(0, 256, size=(16, 16), dtype=np.uint8)
    p = encode_jpeg_progressive_gray(16, 16, a.tobytes())
    for cut in (len(p) - 6, len(p) // 2, 30):
        with pytest.raises(ValueError):
            decode_jpeg(p[:cut])


@pytest.mark.parametrize("ri", [1, 3, 7])
def test_progressive_restart_markers_roundtrip(ri):
    """Restart markers in progressive streams (per scan, sequence from
    0, DC-predictor/EOBRUN resets): the completed progression must
    still equal the baseline decode bit-exactly, and the stream must
    actually carry RSTn markers."""
    a = np.random.RandomState(3).randint(0, 256, size=(24, 40), dtype=np.uint8)
    p = encode_jpeg_progressive_gray(40, 24, a.tobytes(), restart_interval=ri)
    n_rst = sum(
        1 for i in range(len(p) - 1) if p[i] == 0xFF and 0xD0 <= p[i + 1] <= 0xD7
    )
    assert n_rst > 0
    _, _, _, px = decode_jpeg(p)
    _, _, _, px0 = decode_jpeg_gray(encode_jpeg_gray(40, 24, a.tobytes()))
    assert px == px0


def test_progressive_restart_color_and_eobrun_interplay():
    """Coarse-quant 4:2:0 progressive with restart_interval=1: every
    scan restarts between every unit, forcing EOBRUN flushes at each
    boundary — still bit-identical to the baseline 4:2:0 decode."""
    a = np.random.RandomState(3).randint(0, 256, size=(24, 40, 3), dtype=np.uint8)
    p = encode_jpeg_progressive_color(
        40, 24, a.tobytes(), quant=[12] * 64, subsample=True, restart_interval=1
    )
    _, _, _, px = decode_jpeg(p)
    _, _, _, px0 = decode_jpeg(
        encode_jpeg_color_420(40, 24, a.tobytes(), quant=[12] * 64)
    )
    assert px == px0


def test_progressive_restart_sequence_is_verified():
    """A corrupted RSTn sequence number must be detected, not skipped
    blind — same contract as the baseline decoder."""
    a = np.random.RandomState(3).randint(0, 256, size=(24, 40), dtype=np.uint8)
    p = bytearray(
        encode_jpeg_progressive_gray(40, 24, a.tobytes(), restart_interval=2)
    )
    for i in range(len(p) - 1):
        if p[i] == 0xFF and p[i + 1] == 0xD1:
            p[i + 1] = 0xD4
            break
    with pytest.raises(ValueError):
        decode_jpeg(bytes(p))


def test_decode_image_routes_progressive_natively():
    from go_map_reduce_spark.operators.multimodal import decode_image

    a = np.random.RandomState(5).randint(0, 256, size=(8, 16), dtype=np.uint8)
    w, h, bpp, _px = decode_image(encode_jpeg_progressive_gray(16, 8, a.tobytes()))
    assert (w, h, bpp) == (16, 8, 8)


def test_decode_image_malformed_payloads_raise_valueerror_only():
    """Every native codec (BMP/PNG/JPEG) normalizes truncation and
    garbage to ValueError — the single exception type decode_image
    documents."""
    from go_map_reduce_spark.operators.multimodal import (
        decode_image,
        encode_png,
    )

    rows = [bytes(24) for _ in range(8)]
    png = encode_png(8, 8, rows)
    jpg = encode_jpeg_gray(8, 8, bytes(64))
    bmp_stub = b"BM" + bytes(10)  # truncated header
    for bad in (png[:30], jpg[:30], bmp_stub, b"\x00\x01garbage"):
        with pytest.raises(ValueError):
            decode_image(bad)


@pytest.mark.parametrize("progressive", [False, True])
def test_corrupted_entropy_bytes_fail_closed(progressive):
    """Flip bytes throughout the stream (headers AND entropy data):
    the decoder must either return an image with the declared dims or
    raise ValueError — never a foreign exception, never a hang. (A
    flipped entropy byte can still be a VALID alternate decoding; that
    is fine — the contract is fail-closed, not detect-everything.)"""
    a = np.random.RandomState(6).randint(0, 256, size=(16, 24), dtype=np.uint8)
    enc = encode_jpeg_progressive_gray if progressive else (
        lambda w, h, px: encode_jpeg_gray(w, h, px)
    )
    good = enc(24, 16, a.tobytes())
    rng = np.random.RandomState(99)
    for _ in range(60):
        p = bytearray(good)
        at = rng.randint(2, len(p))
        p[at] ^= 1 << rng.randint(0, 8)
        try:
            w, h, bpp, px = decode_jpeg(bytes(p))
        except ValueError:
            continue
        assert bpp in (8, 24)
        assert len(px) == w * h * (bpp // 8)


def test_generalized_subsampled_encoder_matches_legacy_420_bytes():
    """encode_jpeg_color_subsampled(factors=(2,2)) must produce a
    byte-identical stream to the proven 4:2:0 encoder — the refactored
    generic MCU walk is an equivalence, not a behavior change."""
    from go_map_reduce_spark.functions.jpegcodec import (
        encode_jpeg_color_420,
        encode_jpeg_color_subsampled,
    )

    a = np.random.RandomState(17).randint(0, 256, size=(24, 40, 3), dtype=np.uint8)
    assert encode_jpeg_color_subsampled(
        40, 24, a.tobytes(), factors=(2, 2)
    ) == encode_jpeg_color_420(40, 24, a.tobytes())


@pytest.mark.parametrize("factors", [(2, 1), (1, 2)])
def test_422_and_440_layouts_roundtrip(factors):
    """The third common real-world layout (4:2:2, horizontal-only
    chroma) and its vertical twin: gray content keeps full luma detail
    (err <= DCT rounding), a 4:4:4-lossless constant color survives
    exactly, and the stream is smaller than 4:4:4."""
    from go_map_reduce_spark.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg_color,
        encode_jpeg_color_subsampled,
    )

    g = np.random.RandomState(8).randint(0, 256, size=(16, 32), dtype=np.uint8)
    rgb = np.stack([g, g, g], axis=-1)
    w, h, bpp, px = decode_jpeg(
        encode_jpeg_color_subsampled(32, 16, rgb.tobytes(), factors=factors)
    )
    assert (w, h, bpp) == (32, 16, 24)
    b = np.frombuffer(px, dtype=np.uint8).reshape(16, 32, 3)
    assert np.abs(rgb.astype(int) - b.astype(int)).max() <= 1

    c = np.zeros((13, 21, 3), dtype=np.uint8)
    c[..., 0], c[..., 1], c[..., 2] = 180, 64, 201
    _, _, _, px2 = decode_jpeg(
        encode_jpeg_color_subsampled(21, 13, c.tobytes(), factors=factors)
    )
    assert np.frombuffer(px2, dtype=np.uint8).reshape(13, 21, 3).tobytes() == c.tobytes()

    a = np.random.RandomState(2).randint(0, 256, size=(32, 48, 3), dtype=np.uint8)
    assert len(
        encode_jpeg_color_subsampled(48, 32, a.tobytes(), factors=factors)
    ) < len(encode_jpeg_color(48, 32, a.tobytes()))


def _refine_roundtrip_coefs(zzs, ss=1, se=63):
    """Scan-level harness: encode the (Al=1 first + Al=0 refinement)
    progression for a list of zigzag coefficient blocks and decode both
    scans back through _decode_scan. Exercises the AC-refinement
    encoder (ZRL placement, correction-bit ordering, EOBRUN) with zero
    DCT noise."""
    import numpy as np

    from go_map_reduce_spark.functions.jpegcodec import (
        AC_BITS_PROG,
        AC_VALS_PROG,
        _BitReader,
        _BitWriter,
        _RefineWriter,
        _decode_scan,
        _enc_ac_first_block,
        _enc_ac_refine_block,
        build_codes,
        build_decode_map,
    )

    ac_codes = build_codes(AC_BITS_PROG, AC_VALS_PROG)
    ac_map = build_decode_map(AC_BITS_PROG, AC_VALS_PROG)
    n = len(zzs)
    w1 = _BitWriter()
    rw1 = _RefineWriter(w1, ac_codes)
    for zz in zzs:
        t = [0] * 64
        for k in range(ss, se + 1):
            v = int(zz[k])
            t[k] = (abs(v) >> 1) * (1 if v >= 0 else -1)
        _enc_ac_first_block(rw1, t, ss, se)
    rw1.end_scan()
    w1.flush()
    w2 = _BitWriter()
    rw2 = _RefineWriter(w2, ac_codes)
    for zz in zzs:
        _enc_ac_refine_block(rw2, [int(v) for v in zz], ss, se, 0)
    rw2.end_scan()
    w2.flush()
    coefs = [np.zeros((1, n, 64), dtype=np.int64)]
    dims = [(1, n, 1, n)]
    spec = [(0, 0, 0)]
    r1 = _BitReader(bytes(w1.out) + b"\xff\xd9", 0)
    _decode_scan(r1, coefs, dims, [(1, 1)], spec, ss, se, 0, 1, {}, {0: ac_map}, n, 1)
    r2 = _BitReader(bytes(w2.out) + b"\xff\xd9", 0)
    _decode_scan(r2, coefs, dims, [(1, 1)], spec, ss, se, 1, 0, {}, {0: ac_map}, n, 1)
    return [coefs[0][0, i] for i in range(n)]


@pytest.mark.parametrize(
    "pattern",
    [
        {20: 3, 40: -2, 60: 1},  # history coef inside a >15-zero run
        {23: 2, 24: 1},          # history coef adjacent to newly-nonzero
        {1: -20, 20: 3, 40: -2, 60: 1},
        {63: 1},                 # lone new coef at band end
        {1: 2},                  # lone history coef, whole band EOB
    ],
)
def test_ac_refinement_zrl_correction_bit_placement(pattern):
    """Regression for the r05-review encoder bug: correction bits for
    history coefficients must follow the symbol whose run/ZRL span
    contains them (T.81 G.1.2.3). The old encoder deferred ZRLs past
    history coefficients and flushed the bits early, desyncing the
    spec-correct decoder on exactly these sparse shapes."""
    z = np.zeros(64, dtype=np.int64)
    for k, v in pattern.items():
        z[k] = v
    out = _refine_roundtrip_coefs([z])[0]
    assert [int(out[k]) for k in range(1, 64)] == [int(z[k]) for k in range(1, 64)]


def test_ac_refinement_sparse_fuzz_roundtrips():
    """1200 random sparse blocks + 200 multi-block sequences (EOBRUN
    spanning blocks) through the scan-level harness — every coefficient
    must survive exactly. The pre-fix encoder failed ~14% of these."""
    rng = np.random.RandomState(0)
    for _ in range(1200):
        z = np.zeros(64, dtype=np.int64)
        for _ in range(rng.randint(1, 6)):
            z[rng.randint(1, 64)] = rng.randint(-4, 5)
        out = _refine_roundtrip_coefs([z])[0]
        assert [int(v) for v in out[1:]] == [int(v) for v in z[1:]]
    for _ in range(200):
        zs = []
        for _b in range(rng.randint(2, 6)):
            z = np.zeros(64, dtype=np.int64)
            for _ in range(rng.randint(0, 5)):
                z[rng.randint(1, 64)] = rng.randint(-6, 7)
            zs.append(z)
        outs = _refine_roundtrip_coefs(zs)
        for o, z in zip(outs, zs):
            assert [int(v) for v in o[1:]] == [int(v) for v in z[1:]]


def test_progressive_sparse_images_match_baseline_end_to_end():
    """Sparse/smooth content (flat background + isolated pixels, coarse
    quant) is the regime that produces the long-zero-run + history-coef
    shapes of the fixed encoder bug — end-to-end streams must equal the
    baseline decode bit-exactly."""
    rng = np.random.RandomState(1)
    for _ in range(25):
        h, w = rng.randint(8, 40), rng.randint(8, 40)
        a = np.full((h, w), rng.randint(0, 256), dtype=np.uint8)
        for _ in range(rng.randint(1, 6)):
            a[rng.randint(0, h), rng.randint(0, w)] = rng.randint(0, 256)
        q = [int(rng.choice([1, 8, 16, 24]))] * 64
        _, _, _, px = decode_jpeg(
            encode_jpeg_progressive_gray(w, h, a.tobytes(), quant=list(q))
        )
        _, _, _, px0 = decode_jpeg_gray(
            encode_jpeg_gray(w, h, a.tobytes(), quant=list(q))
        )
        assert px == px0
