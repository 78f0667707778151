"""Generate the committed codec golden-byte fixtures (r14 verdict item
7): deterministic payload -> encoded-bytes pairs for every pure-Python
codec (PNG, JPEG baseline/subsampled/progressive, WAV, BMP), plus
decode round-trips and malformed-stream error positions.

The r14 round rewrote the codec internals (vectorized numpy, batched
GEMM) with byte-identity verified differentially against the deleted
originals and enforced end-to-end by the DuckDB oracles at sf0.01 —
but "numpy batched GEMM is bit-identical" is a BLAS-dependent property
and the differential twins are gone. These fixtures freeze today's
(oracle-green) bytes so a platform/numpy/BLAS change is caught by
pytest (tests/test_codec_goldens.py), not by an oracle run.

Usage: python tools/gen_codec_goldens.py   # rewrites tests/fixtures/
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

OUT = os.path.join(HERE, "tests", "fixtures", "codec_goldens.json")


def _lcg_bytes(seed: int, n: int) -> bytes:
    """Deterministic byte stream (explicit LCG — independent of any
    stdlib RNG implementation detail)."""
    x = seed & 0xFFFFFFFF
    out = bytearray(n)
    for i in range(n):
        x = (1103515245 * x + 12345) & 0x7FFFFFFF
        out[i] = (x >> 16) & 0xFF
    return bytes(out)


def _gradient(w: int, h: int, ch: int) -> bytes:
    return bytes(
        (x * 3 + y * 7 + c * 11) & 0xFF
        for y in range(h)
        for x in range(w)
        for c in range(ch)
    )


def _b64(b: bytes) -> str:
    return base64.b64encode(b).decode()


def _err(fn, *args) -> dict:
    try:
        fn(*args)
    except Exception as ex:  # noqa: BLE001 — recording the exact failure
        return {"type": type(ex).__name__, "msg": str(ex)}
    return {"type": None, "msg": "NO ERROR RAISED"}


def main() -> None:
    from go_map_reduce_spark.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg_color,
        encode_jpeg_color_subsampled,
        encode_jpeg_gray,
        encode_jpeg_progressive_color,
        encode_jpeg_progressive_gray,
    )
    from go_map_reduce_spark.operators.multimodal import (
        decode_bmp,
        decode_png,
        decode_wav,
        encode_bmp,
        encode_png,
        encode_wav,
    )

    g: dict = {"png": [], "jpeg": [], "wav": [], "bmp": []}

    # ---- PNG: every filter path (rows cycle through all 5 filters) ----
    for w, h, tag, px in [
        (1, 1, "1x1-random", _lcg_bytes(1, 3)),
        (4, 3, "4x3-random", _lcg_bytes(2, 4 * 3 * 3)),
        (8, 8, "8x8-gradient", _gradient(8, 8, 3)),
        (16, 16, "16x16-random", _lcg_bytes(3, 16 * 16 * 3)),
        (16, 16, "16x16-constant", bytes([127]) * (16 * 16 * 3)),
        (5, 7, "5x7-gradient", _gradient(5, 7, 3)),
    ]:
        rows = [px[y * w * 3 : (y + 1) * w * 3] for y in range(h)]
        enc = encode_png(w, h, rows)
        dec = decode_png(enc)
        g["png"].append(
            {
                "case": tag,
                "w": w,
                "h": h,
                "pixels": _b64(px),
                "encoded": _b64(enc),
                "decoded_sha": hashlib.sha256(dec[3]).hexdigest(),
                "decoded_dims": [dec[0], dec[1], dec[2]],
                "err_truncated_20": _err(decode_png, enc[:20]),
                "err_truncated_half": _err(decode_png, enc[: len(enc) // 2]),
                "err_crc_flip": _err(
                    decode_png, enc[:-5] + bytes([enc[-5] ^ 0xFF]) + enc[-4:]
                ),
            }
        )

    # ---- JPEG: gray / color 444 / two-table 444 / 420 / 422 /
    #      progressive, plus restart markers and custom quant ----
    q_custom = [(i % 7) + 1 for i in range(64)]
    jpeg_cases = [
        ("gray-8x8-random", lambda px: encode_jpeg_gray(8, 8, px), 8, 8, 1),
        (
            "gray-16x8-gradient-quant",
            lambda px: encode_jpeg_gray(16, 8, px, quant=q_custom),
            16,
            8,
            1,
        ),
        (
            "gray-24x16-restart2",
            lambda px: encode_jpeg_gray(24, 16, px, restart_interval=2),
            24,
            16,
            1,
        ),
        (
            "color444-8x8-random",
            lambda px: encode_jpeg_color(8, 8, px),
            8,
            8,
            3,
        ),
        (
            "color444-16x8-twotable",
            lambda px: encode_jpeg_color(16, 8, px, chroma_quant=q_custom),
            16,
            8,
            3,
        ),
        (
            "color420-16x16-random",
            lambda px: encode_jpeg_color_subsampled(16, 16, px, None, (2, 2)),
            16,
            16,
            3,
        ),
        (
            "color422-16x8-gradient",
            lambda px: encode_jpeg_color_subsampled(16, 8, px, None, (2, 1)),
            16,
            8,
            3,
        ),
        (
            "prog-gray-16x16-random",
            lambda px: encode_jpeg_progressive_gray(16, 16, px),
            16,
            16,
            1,
        ),
        (
            "prog-color420-16x16-gradient",
            lambda px: encode_jpeg_progressive_color(
                16, 16, px, subsample=True
            ),
            16,
            16,
            3,
        ),
    ]
    for i, (tag, enc_fn, w, h, ch) in enumerate(jpeg_cases):
        px = (
            _gradient(w, h, ch)
            if "gradient" in tag
            else _lcg_bytes(100 + i, w * h * ch)
        )
        enc = enc_fn(px)
        dec = decode_jpeg(enc)
        g["jpeg"].append(
            {
                "case": tag,
                "w": w,
                "h": h,
                "ch": ch,
                "pixels": _b64(px),
                "encoded": _b64(enc),
                "decoded_sha": hashlib.sha256(dec[3]).hexdigest(),
                "decoded_dims": [dec[0], dec[1], dec[2]],
                "err_truncated_entropy": _err(decode_jpeg, enc[:-10]),
                "err_truncated_header": _err(decode_jpeg, enc[:12]),
                "err_marker_flip": _err(
                    decode_jpeg, enc[:2] + bytes([0x00]) + enc[3:]
                ),
            }
        )

    # ---- WAV ----
    for tag, chn, frames in [
        ("mono", 1, [[(b % 200) - 100] for b in _lcg_bytes(7, 40)]),
        (
            "stereo",
            2,
            [
                [(a % 256) * 100 - 12800, (b % 256) * 100 - 12800]
                for a, b in zip(_lcg_bytes(8, 30), _lcg_bytes(9, 30))
            ],
        ),
    ]:
        enc = encode_wav(chn, 8000, frames)
        dec = decode_wav(enc)
        g["wav"].append(
            {
                "case": tag,
                "channels": chn,
                "frames": frames,
                "encoded": _b64(enc),
                "decoded_sha": hashlib.sha256(dec[3]).hexdigest(),
                "decoded_meta": [dec[0], dec[1], dec[2]],
                "err_overflow": _err(
                    encode_wav, chn, 8000, [[40000] * chn]
                ),
                "err_float": _err(encode_wav, chn, 8000, [[1.5] * chn]),
                "err_truncated": _err(decode_wav, enc[: len(enc) // 2]),
            }
        )

    # ---- BMP ----
    for w, h, tag in [(5, 3, "5x3"), (8, 8, "8x8")]:
        px = _lcg_bytes(11, w * h * 3)
        rows = [px[y * w * 3 : (y + 1) * w * 3] for y in range(h)]
        enc = encode_bmp(w, h, rows)
        dec = decode_bmp(enc)
        g["bmp"].append(
            {
                "case": tag,
                "w": w,
                "h": h,
                "pixels": _b64(px),
                "encoded": _b64(enc),
                "decoded_sha": hashlib.sha256(dec[3]).hexdigest(),
                "decoded_dims": [dec[0], dec[1], dec[2]],
                "err_truncated": _err(decode_bmp, enc[:10]),
            }
        )

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(g, f, indent=1, sort_keys=True)
    n = sum(len(v) for v in g.values())
    print(f"wrote {OUT}: {n} cases")


if __name__ == "__main__":
    main()
