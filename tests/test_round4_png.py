"""PNG codec tier: pure-stdlib encode/decode round-trip, filter
coverage, corruption detection, and the gated query's oracle pin."""

import zlib

import pytest

from go_map_reduce_spark.operators.multimodal import (
    _PNG_SIG,
    decode_image,
    decode_png,
    encode_png,
)
from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare


def _image(w, h, fn):
    return [
        bytes(v for x in range(w) for v in fn(x, y)) for y in range(h)
    ]


def test_roundtrip_exercises_all_five_filters():
    """height ≥ 5 ⇒ the encoder emits every filter type (row y uses
    y % 5); the decode must reproduce the pixels bit-exactly."""
    w, h = 11, 9  # odd width: Average/Paeth left-edge paths hit too
    rows = _image(w, h, lambda x, y: ((x * 7 + y) % 256, (x ^ y) % 256, (x * y + 3) % 256))
    payload = encode_png(w, h, rows)
    gw, gh, bpp, px = decode_png(payload)
    assert (gw, gh, bpp) == (w, h, 24)
    assert px == b"".join(rows)


@pytest.mark.parametrize("w,h", [(1, 1), (1, 7), (8, 1), (16, 16)])
def test_roundtrip_edge_dimensions(w, h):
    rows = _image(w, h, lambda x, y: ((x + y) % 256, (255 - x) % 256, y % 256))
    gw, gh, _bpp, px = decode_png(encode_png(w, h, rows))
    assert (gw, gh) == (w, h) and px == b"".join(rows)


def test_crc_corruption_detected():
    payload = bytearray(encode_png(4, 4, _image(4, 4, lambda x, y: (x, y, 0))))
    # flip a byte inside the IDAT data region (after sig+IHDR chunk)
    idat_at = payload.index(b"IDAT")
    payload[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_truncated_and_foreign_payloads_rejected():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF not a png")
    good = encode_png(4, 4, _image(4, 4, lambda x, y: (x, y, 1)))
    # valid chunks but pixel data for the wrong dimensions
    bad_raw = zlib.compress(bytes(10))
    from go_map_reduce_spark.operators.multimodal import _png_chunk
    import struct

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    frank = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", bad_raw)
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(frank)
    assert decode_png(good)  # the well-formed one still decodes


def test_decode_image_routes_png_natively():
    """decode_image must dispatch PNG to the stdlib decoder — no PIL
    involved — while unknown codecs still raise the gated error."""
    rows = _image(5, 5, lambda x, y: (x, y, (x + y) % 256))
    w, h, bpp, px = decode_image(encode_png(5, 5, rows))
    assert (w, h, bpp) == (5, 5, 24) and px == b"".join(rows)


def test_png_query_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["multimodal_png_decode"](spark, sf_dir),
        ORACLES["multimodal_png_decode"],
        sf_dir,
    )
