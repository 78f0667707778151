"""Tests for multimodal plumbing and streaming operators."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = [
    "multimodal_features",
    "multimodal_image_decode",
    "events_hourly_stream",
    "events_session_windows",
    "events_stream_dedup",
    "events_incremental_mv",
    "events_stream_static_join",
    "events_sliding_stream",
    "events_purchase_click_outer_join",
]


def test_domain_mix_quotas(spark, sf_dir):
    """Per-domain sample counts equal ceil(rate × domain size) exactly,
    and the kept set is the md5-order prefix (rk dense from 1)."""
    import math

    from pyspark.sql import functions as F

    from go_map_reduce_spark.catalog import load_table
    from go_map_reduce_spark.operators.textstats import (
        MIX_DEFAULT_RATE,
        MIX_RATES,
    )

    totals = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    rows = QUERIES["domain_mix_sampling"](spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["rk"])
    for lang, rks in by_lang.items():
        want = math.ceil(MIX_RATES.get(lang, MIX_DEFAULT_RATE) * totals[lang])
        assert len(rks) == want
        assert sorted(rks) == list(range(1, want + 1))


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_media_table_schema(spark, sf_dir):
    from go_map_reduce_spark.operators.multimodal import media_table

    mt = media_table(spark, sf_dir)
    dt = dict(mt.dtypes)
    assert dt["payload"] == "binary"
    assert dt["meta"].startswith("struct<")
    row = mt.limit(1).collect()[0]
    assert isinstance(row["payload"], (bytes, bytearray))


def test_decode_image_rejects_unrecognized_payloads():
    """BMP/PNG/JPEG (baseline + progressive) all decode natively now;
    anything else — including a payload that merely STARTS like a PNG
    signature — raises ValueError, the single documented exception
    type."""
    from go_map_reduce_spark.operators.multimodal import HAS_PIL, decode_image

    if not HAS_PIL:
        with pytest.raises(ValueError):
            decode_image(b"\x89PNG")


def test_bmp_roundtrip_and_golden():
    """The pure-Python BMP codec: encode→decode round-trip plus a golden
    header check (field offsets per the public BMP format spec)."""
    from go_map_reduce_spark.operators.multimodal import decode_bmp, encode_bmp

    rows = [bytes([y * 10 + x for x in range(3 * 3)]) for y in range(2)]
    payload = encode_bmp(3, 2, rows)
    # golden header fields: magic, data offset, width, height, bpp
    assert payload[:2] == b"BM"
    assert int.from_bytes(payload[10:14], "little") == 54
    assert int.from_bytes(payload[18:22], "little", signed=True) == 3
    assert int.from_bytes(payload[22:26], "little", signed=True) == 2
    assert int.from_bytes(payload[28:30], "little") == 24
    # 3*3=9 row bytes → stride padded to 12
    assert len(payload) == 54 + 2 * 12
    w, h, bpp, px = decode_bmp(payload)
    assert (w, h, bpp) == (3, 2, 24)
    assert px == b"".join(rows)  # padding stripped exactly


def test_decode_bmp_rejects_unsupported():
    from go_map_reduce_spark.operators.multimodal import decode_bmp, encode_bmp

    with pytest.raises(ValueError):
        decode_bmp(b"XX" + b"\x00" * 60)
    payload = bytearray(encode_bmp(2, 2, [b"\x00" * 6] * 2))
    payload[28] = 8  # bpp=8 → unsupported variant
    with pytest.raises(ValueError):
        decode_bmp(bytes(payload))


def test_streaming_matches_batch_windows(spark, sf_dir):
    """The streaming tumbling-window result must equal the batch
    formulation of the same aggregation (engine-internal differential)."""
    stream = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in QUERIES["events_hourly_stream"](spark, sf_dir).collect()
    }
    batch = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in QUERIES["events_hourly_windows"](spark, sf_dir).collect()
    }
    assert stream == batch


def test_stateful_user_totals_oracle(spark, sf_dir):
    compare(
        QUERIES["events_stateful_user_totals"](spark, sf_dir),
        ORACLES["events_stateful_user_totals"],
        sf_dir,
    )


def test_stream_stream_join_oracle(spark, sf_dir):
    compare(
        QUERIES["events_purchase_click_stream_join"](spark, sf_dir),
        ORACLES["events_purchase_click_stream_join"],
        sf_dir,
    )


def test_wav_codec_roundtrip():
    """encode_wav → decode_wav is the identity on rate/channels/frames
    and sample bytes, including odd-length (word-padded) data chunks."""
    import struct

    from go_map_reduce_spark.operators.multimodal import decode_wav, encode_wav

    frames = [[i * 3 - 40, -i] for i in range(11)]
    payload = encode_wav(2, 16000, frames)
    rate, channels, n_frames, data = decode_wav(payload)
    assert (rate, channels, n_frames) == (16000, 2, 11)
    got = list(struct.unpack(f"<{2 * 11}h", data))
    assert got == [v for fr in frames for v in fr]


def test_wav_decoder_rejects_garbage():
    import pytest as _pytest

    from go_map_reduce_spark.operators.multimodal import decode_wav

    with _pytest.raises(ValueError):
        decode_wav(b"not a riff file at all....")


def test_audio_decode_oracle(spark, sf_dir):
    from go_map_reduce_spark.registry import ORACLES, QUERIES

    from tests.oracle_util import compare

    compare(
        QUERIES["multimodal_audio_decode"](spark, sf_dir),
        ORACLES["multimodal_audio_decode"],
        sf_dir,
    )


def test_video_container_roundtrip():
    """encode_video → decode_video_frames yields exactly the sampled
    frames with intact dims and pixels."""
    from go_map_reduce_spark.operators.multimodal import (
        decode_video_frames,
        encode_bmp,
        encode_video,
    )

    frames = [
        encode_bmp(w, 2, [bytes([10 * w] * (3 * w)), bytes([7] * (3 * w))])
        for w in (3, 4, 5, 6, 7)
    ]
    clip = encode_video(frames)
    got = list(decode_video_frames(clip, every=2))
    assert [i for i, _ in got] == [0, 2, 4]
    assert [d[0] for _, d in got] == [3, 5, 7]
    assert all(d[1] == 2 for _, d in got)


def test_video_framesample_oracle(spark, sf_dir):
    from go_map_reduce_spark.registry import ORACLES, QUERIES

    from tests.oracle_util import compare

    compare(
        QUERIES["multimodal_video_framesample"](spark, sf_dir),
        ORACLES["multimodal_video_framesample"],
        sf_dir,
    )


def test_bmp_forged_dimensions_fail_closed():
    """A crafted header declaring huge (or zero/negative) dimensions
    must raise ValueError BEFORE any allocation proportional to them —
    the declared pixel array has to fit inside the actual payload."""
    import struct

    from go_map_reduce_spark.operators.multimodal import decode_bmp

    def header(width, height):
        return (
            struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54)
            + struct.pack("<IiiHHI", 40, width, height, 1, 24, 0)
            + struct.pack("<II", 0, 0)  # pad header to 40 bytes
            + bytes(12)
        )

    for w, h in ((1, 2**30), (2**20, 2**20), (0, 8), (8, 0), (-4, 8)):
        with pytest.raises(ValueError):
            decode_bmp(header(w, h) + bytes(16))
