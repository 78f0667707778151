"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched pandas UDFs via mapInPandas.

Pattern (the 100 TB design): media lives as a `binary` column (or an
object-store URI column) beside typed metadata; decode / feature-extract
/ resize / frame-sample run as `mapInPandas` stages — per-partition
Arrow batches into Python, vectorized work, Arrow back. Partitioning is
inherited from the table scan, so media work scales exactly like any
other narrow transformation: no shuffle, executor-local, bounded-memory
batches (spark.sql.execution.arrow.maxRecordsPerBatch).

The general image/audio codec libraries are NOT in this container.
Uncompressed 24-bit BMP, COMPRESSED 8-bit truecolor PNG, and JPEG
(baseline SOF0 and progressive SOF2) all decode for real with
dependency-free pure-Python parsers (`decode_bmp` — magic number, DIB
header, row padding; `decode_png` — chunk walk with CRC verification,
stdlib-zlib DEFLATE inflate, and all five scanline filter
reconstructions; `functions/jpegcodec.py` — the full T.81 pipeline),
each exercised end-to-end by its own gated query. The PIL import-try
in `decode_image` survives only as an optional fallback for layouts
outside the native scope (12-bit, arithmetic-coded). The Spark-side
plumbing — BinaryType schema, UDF signature, batch iteration — is
identical for every tier.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.registry import query

try:  # codec libs are absent in this environment; gate, don't import-fail
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except Exception:
    HAS_PIL = False


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal table shape: doc_id, a binary payload, and typed
    metadata. Payloads here are the documents' UTF-8 bytes standing in
    for image/audio blobs — the schema and execution path are the real
    thing, the codec is what's faked."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.col("n_chars").alias("n_chars"),
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def _np():
    import numpy

    return numpy


def decode_image(payload: bytes):
    """Decode a binary payload into (width, height, bpp, pixel_bytes).

    Uncompressed 24-bit BMP, 8-bit truecolor PNG, and JPEG (baseline
    SOF0 and progressive SOF2, in grayscale / 4:4:4 / 4:2:0 / 4:2:2 /
    4:4:0) all decode natively with the pure-Python codecs in this
    package — no PIL.
    Every codec normalizes malformed-payload failures to ValueError; an
    unrecognized or unsupported payload raises ValueError so callers
    need exactly one exception type. When PIL happens to be installed
    it serves only as a fallback for layouts outside the native scope
    (e.g. 12-bit or arithmetic-coded JPEG).
    """
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from go_map_reduce_spark.functions.jpegcodec import decode_jpeg

        try:
            return decode_jpeg(payload)
        except ValueError:
            if not HAS_PIL:
                raise
    if not HAS_PIL:
        raise ValueError("unrecognized image payload")
    import io

    try:
        img = Image.open(io.BytesIO(payload))
        return (img.width, img.height, 24, img.tobytes())
    except ValueError:
        raise
    except Exception as ex:  # PIL raises UnidentifiedImageError/OSError
        raise ValueError(f"unrecognized image payload: {ex!r}") from ex


# --- pure-Python uncompressed-BMP codec (BITMAPINFOHEADER, BI_RGB) -------
# The real decoder exercised by `multimodal_image_decode`: actual magic /
# offset / dimension / padding parsing, not a fake. Kept dependency-free
# so the decode tier works in codec-less containers.

_BMP_DATA_OFFSET = 54  # 14-byte file header + 40-byte BITMAPINFOHEADER


def encode_bmp(width: int, height: int, rows: list[bytes]) -> bytes:
    """Encode bottom-up 24-bit rows (each ``width*3`` BGR bytes) as BMP."""
    import struct

    pad = (4 - (width * 3) % 4) % 4
    body = b"".join(r + b"\x00" * pad for r in rows)
    size = _BMP_DATA_OFFSET + len(body)
    file_header = struct.pack("<2sIHHI", b"BM", size, 0, 0, _BMP_DATA_OFFSET)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return file_header + dib + body


def decode_bmp(payload: bytes) -> tuple[int, int, int, bytes]:
    """Parse an uncompressed 24-bit BMP: returns (width, height, bpp,
    pixel bytes with row padding stripped, bottom-up row order).
    Malformed payloads — truncated headers, non-positive or forged
    dimensions, pixel data that doesn't fit the payload — raise
    ValueError (never an allocation proportional to a forged height
    field)."""
    import struct

    try:
        magic, _size, _r1, _r2, offset = struct.unpack_from("<2sIHHI", payload, 0)
        if magic != b"BM":
            raise ValueError("not a BMP payload")
        (hdr_size, width, height, _planes, bpp, compression) = struct.unpack_from(
            "<IiiHHI", payload, 14
        )
    except struct.error as ex:
        raise ValueError(f"malformed BMP header: {ex!r}") from ex
    if hdr_size < 40 or compression != 0 or bpp != 24:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    if height < 0:  # negative height = top-down row order
        height = -height
    row_bytes = width * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    # dimension sanity BEFORE any allocation proportional to them: the
    # declared pixel array must fit inside the payload, which bounds
    # height at len(payload) // stride
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid BMP dimensions {width}x{height}")
    if offset + stride * height > len(payload):
        raise ValueError(f"BMP pixel data ({width}x{height}) exceeds payload")
    rows = [
        payload[offset + y * stride : offset + y * stride + row_bytes]
        for y in range(height)
    ]
    return width, height, bpp, b"".join(rows)


def _payload_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic byte-level 'feature extractor' (the decode stand-in):
    size, first byte, md5 checksum. Runs per Arrow batch — the exact
    execution shape a real decoder (decode → resize → embed) uses."""
    import hashlib

    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "head_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype(
                    "int64"
                ),
                "checksum": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
            }
        )


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           CAST(CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1))
                     ELSE -1 END AS BIGINT) AS head_byte,
           md5(text) AS checksum
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction through the real multimodal path:
    BinaryType payload → mapInPandas (Arrow batches) → typed features.
    The oracle recomputes the same byte-level features in SQL (payload is
    the UTF-8 encoding of `text`, so octet_length/ascii/md5 agree
    byte-for-byte)."""
    from go_map_reduce_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    media = media_table(spark, sf_dir).select("doc_id", "payload")
    return media.mapInPandas(
        _payload_features,
        schema="doc_id long, n_bytes long, head_byte long, checksum string",
    )


def _synth_bmp_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Encode one deterministic BMP per doc: dims and pixel values are
    closed-form in doc_id (row y is solid gray (doc_id + y) % 256), so
    the SQL oracle can predict the decoded features without a codec."""
    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            w, h = 8 + doc_id % 9, 8 + doc_id % 7
            rows = [bytes([(doc_id + y) % 256] * (3 * w)) for y in range(h)]
            payloads.append(encode_bmp(w, h, rows))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def _decode_bmp_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The decode stage: parse each BMP payload (magic, offsets, padding)
    and emit typed image features."""
    for pdf in batches:
        out = {"doc_id": [], "width": [], "height": [], "bpp": [], "pixel_sum": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, bpp, px = decode_image(bytes(payload))
            out["doc_id"].append(doc_id)
            out["width"].append(w)
            out["height"].append(h)
            out["bpp"].append(bpp)
            out["pixel_sum"].append(int(_np().frombuffer(px, "uint8").sum()))
        yield pd.DataFrame(out)


@query(
    "multimodal_image_decode",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h FROM documents
    ),
    rows_ AS (SELECT doc_id, w, h, unnest(range(h)) AS y FROM dims)
    SELECT doc_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(24 AS BIGINT) AS bpp,
           CAST(SUM(((doc_id + y) % 256) * 3 * w) AS BIGINT) AS pixel_sum
    FROM rows_
    GROUP BY doc_id, w, h
    """,
)
def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode through the multimodal path: synthesize an
    uncompressed 24-bit BMP per document (mapInPandas encode stage),
    then parse it back (mapInPandas decode stage — actual magic-number /
    DIB-header / row-padding parsing via ``decode_bmp``) into typed
    features. The oracle predicts the decoded values from the synthesis
    closed form — if the decoder misreads a header field or mis-strips
    row padding, width/height/pixel_sum diverge.

    Two narrow mapInPandas stages, no shuffle: media decode scales like
    any narrow transformation, partitioned by the upstream scan."""
    from go_map_reduce_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    media = ids.mapInPandas(_synth_bmp_batch, schema="doc_id long, payload binary")
    return media.mapInPandas(
        _decode_bmp_batch,
        schema="doc_id long, width long, height long, bpp long, pixel_sum long",
    )


# --- pure-Python WAV (RIFF/PCM-16) codec ----------------------------------
# The audio tier's real decoder: actual RIFF chunk walking, fmt parsing,
# and little-endian PCM frame extraction — dependency-free, so audio
# decode works in codec-less containers exactly like the BMP tier.

WAV_RATE = 8000


def encode_wav(channels: int, rate: int, frames: list[list[int]]) -> bytes:
    """Encode interleaved PCM-16 frames (each frame = one int per
    channel) as a canonical RIFF/WAVE file."""
    import struct

    # One numpy cast replaces the per-frame struct.pack loop ('<i2' is
    # exactly '<h'); out-of-range samples keep struct.pack's error by
    # falling back to it, so callers see identical bytes AND identical
    # failures.
    import numpy as np

    try:
        arr = np.asarray(frames)
    except (ValueError, TypeError):  # ragged/typed-wrong input
        arr = None
    if arr is not None and not np.issubdtype(arr.dtype, np.integer):
        # non-integer samples (e.g. 1.5): struct.pack('<h') raises
        # struct.error — a forced int64 cast would silently truncate
        # (r14 ADVICE), so route non-integer input to the strict path
        arr = None
    if arr is None or arr.ndim != 2 or arr.shape[1] != channels or (
        arr.size and (arr.min() < -32768 or arr.max() > 32767)
    ):
        body = b"".join(
            struct.pack(f"<{channels}h", *fr) for fr in frames
        )
    else:
        body = arr.astype("<i2").tobytes()
    block = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, 16)
    data = struct.pack("<4sI", b"data", len(body)) + body
    riff_body = b"WAVE" + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt + data
    return struct.pack("<4sI", b"RIFF", len(riff_body)) + riff_body


def decode_wav(payload: bytes) -> tuple[int, int, int, bytes]:
    """Parse a RIFF/WAVE PCM-16 payload by walking its chunks: returns
    (sample_rate, n_channels, n_frames, raw little-endian sample bytes).
    Raises on non-PCM or missing chunks — a misread header can't pass
    silently."""
    import struct

    magic, _size, wave = struct.unpack_from("<4sI4s", payload, 0)
    if magic != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, clen = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _brate, block, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    return rate, channels, len(data) // block, data


def _synth_wav_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One deterministic WAV per doc: channel count, frame count, and
    every sample value are closed-form in doc_id, so the SQL oracle can
    predict the decoded features without any audio library."""
    np = _np()
    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            channels = 1 + doc_id % 2
            n_frames = 64 + doc_id % 33
            # numpy form of the closed-form comprehension: same values
            i = np.arange(n_frames, dtype=np.int64)[:, None]
            c = np.arange(channels, dtype=np.int64)[None, :]
            frames = ((int(doc_id) + 13 * i + 7 * c) % 2048) - 1024
            payloads.append(encode_wav(channels, WAV_RATE, frames))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def _decode_wav_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The decode stage: chunk-walk each WAV and emit typed audio
    features (rate, channels, frames, integer-exact mean-abs energy)."""
    import numpy as np

    for pdf in batches:
        out = {
            "doc_id": [],
            "sample_rate": [],
            "n_channels": [],
            "n_frames": [],
            "sum_abs": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            rate, channels, n_frames, data = decode_wav(bytes(payload))
            samples = np.frombuffer(data, dtype="<i2").astype("int64")
            out["doc_id"].append(doc_id)
            out["sample_rate"].append(rate)
            out["n_channels"].append(channels)
            out["n_frames"].append(n_frames)
            out["sum_abs"].append(int(np.abs(samples).sum()))
        yield pd.DataFrame(out)


@query(
    "multimodal_audio_decode",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id, 1 + doc_id % 2 AS channels, 64 + doc_id % 33 AS f
      FROM documents
    ),
    samples AS (
      SELECT d.doc_id, d.channels, d.f,
             abs(((d.doc_id + 13 * i.i + 7 * c.c) % 2048) - 1024) AS a
      FROM dims d,
           LATERAL (SELECT unnest(range(d.f)) AS i) i,
           LATERAL (SELECT unnest(range(d.channels)) AS c) c
    )
    SELECT doc_id,
           CAST({WAV_RATE} AS BIGINT) AS sample_rate,
           CAST(channels AS BIGINT) AS n_channels,
           CAST(f AS BIGINT) AS n_frames,
           CAST(SUM(a) AS BIGINT) AS sum_abs
    FROM samples
    GROUP BY doc_id, channels, f
    """,
)
def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode through the multimodal path: synthesize a
    RIFF/WAVE PCM-16 payload per document (mono or stereo, closed-form
    samples), then parse it back — actual chunk walking, fmt parsing,
    and frame extraction via ``decode_wav`` — into typed audio features.
    The oracle predicts rate/channels/frames/energy from the synthesis
    closed form; a mis-walked chunk or byte-order slip diverges sum_abs.

    Same execution shape as the image tier: two narrow mapInPandas
    stages (encode, decode), zero shuffle, Arrow-batched binary
    columns. Compressed codecs (mp3/flac) stay gated behind import-try
    exactly like non-BMP images."""
    from go_map_reduce_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    media = ids.mapInPandas(_synth_wav_batch, schema="doc_id long, payload binary")
    return media.mapInPandas(
        _decode_wav_batch,
        schema=(
            "doc_id long, sample_rate long, n_channels long, "
            "n_frames long, sum_abs long"
        ),
    )


# --- video tier: frame container + sampled decode -------------------------
# No pure-Python video codec exists, so the container is an honest
# invented format (magic, frame count, offset table, BMP frames) and the
# SAMPLING + per-frame decode is the real machinery: offset-table walk,
# every-Kth-frame selection, full BMP parse per sampled frame. Compressed
# video (h264 etc.) stays gated exactly like compressed images/audio.

VID_MAGIC = b"GMRV"
VID_SAMPLE_EVERY = 2  # decode every 2nd frame


def encode_video(frames: list[bytes]) -> bytes:
    """Container layout: magic, u32 frame count, u32 offset per frame
    (from payload start), then the concatenated BMP frames."""
    import struct

    header = struct.pack("<4sI", VID_MAGIC, len(frames))
    table_size = 4 * len(frames)
    offsets, pos = [], len(header) + table_size
    for fr in frames:
        offsets.append(pos)
        pos += len(fr)
    table = struct.pack(f"<{len(frames)}I", *offsets) if frames else b""
    return header + table + b"".join(frames)


def decode_video_frames(payload: bytes, every: int = VID_SAMPLE_EVERY):
    """Walk the offset table and yield (frame_index, decoded BMP) for
    every ``every``-th frame — the frame-sampling read pattern: only
    sampled frames are parsed, the rest are skipped by offset."""
    import struct

    magic, n = struct.unpack_from("<4sI", payload, 0)
    if magic != VID_MAGIC:
        raise ValueError("not a GMRV container")
    offsets = struct.unpack_from(f"<{n}I", payload, 8)
    bounds = list(offsets) + [len(payload)]
    for idx in range(0, n, every):
        frame = payload[bounds[idx] : bounds[idx + 1]]
        yield idx, decode_bmp(frame)


def _synth_video_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One deterministic clip per doc: frame count and every frame's
    dims/pixels are closed-form in (doc_id, frame index)."""
    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            n_frames = 4 + doc_id % 5
            frames = []
            for t in range(n_frames):
                w, h = 4 + (doc_id + t) % 5, 3 + (doc_id + t) % 4
                rows = [
                    bytes([(doc_id + t + y) % 256] * (3 * w)) for y in range(h)
                ]
                frames.append(encode_bmp(w, h, rows))
            payloads.append(encode_video(frames))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def _framesample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {
            "doc_id": [],
            "n_frames": [],
            "n_sampled": [],
            "sampled_pixel_sum": [],
        }
        import struct

        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            _, n = struct.unpack_from("<4sI", payload, 0)
            total, count = 0, 0
            for _idx, (w, h, _bpp, px) in decode_video_frames(payload):
                total += int(_np().frombuffer(px, "uint8").sum())
                count += 1
            out["doc_id"].append(doc_id)
            out["n_frames"].append(n)
            out["n_sampled"].append(count)
            out["sampled_pixel_sum"].append(total)
        yield pd.DataFrame(out)


@query(
    "multimodal_video_framesample",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id, 4 + doc_id % 5 AS n_frames FROM documents
    ),
    sampled AS (
      SELECT d.doc_id, d.n_frames, t.t,
             4 + (d.doc_id + t.t) % 5 AS w,
             3 + (d.doc_id + t.t) % 4 AS h
      FROM dims d, LATERAL (SELECT unnest(range(d.n_frames)) AS t) t
      WHERE t.t % {VID_SAMPLE_EVERY} = 0
    ),
    px AS (
      SELECT doc_id, n_frames, t, w, h,
             ((doc_id + t + y.y) % 256) * 3 * w AS row_sum
      FROM sampled, LATERAL (SELECT unnest(range(h)) AS y) y
    )
    SELECT doc_id,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(COUNT(DISTINCT t) AS BIGINT) AS n_sampled,
           CAST(SUM(row_sum) AS BIGINT) AS sampled_pixel_sum
    FROM px
    GROUP BY doc_id, n_frames
    """,
)
def multimodal_video_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampled video decode through the multimodal path: build a
    per-doc frame container (magic + offset table + BMP frames), then
    sample every {VID_SAMPLE_EVERY}nd frame by OFFSET — unsampled frames
    are never parsed, the sampling cost is proportional to frames kept,
    exactly how production frame samplers seek keyframes — and fully
    decode each sampled frame. The oracle predicts frame count, sampled
    count, and the sampled pixel mass from the synthesis closed form.

    Same scale shape as the other decode tiers: narrow mapInPandas
    stages, zero shuffle."""
    from go_map_reduce_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    media = ids.mapInPandas(
        _synth_video_batch, schema="doc_id long, payload binary"
    )
    return media.mapInPandas(
        _framesample_batch,
        schema=(
            "doc_id long, n_frames long, n_sampled long, "
            "sampled_pixel_sum long"
        ),
    )


def resize_bmp_nearest(payload: bytes, factor: int = 2) -> bytes:
    """Nearest-neighbor downsample of an uncompressed 24-bit BMP by an
    integer factor: keep every ``factor``-th row and column (indices
    0, factor, 2·factor, …), re-encode. Pure bytes — no codec library."""
    w, h, _bpp, px = decode_bmp(payload)
    new_w = (w + factor - 1) // factor
    rows = []
    for y in range(0, h, factor):
        row = px[y * w * 3 : (y + 1) * w * 3]
        rows.append(b"".join(row[3 * x : 3 * x + 3] for x in range(0, w, factor)))
    return encode_bmp(new_w, len(rows), rows)


def _resize_bmp_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The resize stage: payload → smaller payload, still a valid BMP
    (the downstream decode stage parses it like any other image)."""
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload": [
                    resize_bmp_nearest(bytes(p)) for p in pdf["payload"]
                ],
            }
        )


@query(
    "multimodal_image_resize",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h,
             (8 + doc_id % 9 + 1) // 2 AS w2,
             (8 + doc_id % 7 + 1) // 2 AS h2
      FROM documents
    ),
    rows_ AS (SELECT doc_id, w2, h2, unnest(range(h2)) AS j FROM dims)
    SELECT doc_id,
           CAST(w2 AS BIGINT) AS width,
           CAST(h2 AS BIGINT) AS height,
           CAST(24 AS BIGINT) AS bpp,
           CAST(SUM(((doc_id + 2 * j) % 256) * 3 * w2) AS BIGINT) AS pixel_sum
    FROM rows_
    GROUP BY doc_id, w2, h2
    """,
)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE through the multimodal path: synthesize a BMP per
    document, nearest-neighbor-downsample it 2× (a real bytes-level
    resample — row/column subsampling with re-encode, padding and all),
    then decode the RESIZED payload into features. Three narrow
    mapInPandas stages (synth → resize → decode), zero shuffles — the
    standard shape of a media-preprocessing stage feeding a vision
    tokenizer, where each stage stays Arrow-batched and per-partition.

    The oracle predicts the resized dims (ceil-half) and the pixel
    checksum of the sampled rows (row 2j keeps value (doc_id+2j)%256)
    in closed form — a mis-sampled row or broken re-encode diverges."""
    from go_map_reduce_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    media = ids.mapInPandas(_synth_bmp_batch, schema="doc_id long, payload binary")
    resized = media.mapInPandas(
        _resize_bmp_batch, schema="doc_id long, payload binary"
    )
    return resized.mapInPandas(
        _decode_bmp_batch,
        schema="doc_id long, width long, height long, bpp long, pixel_sum long",
    )


# --- pure-Python PNG (RFC 2083) codec -------------------------------------
# The compressed-image tier's real decoder: PNG is DEFLATE-compressed
# (stdlib zlib) + per-scanline prediction filters, so unlike JPEG it is
# fully decodable with the standard library — chunk walking with CRC
# verification, IHDR parsing, zlib inflate, and all five filter
# reconstructions (None/Sub/Up/Average/Paeth). This closed the
# compressed-codec gap natively; round 5 finished the job on the DCT
# side too (functions/jpegcodec.py — baseline + progressive JPEG).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_BPP = 3  # color type 2 (truecolor), bit depth 8


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(width: int, height: int, rows: list[bytes]) -> bytes:
    """Encode top-down 8-bit RGB rows (each ``width*3`` bytes) as PNG.
    Row y gets filter type y % 5, so every reconstruction path
    (None/Sub/Up/Average/Paeth) is exercised by any multi-row image —
    the decoder can't pass by special-casing filter 0.

    All five filter predictions read only ORIGINAL bytes (left/up/
    up-left of the unfiltered image), so the whole filter pass is
    computed as vectorized byte arithmetic over the stacked rows —
    per-byte Python looping was the dominant cost of every PNG-emitting
    media query. Output bytes are identical: same filter choice per
    row, same mod-256 residuals, same single zlib.compress call."""
    import struct
    import zlib

    import numpy as np

    bpp = _PNG_BPP
    stride = width * bpp
    arr = (
        np.frombuffer(b"".join(rows), dtype=np.uint8)
        .reshape(height, stride)
        .astype(np.int32)
    )
    b = np.zeros_like(arr)
    b[1:] = arr[:-1]  # up
    a = np.zeros_like(arr)
    a[:, bpp:] = arr[:, :-bpp]  # left
    c = np.zeros_like(arr)
    c[:, bpp:] = b[:, :-bpp]  # up-left
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    paeth = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    preds = (np.zeros_like(arr), a, b, (a + b) >> 1, paeth)
    f = np.arange(height) % 5
    pred = np.empty_like(arr)
    for fi in range(5):
        rows_f = f == fi
        pred[rows_f] = preds[fi][rows_f]
    raw = np.empty((height, stride + 1), dtype=np.uint8)
    raw[:, 0] = f
    raw[:, 1:] = (arr - pred) & 0xFF
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw.tobytes()))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """Parse an 8-bit truecolor PNG: signature, chunk walk with CRC
    verification, IHDR, zlib-inflated IDAT, and per-scanline filter
    reconstruction. Malformed payloads (truncated chunks, bad DEFLATE
    data) raise ValueError. Returns (width, height, bits-per-pixel,
    top-down pixel bytes)."""
    import struct
    import zlib

    try:
        return _decode_png_impl(payload)
    except (IndexError, struct.error, zlib.error) as ex:
        raise ValueError(f"malformed PNG stream: {ex!r}") from ex


def _decode_png_impl(payload: bytes) -> tuple[int, int, int, bytes]:
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, width = 8, None
    height = None
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG variant "
                    f"(depth={depth}, color={color}, interlace={interlace})"
                )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    bpp, stride = _PNG_BPP, width * _PNG_BPP
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    # Unfilter row by row (each row's reconstruction feeds the next).
    # None/Sub/Up reconstruct as whole-row vector ops (Sub is a
    # per-channel running sum mod 256); Average and Paeth recurrences
    # genuinely depend on the just-reconstructed left neighbor, so those
    # rows (2 of every 5 from this package's encoder) stay as tight
    # Python loops over ints. Identical arithmetic mod 256 throughout.
    import numpy as np

    mat = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        f = int(mat[y, 0])
        line = mat[y, 1:].astype(np.int64)
        if f == 0:
            cur = line
        elif f == 1:
            cur = np.cumsum(line.reshape(-1, bpp), axis=0) & 0xFF
            cur = cur.reshape(-1)
        elif f == 2:
            cur = (line + prev) & 0xFF
        elif f == 3:
            lv, pv = line.tolist(), prev.tolist()
            cv = [(lv[j] + (pv[j] >> 1)) & 0xFF for j in range(bpp)]
            for j in range(bpp, stride):
                cv.append((lv[j] + ((cv[j - bpp] + pv[j]) >> 1)) & 0xFF)
            cur = np.array(cv, dtype=np.int64)
        elif f == 4:
            lv, pv = line.tolist(), prev.tolist()
            cv = [0] * stride
            for j in range(stride):
                a = cv[j - bpp] if j >= bpp else 0
                b = pv[j]
                c = pv[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - c if p >= c else c - p
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cv[j] = (lv[j] + pred) & 0xFF
            cur = np.array(cv, dtype=np.int64)
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return width, height, 8 * bpp, out.tobytes()


def _synth_png_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One deterministic RGB PNG per doc: dims and pixels are closed-form
    in doc_id (pixel (x,y) = ((doc_id+x)%256, (doc_id+y)%256, (x*y)%256))
    so the SQL oracle predicts the decoded features with no codec."""
    np = _np()
    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            w, h = 8 + doc_id % 9, 8 + doc_id % 7
            # numpy form of the per-pixel closed form: same row bytes
            x = np.arange(w, dtype=np.int64)
            y = np.arange(h, dtype=np.int64)
            rgb = np.empty((h, w, 3), dtype=np.uint8)
            rgb[:, :, 0] = ((int(doc_id) + x) % 256)[None, :]
            rgb[:, :, 1] = ((int(doc_id) + y) % 256)[:, None]
            rgb[:, :, 2] = (x[None, :] * y[:, None]) % 256
            rows = [rgb[yy].tobytes() for yy in range(h)]
            payloads.append(encode_png(w, h, rows))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def _decode_png_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {"doc_id": [], "width": [], "height": [], "bpp": [], "pixel_sum": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, bpp, px = decode_png(bytes(payload))
            out["doc_id"].append(doc_id)
            out["width"].append(w)
            out["height"].append(h)
            out["bpp"].append(bpp)
            out["pixel_sum"].append(int(_np().frombuffer(px, "uint8").sum()))
        yield pd.DataFrame(out)


@query(
    "multimodal_png_decode",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h FROM documents
    ),
    px AS (
      SELECT doc_id, w, h, y, unnest(range(w)) AS x
      FROM (SELECT doc_id, w, h, unnest(range(h)) AS y FROM dims)
    )
    SELECT doc_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(24 AS BIGINT) AS bpp,
           CAST(SUM((doc_id + x) % 256 + (doc_id + y) % 256 + (x * y) % 256)
                AS BIGINT) AS pixel_sum
    FROM px
    GROUP BY doc_id, w, h
    """,
)
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode through the multimodal path: a
    deterministic RGB PNG per document (encode stage cycles all five
    PNG scanline filters), parsed back by the dependency-free
    ``decode_png`` — DEFLATE inflate, chunk CRC verification, and
    Sub/Up/Average/Paeth reconstruction, not a fake. The oracle
    predicts width/height/bpp/pixel_sum from the synthesis closed
    form: any filter-reconstruction or inflate mistake diverges
    pixel_sum. Same two narrow mapInPandas stages as the BMP tier —
    compressed media decode is still a shuffle-free map at 100 TB.
    (JPEG decodes natively too — baseline and progressive, see
    ``multimodal_jpeg_decode``.)"""
    from go_map_reduce_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    media = ids.mapInPandas(_synth_png_batch, schema="doc_id long, payload binary")
    return media.mapInPandas(
        _decode_png_batch,
        schema="doc_id long, width long, height long, bpp long, pixel_sum long",
    )
