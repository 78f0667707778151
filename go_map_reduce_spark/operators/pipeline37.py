"""Round-13 composed-transform media dedup (the r12 verdict's task 2).

Every robustness axis closed so far is exact in ISOLATION — codec
(pipeline33), channel layout + amplitude (pipeline33), time shift and
spatial framing (pipeline34), container/temporal pads (pipeline35),
sample rate and resolution (pipeline36).  A real crawl composes them:
a re-hosted audio clip arrives resampled AND remixed AND remastered in
one pipeline pass; a thumbnail arrives rescaled AND re-encoded under a
different (even lossy) codec.  These two tiers pin that the engine's
fingerprints collapse MULTI-axis variants, and — the load-bearing
point — that they do so BY ALGEBRA, not by luck: every axis multiplies
the windowed statistic and its normalizer by the same constant, the
constants multiply through COMPOSITION, and the product cancels inside
the same integer floor-division / strict comparison that made each
axis exact alone.

  audio: ZOH resample by k repeats each base sample k times (energy
  ×k), duplicating the channel doubles the mixdown sum (energy ×4),
  amplitude a scales energy ×a² — a composed variant scales every
  rate-aware frame energy and the total by the SAME k·4·a², so
  digit_f = e_f·Q // total is invariant under the full composition.

  image: a k×k nearest-neighbor upsample scales every scale-aware
  hash cell sum and the image total by k²; a codec change (BMP / PNG /
  baseline JPEG with all-ones quant on (8k)x(8k)-block-constant
  pixels) is bit-exact through decode; brightness jitter cancels in
  the strict 64·cellsum > total comparison.  Composition leaves every
  hash bit untouched.

Reference anchor: the reference's whole-file opaque-input contract
(mr/worker.go:76-94), upgraded to content identity under composed
re-encodings — the commonest real-crawl duplicate shape.

Composition queries import tier functions directly (package
convention: the staleness closure must see the edges)."""

from __future__ import annotations

import functools
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.operators.pipeline33 import AUD_Q, _spread_ids
from go_map_reduce_spark.registry import query

# --------------------------------------------------------------------------
# Composed audio dedup: resample x layout x amplitude
# --------------------------------------------------------------------------

ACD_RESIDUES = 16  # doc_id % 16 picks the waveform content
ACD_BASE_RATE = 8000
ACD_FRAMES = 8
ACD_FRAME_LEN = 16  # BASE-rate samples per fingerprint frame
ACD_CONTENT = ACD_FRAMES * ACD_FRAME_LEN  # 128 base samples
# variant -> (rate factor k, channels, amplitude): all but 'base'
# compose TWO axes at once.
ACD_VARIANTS = {
    "base": (1, 1, 1),
    "rs2_stereo": (2, 2, 1),  # resampled AND remixed
    "rs4_loud": (4, 1, 3),  # resampled AND remastered
    "stereo_loud": (1, 2, 3),  # remixed AND remastered
}
_ACD_ORDER = ("base", "rs2_stereo", "rs4_loud", "stereo_loud")


@functools.lru_cache(maxsize=ACD_RESIDUES)
def _acd_samples(res: int) -> tuple[int, ...]:
    """Closed-form base waveform: 128 PCM-16 samples in [-500, 500) —
    headroom for the x3 amplitude variant (|v| <= 499*3 = 1497) to
    stay far inside int16."""
    return tuple(
        (47 * res + 19 * t) % 1000 - 500 for t in range(ACD_CONTENT)
    )


def _acd_synth_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Encode the SAME closed-form waveform under the composed variant
    (doc_id // {ACD_RESIDUES}) % 4 selects (decoupled from the content
    residue — the pipeline34 coupled-key lesson): zero-order-hold
    upsample by k (each base sample repeated k times), channel
    duplication for stereo, integer amplitude scale.  The four
    payloads are byte-distinct RIFF files across three rates, two
    channel layouts and two amplitudes."""
    import numpy as np

    from go_map_reduce_spark.operators.multimodal import encode_wav

    for pdf in batches:
        payloads, variants = [], []
        for doc_id in pdf["doc_id"]:
            s = _acd_samples(doc_id % ACD_RESIDUES)
            variant = _ACD_ORDER[(doc_id // ACD_RESIDUES) % 4]
            k, channels, amp = ACD_VARIANTS[variant]
            # numpy form of [[amp*v]*channels for v in s for _ in
            # range(k)] — ZOH upsample, channel dup, amplitude scale
            frames = np.repeat(
                amp * np.asarray(s, dtype=np.int64), k
            )[:, None].repeat(channels, axis=1)
            payloads.append(encode_wav(channels, ACD_BASE_RATE * k, frames))
            variants.append(variant)
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "variant": variants, "payload": payloads}
        )


def _acd_fingerprint_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """REAL RIFF decode, then the fully composed-invariant envelope:
    channel-SUM mixdown (layout axis), RATE-AWARE frame length
    {ACD_FRAME_LEN}·k for the integer factor k = rate/base (resample
    axis), energy digits e_f·Q // total (amplitude axis).  A composed
    variant multiplies every e_f and the total by k·(channels²)·amp²
    — one constant, cancelled exactly by the floor division."""
    import numpy as np

    from go_map_reduce_spark.operators.multimodal import decode_wav

    for pdf in batches:
        out = {"doc_id": [], "variant": [], "cfp": []}
        for doc_id, variant, payload in zip(
            pdf["doc_id"], pdf["variant"], pdf["payload"]
        ):
            rate, channels, n_frames, data = decode_wav(bytes(payload))
            if rate % ACD_BASE_RATE != 0:
                raise ValueError(f"non-integer resample factor: {rate}")
            k = rate // ACD_BASE_RATE
            if n_frames != ACD_CONTENT * k:
                raise ValueError(f"unexpected frame count {n_frames}")
            v = (
                np.frombuffer(data, dtype="<i2")
                .astype(np.int64)
                .reshape(n_frames, channels)
                .sum(axis=1)
            )
            e = (v * v).reshape(ACD_FRAMES, ACD_FRAME_LEN * k).sum(axis=1)
            total = int(e.sum())
            if total == 0:
                raise ValueError("silent payload — fingerprint undefined")
            digits = [int(x) * AUD_Q // total for x in e]
            out["doc_id"].append(doc_id)
            out["variant"].append(variant)
            out["cfp"].append("-".join(f"{d:04d}" for d in digits))
        yield pd.DataFrame(out)


@query(
    "audio_composed_dedup",
    oracle=f"""
    WITH acd_docs AS (
      SELECT doc_id, doc_id % {ACD_RESIDUES} AS res,
             CASE (doc_id // {ACD_RESIDUES}) % 4
                  WHEN 0 THEN 'base' WHEN 1 THEN 'rs2_stereo'
                  WHEN 2 THEN 'rs4_loud' ELSE 'stereo_loud' END AS variant
      FROM documents
    ),
    acd_samples AS (
      SELECT res, t // {ACD_FRAME_LEN} AS f,
             (47 * res + 19 * t) % 1000 - 500 AS v
      FROM (SELECT DISTINCT res FROM acd_docs),
           range({ACD_CONTENT}) u(t)
    ),
    acd_fe AS (
      SELECT res, f, SUM(v * v) AS e FROM acd_samples GROUP BY res, f
    ),
    acd_tot AS (SELECT res, SUM(e) AS total FROM acd_fe GROUP BY res),
    acd_fp AS (
      SELECT acd_fe.res,
             string_agg(lpad(CAST(acd_fe.e * {AUD_Q} // t.total AS VARCHAR),
                             4, '0'), '-' ORDER BY acd_fe.f) AS cfp
      FROM acd_fe JOIN acd_tot t ON t.res = acd_fe.res GROUP BY acd_fe.res
    ),
    acd_tagged AS (
      SELECT d.doc_id, d.variant, fp.cfp
      FROM acd_docs d JOIN acd_fp fp ON fp.res = d.res
    )
    SELECT cfp,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST(COUNT(DISTINCT variant) AS BIGINT) AS n_variants,
           CAST(SUM(CASE WHEN variant = 'base' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_base,
           CAST(SUM(CASE WHEN variant = 'rs2_stereo' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_rs2_stereo,
           CAST(SUM(CASE WHEN variant = 'rs4_loud' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_rs4_loud,
           CAST(SUM(CASE WHEN variant = 'stereo_loud' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_stereo_loud
    FROM acd_tagged GROUP BY cfp
    """,
)
def audio_composed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed-transform audio dedup: the same closed-form waveform
    arrives as the base mono clip AND as three TWO-axis compositions —
    2x-resampled stereo, 4x-resampled 3x-remaster, stereo 3x-remaster
    — four byte-distinct RIFF payloads across three rates, two
    layouts and two amplitudes, which exact dedup and every
    single-axis fingerprint miss (pinned: the FIXED-frame pipeline33
    print fails on the resampled variants, and a no-mixdown print
    would fail on the stereo ones).  Every payload is really decoded;
    the composed-invariant envelope (channel-sum mixdown, rate-aware
    frame length, energy-share digits) collapses each content residue
    to ONE cluster.  Invariance is exact by multiplicative
    composition: ZOH-by-k scales every frame energy x k, channel
    duplication x4, amplitude a x a² — one constant across frames,
    cancelled inside the integer floor-division digit.  The oracle
    replays the digits in closed form over the BASE samples only — no
    codec, no resample, no mixdown logic on the DuckDB side — so a
    wrong factor inference, a misaligned frame boundary or a dropped
    channel fails the hash gate.

    100 TB shape: identical to every audio tier — two Arrow-batched
    map stages after the keys-only id repartition (samples never
    shuffle), one shuffle of short fingerprint strings for the
    cluster aggregate; factor/layout inference is two header fields
    read inside the map task."""
    from go_map_reduce_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    ids = _spread_ids(spark, sf_dir)
    media = ids.mapInPandas(
        _acd_synth_batch,
        schema="doc_id long, variant string, payload binary",
    )
    printed = media.mapInPandas(
        _acd_fingerprint_batch,
        schema="doc_id long, variant string, cfp string",
    )
    return printed.groupBy("cfp").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.count_distinct("variant").cast("long").alias("n_variants"),
        F.sum((F.col("variant") == "base").cast("long"))
        .cast("long")
        .alias("n_base"),
        F.sum((F.col("variant") == "rs2_stereo").cast("long"))
        .cast("long")
        .alias("n_rs2_stereo"),
        F.sum((F.col("variant") == "rs4_loud").cast("long"))
        .cast("long")
        .alias("n_rs4_loud"),
        F.sum((F.col("variant") == "stereo_loud").cast("long"))
        .cast("long")
        .alias("n_stereo_loud"),
    )


# --------------------------------------------------------------------------
# Composed image dedup: rescale x codec (including the LOSSY one)
# --------------------------------------------------------------------------

ICD_RESIDUES = 16  # doc_id % 16 picks the pixel content
ICD_SIDE = 32  # base side; hash cells are (4·k)x(4·k) px at factor k
ICD_BLOCKS = 4  # 4x4 grid of (8·k)x(8·k) constant blocks
ICD_M_RES, ICD_M_BX, ICD_M_BY = 53, 73, 101  # this tier's multipliers
# variant -> (scale factor k, codec): all but 'base' change BOTH axes.
ICD_VARIANTS = {
    "base": (1, "bmp"),
    "up2_png": (2, "png"),
    "up2_jpeg": (2, "jpeg"),
    "up4_jpeg": (4, "jpeg"),
}
_ICD_ORDER = ("base", "up2_png", "up2_jpeg", "up4_jpeg")


def _icd_gray(doc_id: int) -> list[list[int]]:
    """Base-resolution content pixels: the block closed form with this
    tier's multipliers plus a per-doc brightness jitter ((doc_id //
    5) % 3) that keeps same-variant payloads byte-distinct while
    cancelling exactly in the average hash.  Block values stay <= 202
    so the jittered gray fits a byte AND the (8k)x(8k)-block-constant
    construction keeps baseline JPEG bit-exact (multimodal_jpeg.py
    module docstring)."""
    res, jit = doc_id % ICD_RESIDUES, (doc_id // 5) % 3
    return [
        [
            (ICD_M_RES * res + ICD_M_BX * (x // 8) + ICD_M_BY * (y // 8))
            % 200
            + jit
            for x in range(ICD_SIDE)
        ]
        for y in range(ICD_SIDE)
    ]


def _icd_synth_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Encode the SAME content pixels under the composed variant: the
    exact k x k nearest-neighbor upsample (thumbnail-pipeline integer
    upscale) THEN the variant's codec — 24-bit BMP (bottom-up),
    truecolor PNG, or grayscale baseline JPEG (all-ones quant: exact
    on block-constant content).  Four byte-distinct payloads on three
    canvas sizes under three codecs."""
    import numpy as np

    from go_map_reduce_spark.functions.jpegcodec import encode_jpeg_gray
    from go_map_reduce_spark.operators.multimodal import (
        encode_bmp,
        encode_png,
    )

    for pdf in batches:
        payloads, variants = [], []
        for doc_id in pdf["doc_id"]:
            grays = _icd_gray(doc_id)
            variant = _ICD_ORDER[(doc_id // ICD_RESIDUES) % 4]
            k, codec = ICD_VARIANTS[variant]
            # numpy form of the nested-comprehension kxk upsample (and
            # the RGB triple for the row codecs): identical bytes
            canvas = np.repeat(
                np.repeat(np.asarray(grays, dtype=np.uint8), k, axis=0),
                k,
                axis=1,
            )
            side = ICD_SIDE * k
            if codec == "jpeg":
                payloads.append(encode_jpeg_gray(side, side, canvas.tobytes()))
            else:
                rgb = np.repeat(canvas, 3, axis=1)
                rows = [rgb[y].tobytes() for y in range(side)]
                if codec == "png":
                    payloads.append(encode_png(side, side, rows))
                else:  # BMP stores rows bottom-up
                    payloads.append(encode_bmp(side, side, rows[::-1]))
            variants.append(variant)
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "variant": variants, "payload": payloads}
        )


def _icd_hash_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Magic-sniff the codec, REALLY decode (BMP header walk / PNG
    chunk+filter reconstruction / JPEG Huffman+IDCT), normalize to one
    top-down gray plane, then the RESOLUTION-AWARE exact-integer
    average hash (cell side 4·k px for the integer factor
    k = side/{ICD_SIDE}): the k x k upsample scales every cell sum
    and the total by the same k², the codec round-trip is bit-exact
    by construction, and the jitter cancels in 64·cellsum > total —
    so the COMPOSITION of the two axes leaves every bit unchanged."""
    import numpy as np

    from go_map_reduce_spark.operators.multimodal import (
        _PNG_SIG,
        decode_image,
    )

    for pdf in batches:
        out = {"doc_id": [], "variant": [], "chash": []}
        for doc_id, variant, payload in zip(
            pdf["doc_id"], pdf["variant"], pdf["payload"]
        ):
            p = bytes(payload)
            w, h, bpp, px = decode_image(p)
            if w != h or w % ICD_SIDE != 0:
                raise ValueError(f"non-integer rescale factor: {w}x{h}")
            k = w // ICD_SIDE
            if bpp == 8:
                gray = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
            else:
                gray = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)[
                    :, :, 0
                ]
                if p[:2] == b"BM":
                    gray = gray[::-1]  # bottom-up -> top-down
                elif p[:8] != _PNG_SIG:
                    raise ValueError("unexpected 24bpp codec")
            cells = (
                gray.astype(np.int64)
                .reshape(8, 4 * k, 8, 4 * k)
                .sum(axis=(1, 3))
            )
            total = int(gray.astype(np.int64).sum())
            bits = 64 * cells > total
            out["doc_id"].append(doc_id)
            out["variant"].append(variant)
            out["chash"].append(
                "".join("1" if b else "0" for b in bits.ravel())
            )
        yield pd.DataFrame(out)


@query(
    "image_composed_dedup",
    oracle=f"""
    WITH icd_docs AS (
      SELECT doc_id, doc_id % {ICD_RESIDUES} AS res,
             CASE (doc_id // {ICD_RESIDUES}) % 4
                  WHEN 0 THEN 'base' WHEN 1 THEN 'up2_png'
                  WHEN 2 THEN 'up2_jpeg' ELSE 'up4_jpeg' END AS variant
      FROM documents
    ),
    icd_blocks AS (
      SELECT res, bx, by,
             ({ICD_M_RES} * res + {ICD_M_BX} * bx + {ICD_M_BY} * by) % 200
               AS g
      FROM (SELECT DISTINCT res FROM icd_docs),
           range({ICD_BLOCKS}) t1(bx), range({ICD_BLOCKS}) t2(by)
    ),
    icd_tot AS (SELECT res, SUM(g) AS total FROM icd_blocks GROUP BY res),
    icd_bits AS (
      SELECT b.res, b.bx, b.by,
             CASE WHEN {ICD_BLOCKS * ICD_BLOCKS} * b.g > t.total
                  THEN '1' ELSE '0' END AS bit
      FROM icd_blocks b JOIN icd_tot t ON t.res = b.res
    ),
    icd_rows AS (
      SELECT res, by, string_agg(repeat(bit, 2), '' ORDER BY bx) AS rowstr
      FROM icd_bits GROUP BY res, by
    ),
    icd_hashes AS (
      SELECT res, string_agg(rowstr || rowstr, '' ORDER BY by) AS chash
      FROM icd_rows GROUP BY res
    ),
    icd_tagged AS (
      SELECT d.doc_id, d.variant, h.chash
      FROM icd_docs d JOIN icd_hashes h ON h.res = d.res
    )
    SELECT chash,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST(COUNT(DISTINCT variant) AS BIGINT) AS n_variants,
           CAST(SUM(CASE WHEN variant = 'base' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_base,
           CAST(SUM(CASE WHEN variant = 'up2_png' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_up2_png,
           CAST(SUM(CASE WHEN variant = 'up2_jpeg' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_up2_jpeg,
           CAST(SUM(CASE WHEN variant = 'up4_jpeg' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_up4_jpeg
    FROM icd_tagged GROUP BY chash
    """,
)
def image_composed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed-transform image dedup — the thumbnail-re-encode case:
    the same content pixels arrive as the base 32x32 BMP AND as three
    rescale+re-encode compositions (64x64 PNG, 64x64 baseline JPEG,
    128x128 baseline JPEG) — four byte-distinct payloads on three
    canvas sizes under three codecs, one of them LOSSY.  Exact dedup
    collapses nothing; the single-axis tiers each miss half the
    variants (the cross-codec hash can't compare canvas sizes, the
    rescale hash assumed one codec family).  Every payload is really
    decoded through the codec its magic bytes select; the
    resolution-aware exact-integer average hash collapses each content
    residue to ONE cluster.  Invariance composes multiplicatively:
    the k x k upsample scales cell sums and total by k² (cancels in
    the strict comparison), the all-ones-quant baseline JPEG of
    (8k)x(8k)-block-constant pixels round-trips bit-exactly, and the
    brightness jitter cancels algebraically.  The oracle predicts
    every hash bit from the unscaled block closed form — no codec and
    no rescale logic on the DuckDB side — so a wrong factor
    inference, a channel/row-order slip or an IDCT scaling bug in ANY
    branch fails the hash gate.

    100 TB shape: identical to the letterbox/rescale tiers — two
    Arrow-batched map stages after the keys-only id repartition
    (pixels never shuffle; decode cost scales with bytes scanned),
    one shuffle of 64-bit hash keys for the cluster aggregate; factor
    and codec inference are one header read inside the map task."""
    from go_map_reduce_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    ids = _spread_ids(spark, sf_dir)
    media = ids.mapInPandas(
        _icd_synth_batch,
        schema="doc_id long, variant string, payload binary",
    )
    hashed = media.mapInPandas(
        _icd_hash_batch,
        schema="doc_id long, variant string, chash string",
    )
    return hashed.groupBy("chash").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.count_distinct("variant").cast("long").alias("n_variants"),
        F.sum((F.col("variant") == "base").cast("long"))
        .cast("long")
        .alias("n_base"),
        F.sum((F.col("variant") == "up2_png").cast("long"))
        .cast("long")
        .alias("n_up2_png"),
        F.sum((F.col("variant") == "up2_jpeg").cast("long"))
        .cast("long")
        .alias("n_up2_jpeg"),
        F.sum((F.col("variant") == "up4_jpeg").cast("long"))
        .cast("long")
        .alias("n_up4_jpeg"),
    )
