"""Round-12 second batch: resample/rescale-robust media dedup.

The robustness axes closed so far — codec (pipeline33), channel
layout + amplitude (pipeline33), time shift (pipeline34), spatial
framing (pipeline34), container/re-encode/temporal pads for video
(pipeline35) — miss the two commonest SIZE transforms a crawl sees:
an audio re-upload RESAMPLED to a different rate, and an image
re-hosted at a different RESOLUTION (thumbnail pipelines, retina
variants).  Both tiers here make content identity exact under
integer-factor size changes by the same algebra the earlier tiers
use: the fingerprint is computed over SCALE-AWARE windows (frame
length proportional to the sample rate; hash cell side proportional
to the image side), so the scale factor k multiplies both the
windowed statistic and its normalizer by the same power of k and
cancels inside the integer floor division / strict comparison —
invariance by cancellation, never by tolerance.

Why scale-awareness is necessary (not just sufficient) is pinned in
tests: the pipeline33 FIXED-length frame fingerprint applied to a
2x-upsampled clip chops every base frame in half and produces a
different digit string — the blind spot this tier closes — and a
fixed-cell-size average hash of a 2x image yields a 256-bit string
that cannot even be compared to the base 64-bit one.

Reference anchor: the reference's whole-file opaque-input contract
(mr/worker.go:76-94) is what scale-invariant CONTENT identity
upgrades, exactly as for the earlier robustness tiers.

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
# Sample-rate-robust audio dedup
# --------------------------------------------------------------------------

ARS_RESIDUES = 16  # doc_id % 16 picks the waveform content
ARS_BASE_RATE = 8000
ARS_FRAMES = 8  # fingerprint frames
ARS_FRAME_LEN = 16  # BASE-rate samples per frame (scales with rate)
ARS_CONTENT = ARS_FRAMES * ARS_FRAME_LEN  # 128 base samples
ARS_FACTORS = (1, 2, 4)  # base / up2 / up4 integer upsample factors
_ARS_VARIANTS = ("base", "up2", "up4")


@functools.lru_cache(maxsize=ARS_RESIDUES)
def _ars_samples(res: int) -> tuple[int, ...]:
    """Closed-form base waveform: 128 PCM-16 samples in [-500, 500)
    (headroom is irrelevant here — no amplitude variant — but keeps
    the family's convention)."""
    return tuple(
        (41 * res + 17 * t) % 1000 - 500 for t in range(ARS_CONTENT)
    )


def _ars_synth_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Encode the SAME closed-form waveform at the sample rate the
    variant (doc_id // {ARS_RESIDUES}) % 3 selects (decoupled from the
    content residue — the pipeline34 coupled-key lesson): 'base' at
    {ARS_BASE_RATE} Hz, 'up2'/'up4' at 2x/4x the rate with each base
    sample repeated 2x/4x — the exact zero-order-hold upsample an
    integer resampler produces.  The three payloads are byte-distinct
    RIFF files of three different lengths AND rates."""
    import numpy as np

    from go_map_reduce_spark.operators.multimodal import encode_wav

    for pdf in batches:
        payloads, variants = [], []
        for doc_id in pdf["doc_id"]:
            s = _ars_samples(doc_id % ARS_RESIDUES)
            k = ARS_FACTORS[(doc_id // ARS_RESIDUES) % 3]
            # numpy form of [[v] for v in s for _ in range(k)] (the
            # zero-order-hold upsample); encode_wav consumes the array
            frames = np.repeat(np.asarray(s, dtype=np.int64), k)[:, None]
            payloads.append(encode_wav(1, ARS_BASE_RATE * k, frames))
            variants.append(_ARS_VARIANTS[(doc_id // ARS_RESIDUES) % 3])
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "variant": variants, "payload": payloads}
        )


def _ars_fingerprint_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """REAL RIFF decode, then the RATE-AWARE energy envelope: the
    integer factor k = rate / {ARS_BASE_RATE} (asserted exact) scales
    the frame length to {ARS_FRAME_LEN}·k samples, so frame f always
    covers base-time window [16f, 16(f+1)) regardless of rate.  A
    zero-order-hold upsample repeats each base sample k times, so
    e_f(k) = k·e_f(1) and total(k) = k·total(1) — the digit
    e_f·Q // total is EXACTLY rate-invariant (the pipeline33 k²
    amplitude algebra, with k¹ from repetition instead)."""
    import numpy as np

    from go_map_reduce_spark.operators.multimodal import decode_wav

    for pdf in batches:
        out = {"doc_id": [], "variant": [], "rfp": []}
        for doc_id, variant, payload in zip(
            pdf["doc_id"], pdf["variant"], pdf["payload"]
        ):
            rate, channels, n_frames, data = decode_wav(bytes(payload))
            if rate % ARS_BASE_RATE != 0:
                raise ValueError(f"non-integer resample factor: {rate}")
            k = rate // ARS_BASE_RATE
            if n_frames != ARS_CONTENT * k:
                raise ValueError(f"unexpected frame count {n_frames}")
            v = (
                np.frombuffer(data, dtype="<i2")
                .astype(np.int64)
                .reshape(n_frames, channels)
                .sum(axis=1)
            )
            e = (
                (v * v)
                .reshape(ARS_FRAMES, ARS_FRAME_LEN * k)
                .sum(axis=1)
            )
            total = int(e.sum())
            if total == 0:
                raise ValueError("silent payload — fingerprint undefined")
            digits = [int(x) * AUD_Q // total for x in e]
            out["doc_id"].append(doc_id)
            out["variant"].append(variant)
            out["rfp"].append("-".join(f"{d:04d}" for d in digits))
        yield pd.DataFrame(out)


@query(
    "audio_resample_dedup",
    oracle=f"""
    WITH ars_docs AS (
      SELECT doc_id, doc_id % {ARS_RESIDUES} AS res,
             CASE (doc_id // {ARS_RESIDUES}) % 3
                  WHEN 0 THEN 'base' WHEN 1 THEN 'up2'
                  ELSE 'up4' END AS variant
      FROM documents
    ),
    ars_samples AS (
      SELECT res, t // {ARS_FRAME_LEN} AS f,
             (41 * res + 17 * t) % 1000 - 500 AS v
      FROM (SELECT DISTINCT res FROM ars_docs),
           range({ARS_CONTENT}) u(t)
    ),
    ars_fe AS (
      SELECT res, f, SUM(v * v) AS e FROM ars_samples GROUP BY res, f
    ),
    ars_tot AS (SELECT res, SUM(e) AS total FROM ars_fe GROUP BY res),
    ars_fp AS (
      SELECT ars_fe.res,
             string_agg(lpad(CAST(ars_fe.e * {AUD_Q} // t.total AS VARCHAR),
                             4, '0'), '-' ORDER BY ars_fe.f) AS rfp
      FROM ars_fe JOIN ars_tot t ON t.res = ars_fe.res GROUP BY ars_fe.res
    ),
    ars_tagged AS (
      SELECT d.doc_id, d.variant, fp.rfp
      FROM ars_docs d JOIN ars_fp fp ON fp.res = d.res
    )
    SELECT rfp,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST(COUNT(DISTINCT variant) AS BIGINT) AS n_variants,
           CAST(SUM(CASE WHEN variant = 'base' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_base,
           CAST(SUM(CASE WHEN variant = 'up2' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_up2,
           CAST(SUM(CASE WHEN variant = 'up4' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_up4
    FROM ars_tagged GROUP BY rfp
    """,
)
def audio_resample_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-rate-robust audio dedup: the same closed-form waveform
    arrives at {ARS_BASE_RATE} Hz and as exact 2x/4x zero-order-hold
    upsamples — three byte-distinct RIFF payloads of three different
    rates AND lengths, which exact dedup and the FIXED-frame-length
    pipeline33 fingerprint both fail to collapse (pinned: the fixed
    16-sample frame chops every base frame of the upsampled clip in
    half).  Every payload is really decoded; the RATE-AWARE envelope
    (frame length {ARS_FRAME_LEN}·k for integer factor k = rate/base)
    collapses each content residue to ONE cluster.  Invariance is
    exact: sample repetition multiplies every frame energy and the
    total by the same k, which cancels inside the integer
    floor-division digit.  The oracle replays the digits in closed
    form over the BASE samples only — no codec and no resample logic
    on the DuckDB side — so a wrong factor inference or a misaligned
    frame boundary fails the hash gate.

    100 TB shape: identical to the other audio tiers — two
    Arrow-batched map stages after the keys-only id repartition
    (samples never shuffle), one shuffle of short fingerprint strings
    for the cluster aggregate; the factor inference is one header
    field read inside the map task."""
    from go_map_reduce_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    ids = _spread_ids(spark, sf_dir)
    media = ids.mapInPandas(
        _ars_synth_batch,
        schema="doc_id long, variant string, payload binary",
    )
    printed = media.mapInPandas(
        _ars_fingerprint_batch,
        schema="doc_id long, variant string, rfp string",
    )
    return printed.groupBy("rfp").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.count_distinct("variant").cast("long").alias("n_variants"),
        F.sum((F.col("variant") == "base").cast("long"))
        .cast("long")
        .alias("n_base"),
        F.sum((F.col("variant") == "up2").cast("long"))
        .cast("long")
        .alias("n_up2"),
        F.sum((F.col("variant") == "up4").cast("long"))
        .cast("long")
        .alias("n_up4"),
    )


# --------------------------------------------------------------------------
# Resolution-robust image dedup
# --------------------------------------------------------------------------

IRS_RESIDUES = 16  # doc_id % 16 picks the pixel content
IRS_SIDE = 32  # base side; aHash cells are (4·k)x(4·k) px at factor k
IRS_BLOCKS = 4  # 4x4 grid of (8·k)x(8·k) constant blocks
IRS_M_RES, IRS_M_BX, IRS_M_BY = 43, 67, 109  # this tier's multipliers
IRS_FACTORS = (1, 2, 4)
_IRS_VARIANTS = ("base", "up2", "up4")


def _irs_gray(doc_id: int) -> list[list[int]]:
    """Base-resolution content pixels: the block closed form with this
    tier's multipliers plus a per-doc brightness jitter that keeps
    same-variant payloads byte-distinct while cancelling exactly in
    the average hash."""
    res, jit = doc_id % IRS_RESIDUES, (doc_id // 7) % 3
    return [
        [
            (IRS_M_RES * res + IRS_M_BX * (x // 8) + IRS_M_BY * (y // 8))
            % 200
            + jit
            for x in range(IRS_SIDE)
        ]
        for y in range(IRS_SIDE)
    ]


def _irs_synth_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Encode the SAME content pixels at the resolution the variant
    (doc_id // {IRS_RESIDUES}) % 3 selects: base 32x32, or the exact
    2x/4x nearest-neighbor upsample (each pixel becomes a kxk block —
    what a thumbnail pipeline's integer upscale produces).  All
    truecolor PNG — byte-distinct payloads of three canvas sizes."""
    import numpy as np

    from go_map_reduce_spark.operators.multimodal import encode_png

    for pdf in batches:
        payloads, variants = [], []
        for doc_id in pdf["doc_id"]:
            grays = _irs_gray(doc_id)
            k = IRS_FACTORS[(doc_id // IRS_RESIDUES) % 3]
            # numpy form of the nested-comprehension kxk nearest-
            # neighbor upsample + RGB triple: identical bytes per row
            canvas = np.repeat(
                np.repeat(np.asarray(grays, dtype=np.uint8), k, axis=0),
                k,
                axis=1,
            )
            rgb = np.repeat(canvas, 3, axis=1)
            rows = [rgb[y].tobytes() for y in range(rgb.shape[0])]
            payloads.append(encode_png(IRS_SIDE * k, IRS_SIDE * k, rows))
            variants.append(_IRS_VARIANTS[(doc_id // IRS_RESIDUES) % 3])
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "variant": variants, "payload": payloads}
        )


def _irs_hash_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """REAL PNG decode, then the RESOLUTION-AWARE exact-integer
    average hash: the integer factor k = side/{IRS_SIDE} (asserted
    exact) scales the cell side to 4·k px, so cell (cx, cy) always
    covers base-image region [4cx, 4cx+4)x[4cy, 4cy+4).  A kxk
    nearest-neighbor upsample multiplies every cell sum and the total
    by the same k², which cancels in the strict comparison
    64·cellsum > total — resolution invariance by the letterbox
    tier's cancellation argument, applied to scale."""
    import numpy as np

    from go_map_reduce_spark.operators.multimodal import decode_image

    for pdf in batches:
        out = {"doc_id": [], "variant": [], "shash": []}
        for doc_id, variant, payload in zip(
            pdf["doc_id"], pdf["variant"], pdf["payload"]
        ):
            w, h, bpp, px = decode_image(bytes(payload))
            if w != h or w % IRS_SIDE != 0:
                raise ValueError(f"non-integer rescale factor: {w}x{h}")
            k = w // IRS_SIDE
            gray = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)[:, :, 0]
            cells = (
                gray.astype(np.int64)
                .reshape(8, 4 * k, 8, 4 * k)
                .sum(axis=(1, 3))
            )
            total = int(gray.astype(np.int64).sum())
            bits = 64 * cells > total
            out["doc_id"].append(doc_id)
            out["variant"].append(variant)
            out["shash"].append(
                "".join("1" if b else "0" for b in bits.ravel())
            )
        yield pd.DataFrame(out)


@query(
    "image_rescale_dedup",
    oracle=f"""
    WITH irs_docs AS (
      SELECT doc_id, doc_id % {IRS_RESIDUES} AS res,
             CASE (doc_id // {IRS_RESIDUES}) % 3
                  WHEN 0 THEN 'base' WHEN 1 THEN 'up2'
                  ELSE 'up4' END AS variant
      FROM documents
    ),
    irs_blocks AS (
      SELECT res, bx, by,
             ({IRS_M_RES} * res + {IRS_M_BX} * bx + {IRS_M_BY} * by) % 200
               AS g
      FROM (SELECT DISTINCT res FROM irs_docs),
           range({IRS_BLOCKS}) t1(bx), range({IRS_BLOCKS}) t2(by)
    ),
    irs_tot AS (SELECT res, SUM(g) AS total FROM irs_blocks GROUP BY res),
    irs_bits AS (
      SELECT b.res, b.bx, b.by,
             CASE WHEN {IRS_BLOCKS * IRS_BLOCKS} * b.g > t.total
                  THEN '1' ELSE '0' END AS bit
      FROM irs_blocks b JOIN irs_tot t ON t.res = b.res
    ),
    irs_rows AS (
      SELECT res, by, string_agg(repeat(bit, 2), '' ORDER BY bx) AS rowstr
      FROM irs_bits GROUP BY res, by
    ),
    irs_hashes AS (
      SELECT res, string_agg(rowstr || rowstr, '' ORDER BY by) AS shash
      FROM irs_rows GROUP BY res
    ),
    irs_tagged AS (
      SELECT d.doc_id, d.variant, h.shash
      FROM irs_docs d JOIN irs_hashes h ON h.res = d.res
    )
    SELECT shash,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST(COUNT(DISTINCT variant) AS BIGINT) AS n_variants,
           CAST(SUM(CASE WHEN variant = 'base' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_base,
           CAST(SUM(CASE WHEN variant = 'up2' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_up2,
           CAST(SUM(CASE WHEN variant = 'up4' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_up4
    FROM irs_tagged GROUP BY shash
    """,
)
def image_rescale_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolution-robust image dedup — the thumbnail/retina case: the
    same content pixels arrive at 32x32 and as exact 2x/4x
    nearest-neighbor upsamples — three byte-distinct PNG payloads on
    three canvas sizes, which exact dedup cannot collapse and a
    FIXED-cell-size average hash cannot even compare (a 4-px cell
    grid over a 64x64 canvas yields a 256-bit string against the base
    64-bit one; pinned).  Every payload is really decoded; the
    resolution-aware hash (cell side 4·k for the integer factor
    k = side/32) collapses each content residue to ONE cluster.
    Invariance is exact: the kxk upsample multiplies every cell sum
    and the image total by the same k², which cancels in the strict
    64·cellsum > total comparison.  The oracle predicts every hash
    bit from the unscaled block closed form — no codec and no rescale
    logic on the DuckDB side — so a wrong factor inference or a
    misaligned cell grid fails the hash gate.

    100 TB shape: identical to the letterbox tier — two Arrow-batched
    map stages after the keys-only id repartition (pixels never
    shuffle; the 4x canvas is 16x the bytes, and decode cost scales
    with bytes scanned exactly as it should), one shuffle of 64-bit
    hash keys for the cluster aggregate; factor inference is one
    header read inside the map task."""
    from go_map_reduce_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    ids = _spread_ids(spark, sf_dir)
    media = ids.mapInPandas(
        _irs_synth_batch,
        schema="doc_id long, variant string, payload binary",
    )
    hashed = media.mapInPandas(
        _irs_hash_batch,
        schema="doc_id long, variant string, shash string",
    )
    return hashed.groupBy("shash").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.count_distinct("variant").cast("long").alias("n_variants"),
        F.sum((F.col("variant") == "base").cast("long"))
        .cast("long")
        .alias("n_base"),
        F.sum((F.col("variant") == "up2").cast("long"))
        .cast("long")
        .alias("n_up2"),
        F.sum((F.col("variant") == "up4").cast("long"))
        .cast("long")
        .alias("n_up4"),
    )
