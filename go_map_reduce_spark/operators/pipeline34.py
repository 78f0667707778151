"""Round-11 pipeline operators: media dedup that ACTS (survivor
selection + cut list over the cross-codec image and cross-layout
audio clusters) and a time-shift-robust audio fingerprint.

``media_dedup_survivors`` is the report→act pattern's fifth
application (after substring_dup_cut, dedup_exact_survivors,
tokenizer_retrain_recovery, ivf_index_compaction): the pipeline33
cluster reports FIND the format-variant duplicates; a real crawl then
KEEPS one canonical survivor per cluster — the lossless/most-faithful
format, deterministic tiebreak — and cuts the rest.  Survivor policy,
stated once: images prefer PNG (compressed lossless) over BMP (raw
lossless) over JPEG (lossy); audio prefers the untouched mono master
over the channel-duplicated stereo over the 2x-amplitude remaster;
ties inside a format break on lowest doc_id.  The policy is a single
integer preference key, so both engines compute the survivor with one
arg-min — no window, no self-join.

``audio_shift_dedup`` closes the layout tier's documented blind spot:
the pipeline33 energy profile is invariant to channel layout and
amplitude but NOT to a leading-silence pad or a clip offset — the
commonest real audio near-dups (re-uploads with padded intros,
trimmed openings).  The fix is an END-ANCHORED energy envelope: trim
trailing silence to the last nonzero sample (every content sample is
odd by construction, hence nonzero — the anchor is exact, not a
threshold), then fingerprint the LAST W frames relative to their own
window total.  A leading pad of ANY length, a prefix clip shorter
than (content - window), a trailing pad, channel duplication, and a
uniform amplitude scale all cancel EXACTLY: pads/clips never touch
the end-anchored window, and scale multiplies every frame energy and
the window total by the same k², which cancels inside the integer
floor-division digit (the pipeline33 algebra, re-anchored).

Reference anchors: the map-side dedup in mrapps/indexer.go:21-26 is
the engine-level seed of the survivor tier (emit each key once, drop
the rest); the reference's whole-file opaque-input contract
(mr/worker.go:76-94) is what format/shift-invariant CONTENT identity
upgrades.

Composition queries import tier functions directly (package
convention: the staleness closure must see the edges)."""

from __future__ import annotations

import functools
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.operators.pipeline33 import (
    AUD_Q,
    AUD_TAGGED_CTES,
    CC_TAGGED_CTES,
    _spread_ids,
    audio_fp_frame,
    cc_hashed_frame,
)
from go_map_reduce_spark.registry import query

# Preference ranks (lower wins).  The doc_id tiebreak rides in the low
# bits: pref = rank * 2^40 + doc_id (doc_id < 2^40 at any plausible SF).
_PREF_BASE = 1 << 40
IMG_RANK = {"png": 0, "bmp": 1, "jpeg": 2}
AUD_RANK = {"mono": 0, "stereo": 1, "loud": 2}


def _rank_sql(col: str, ranks: dict[str, int]) -> str:
    """The rank dict rendered as a SQL CASE — Spark and DuckDB both
    derive their preference key from the ONE policy table above."""
    whens = " ".join(
        f"WHEN '{fmt}' THEN {r}" for fmt, r in sorted(ranks.items(), key=lambda kv: kv[1])[:-1]
    )
    return f"CASE {col} {whens} ELSE {max(ranks.values())} END"


def _rank_col(col: str, ranks: dict[str, int]) -> F.Column:
    """The same policy table as a Spark Column expression."""
    expr = F.lit(max(ranks.values()))
    for fmt, r in sorted(ranks.items(), key=lambda kv: kv[1], reverse=True)[1:]:
        expr = F.when(F.col(col) == fmt, F.lit(r)).otherwise(expr)
    return expr


_IMG_RANK_SQL = _rank_sql("codec", IMG_RANK)
_AUD_RANK_SQL = _rank_sql("layout", AUD_RANK)


def _survivor_agg(
    frame: DataFrame, key: str, fmt_col: str, rank_expr: F.Column
) -> DataFrame:
    """One arg-min survivor selection per cluster: group by the
    perceptual key, pick the (rank, doc_id)-minimal member via
    ``min_by`` on the packed integer preference, and emit the cut
    size.  No window function and no self-join: at 100 TB this is the
    same single short-key shuffle as the cluster report itself, with
    a map-side partial min.

    The doc_id-fits-the-low-bits precondition fails LOUDLY: the DuckDB
    oracle replays the identical rank*2^40+doc_id packing, so a
    doc_id >= 2^40 corrupting the preference order would make BOTH
    engines agree on the wrong survivor and sail through the hash gate
    (r11 ADVICE) — the runtime guard is the only tripwire."""
    pref = F.when(
        F.col("doc_id") >= _PREF_BASE,
        F.raise_error(
            F.concat(
                F.lit("doc_id overflows the packed preference key "
                      f"(>= 2^40={_PREF_BASE}): "),
                F.col("doc_id").cast("string"),
            )
        ).cast("long"),
    ).otherwise(rank_expr * F.lit(_PREF_BASE) + F.col("doc_id"))
    return (
        frame.withColumn("pref", pref.cast("long"))
        .groupBy(F.col(key).alias("cluster_key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("group_size"),
            F.min_by("doc_id", "pref").cast("long").alias("survivor_doc_id"),
            F.min_by(fmt_col, "pref").alias("survivor_format"),
            (F.count(F.lit(1)) - F.lit(1)).cast("long").alias("cut_count"),
        )
    )


@query(
    "media_dedup_survivors",
    oracle=f"""
    WITH {CC_TAGGED_CTES},
    img AS (
      SELECT 'image' AS media_type, ahash AS cluster_key,
             CAST(COUNT(*) AS BIGINT) AS group_size,
             CAST(arg_min(doc_id,
                          ({_IMG_RANK_SQL}) * {_PREF_BASE} + doc_id)
                  AS BIGINT) AS survivor_doc_id,
             arg_min(codec,
                     ({_IMG_RANK_SQL}) * {_PREF_BASE} + doc_id)
               AS survivor_format,
             CAST(COUNT(*) - 1 AS BIGINT) AS cut_count
      FROM tagged GROUP BY ahash
    ),
    {AUD_TAGGED_CTES},
    aud AS (
      SELECT 'audio' AS media_type, afp AS cluster_key,
             CAST(COUNT(*) AS BIGINT) AS group_size,
             CAST(arg_min(doc_id,
                          ({_AUD_RANK_SQL}) * {_PREF_BASE} + doc_id)
                  AS BIGINT) AS survivor_doc_id,
             arg_min(layout,
                     ({_AUD_RANK_SQL}) * {_PREF_BASE} + doc_id)
               AS survivor_format,
             CAST(COUNT(*) - 1 AS BIGINT) AS cut_count
      FROM aud_tagged GROUP BY afp
    )
    SELECT * FROM img UNION ALL SELECT * FROM aud
    """,
)
def media_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor selection + cut list over BOTH media dedup tiers: per
    perceptual cluster (image ahash / audio energy fingerprint), keep
    the preference-minimal member — lossless format first for images
    (PNG, then BMP, then JPEG), untouched master first for audio
    (mono, then stereo, then the 2x remaster), lowest doc_id inside a
    format — and emit (media_type, cluster_key, group_size,
    survivor_doc_id, survivor_format, cut_count).  cut_count is the
    cluster's cut-list size: group_size - 1, everything that is NOT
    the survivor.  The oracle replays the survivor in closed form
    (the pipeline33 tagged CTEs verbatim + one arg-min) — no codec on
    the DuckDB side — so a wrong preference order or a
    nondeterministic tiebreak fails the hash gate.

    100 TB shape: both inputs are the session-memoized decoded frames
    (cc_hashed_frame / audio_fp_frame — the expensive codec work runs
    once per session across the report AND the act), and the act
    itself is one groupBy per tier with a packed-integer ``min_by`` —
    a map-side-combinable arg-min over the same short keys the
    cluster report shuffles.  No window over the corpus, no
    cluster-vs-members self-join; union of two narrow aggregates."""
    img = _survivor_agg(
        cc_hashed_frame(spark, sf_dir),
        "ahash",
        "codec",
        _rank_col("codec", IMG_RANK),
    ).select(F.lit("image").alias("media_type"), "*")
    aud = _survivor_agg(
        audio_fp_frame(spark, sf_dir),
        "afp",
        "layout",
        _rank_col("layout", AUD_RANK),
    ).select(F.lit("audio").alias("media_type"), "*")
    return img.unionByName(aud)


# --------------------------------------------------------------------------
# Time-shift-robust audio fingerprint (end-anchored energy envelope)
# --------------------------------------------------------------------------

ASD_RESIDUES = 16  # doc_id % 16 picks the waveform content
ASD_CONTENT = 128  # content samples per waveform
ASD_FRAME_LEN = 16  # fingerprint frame length (samples)
ASD_WINDOW_FRAMES = 6  # end-anchored window: last 6 frames = 96 samples
ASD_WINDOW = ASD_WINDOW_FRAMES * ASD_FRAME_LEN
ASD_CLIP = 16  # the 'clipped' variant drops this many leading samples


@functools.lru_cache(maxsize=ASD_RESIDUES)
def _asd_samples(res: int) -> tuple[int, ...]:
    """Closed-form content waveform: 128 PCM-16 samples, every one ODD
    (2*((37*res + 13*t) % 500) - 499 ∈ [-499, 499], always odd) so the
    last-nonzero-sample anchor is exactly the content end — no
    threshold, no tolerance.  Headroom: the 2x variant stays inside
    int16."""
    return tuple(
        2 * ((37 * res + 13 * t) % 500) - 499 for t in range(ASD_CONTENT)
    )


def _synth_shift_variant_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Encode the SAME closed-form waveform under the shift/layout
    variant (doc_id // {ASD_RESIDUES}) % 4 selects — independent of
    the content residue doc_id % {ASD_RESIDUES} (a doc_id % 4 variant
    would be COUPLED to the residue since 4 divides 16, and no cluster
    would ever span two variants); ids r, r+16, r+32, r+48 carry the
    same content under all four variants.  The four variants of one
    residue are pairwise byte-distinct:

    0 'master':        mono, untouched.
    1 'padded':        mono, (7 + doc_id % 5) leading + 6 trailing
                       zero samples.  The pad length varies with
                       doc_id but CYCLES: same (residue, variant)
                       repeats every 64 ids and the pad every 5, so
                       same-residue padded copies 320 ids apart are
                       byte-IDENTICAL — genuinely identical files,
                       which exact dedup rightly collapses anyway;
                       this tier's subject is the byte-DISTINCT
                       shifted variants (r11 review correction of an
                       overstated per-doc-distinctness claim).
    2 'clipped_loud':  first {ASD_CLIP} content samples dropped AND
                       2x amplitude — a trimmed, remastered re-upload.
    3 'stereo_padded': channel-duplicated stereo with 3 leading zero
                       frames of silence.
    """
    from go_map_reduce_spark.operators.multimodal import encode_wav

    for pdf in batches:
        payloads, variants = [], []
        for doc_id in pdf["doc_id"]:
            s = _asd_samples(doc_id % ASD_RESIDUES)
            variant = ("master", "padded", "clipped_loud", "stereo_padded")[
                (doc_id // ASD_RESIDUES) % 4
            ]
            if variant == "master":
                frames = [[v] for v in s]
                channels = 1
            elif variant == "padded":
                lead = 7 + doc_id % 5
                frames = [[0]] * lead + [[v] for v in s] + [[0]] * 6
                channels = 1
            elif variant == "clipped_loud":
                frames = [[2 * v] for v in s[ASD_CLIP:]]
                channels = 1
            else:  # stereo_padded
                frames = [[0, 0]] * 3 + [[v, v] for v in s]
                channels = 2
            payloads.append(encode_wav(channels, 8000, frames))
            variants.append(variant)
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "variant": variants, "payload": payloads}
        )


def _shift_fingerprint_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """REAL RIFF decode, channel-SUM mixdown, then the end-anchored
    envelope: find the last nonzero mixdown sample (exact — content
    samples are odd), take the {ASD_WINDOW} samples ending there,
    frame into {ASD_WINDOW_FRAMES} frames of {ASD_FRAME_LEN}, and emit
    permille digits e_f * Q // window_total.  Leading pads and prefix
    clips never reach the window; trailing pads are trimmed by the
    anchor; channel duplication and amplitude scale multiply every e_f
    and the total by one k² that cancels in the integer division."""
    import numpy as np

    from go_map_reduce_spark.operators.multimodal import decode_wav

    for pdf in batches:
        out = {"doc_id": [], "variant": [], "sfp": []}
        for doc_id, variant, payload in zip(
            pdf["doc_id"], pdf["variant"], pdf["payload"]
        ):
            _rate, channels, n_frames, data = decode_wav(bytes(payload))
            v = (
                np.frombuffer(data, dtype="<i2")
                .astype(np.int64)
                .reshape(n_frames, channels)
                .sum(axis=1)
            )
            nz = np.nonzero(v)[0]
            if len(nz) == 0:
                raise ValueError("silent payload — fingerprint undefined")
            end = int(nz[-1]) + 1  # one past the last nonzero sample
            if end < ASD_WINDOW:
                raise ValueError(f"content too short for window: {end}")
            w = v[end - ASD_WINDOW : end]
            e = (w * w).reshape(ASD_WINDOW_FRAMES, ASD_FRAME_LEN).sum(axis=1)
            total = int(e.sum())
            digits = [int(x) * AUD_Q // total for x in e]
            out["doc_id"].append(doc_id)
            out["variant"].append(variant)
            out["sfp"].append("-".join(f"{d:04d}" for d in digits))
        yield pd.DataFrame(out)


@query(
    "audio_shift_dedup",
    oracle=f"""
    WITH per_doc AS (
      SELECT doc_id, doc_id % {ASD_RESIDUES} AS res,
             CASE (doc_id // {ASD_RESIDUES}) % 4
                  WHEN 0 THEN 'master'
                  WHEN 1 THEN 'padded'
                  WHEN 2 THEN 'clipped_loud'
                  ELSE 'stereo_padded' END AS variant
      FROM documents
    ),
    win AS (
      SELECT res, (t - {ASD_CONTENT - ASD_WINDOW}) // {ASD_FRAME_LEN} AS f,
             2 * ((37 * res + 13 * t) % 500) - 499 AS v
      FROM (SELECT DISTINCT res FROM per_doc),
           range({ASD_CONTENT - ASD_WINDOW}, {ASD_CONTENT}) u(t)
    ),
    fe AS (SELECT res, f, SUM(v * v) AS e FROM win GROUP BY res, f),
    tot AS (SELECT res, SUM(e) AS total FROM fe GROUP BY res),
    fp AS (
      SELECT fe.res,
             string_agg(lpad(CAST(fe.e * {AUD_Q} // t.total AS VARCHAR),
                             4, '0'), '-' ORDER BY fe.f) AS sfp
      FROM fe JOIN tot t ON t.res = fe.res GROUP BY fe.res
    ),
    tagged AS (
      SELECT d.doc_id, d.variant, fp.sfp
      FROM per_doc d JOIN fp ON fp.res = d.res
    )
    SELECT sfp,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST(COUNT(DISTINCT variant) AS BIGINT) AS n_variants,
           CAST(SUM(CASE WHEN variant = 'master' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_master,
           CAST(SUM(CASE WHEN variant = 'padded' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_padded,
           CAST(SUM(CASE WHEN variant = 'clipped_loud' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped,
           CAST(SUM(CASE WHEN variant = 'stereo_padded' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_stereo
    FROM tagged GROUP BY sfp
    """,
)
def audio_shift_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-shift-robust audio dedup: the same closed-form waveform
    arrives untouched, silence-padded (per-doc pad length), prefix-
    clipped at 2x amplitude, and as leading-padded duplicated stereo —
    four byte-distinct RIFF payloads per content residue, three of
    them TIME-SHIFTED, which the pipeline33 start-anchored profile
    cannot collapse (pinned in tests).  Every payload is really
    decoded; the end-anchored energy envelope (last-nonzero-sample
    trim, last {ASD_WINDOW_FRAMES} frames, permille of the window's
    own total) collapses each residue to ONE cluster.  Invariance is
    exact, not approximate: the window never contains pad/clip
    samples, and layout/amplitude scale cancels algebraically inside
    the integer digit (the pipeline33 k² argument, re-anchored).  The
    oracle replays the window digits in closed form over the content's
    last {ASD_WINDOW} samples — no codec, no shift logic on the DuckDB
    side — so a wrong anchor or an off-by-one window fails the hash
    gate.

    100 TB shape: identical to the layout tier — two Arrow-batched map
    stages (encode / decode+fingerprint after the keys-only id
    repartition; samples never shuffle), one
    shuffle of short fingerprint strings for the cluster aggregate.
    The anchor scan is one pass over each clip's own samples inside
    the map task: shift-robustness costs zero payload shuffles."""
    from go_map_reduce_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    ids = _spread_ids(spark, sf_dir)
    media = ids.mapInPandas(
        _synth_shift_variant_batch,
        schema="doc_id long, variant string, payload binary",
    )
    printed = media.mapInPandas(
        _shift_fingerprint_batch,
        schema="doc_id long, variant string, sfp string",
    )
    return printed.groupBy("sfp").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.count_distinct("variant").cast("long").alias("n_variants"),
        F.sum((F.col("variant") == "master").cast("long"))
        .cast("long")
        .alias("n_master"),
        F.sum((F.col("variant") == "padded").cast("long"))
        .cast("long")
        .alias("n_padded"),
        F.sum((F.col("variant") == "clipped_loud").cast("long"))
        .cast("long")
        .alias("n_clipped"),
        F.sum((F.col("variant") == "stereo_padded").cast("long"))
        .cast("long")
        .alias("n_stereo"),
    )


# --------------------------------------------------------------------------
# Letterbox/pillarbox-invariant image dedup (the image shift sibling)
# --------------------------------------------------------------------------

LB_RESIDUES = 16  # doc_id % 16 picks the pixel content
LB_SIDE = 32  # content side; aHash cells are 4x4 px
LB_BLOCKS = 4  # 4x4 grid of 8x8 constant blocks
LB_M_RES, LB_M_BX, LB_M_BY = 37, 71, 113  # pipeline33 block multipliers
LB_PAD = 8  # letterbox/pillarbox bar thickness (px)
LB_FRAME = 4  # 'framed' border thickness on all four sides


def _lb_gray(doc_id: int) -> list[list[int]]:
    """Content pixels of one synthesized image: the pipeline33 block
    closed form SHIFTED UP BY ONE (+1, plus the brightness jitter
    (doc_id // 3) % 3) so every content pixel is >= 1 — strictly
    brighter than the exact-zero black bars, making the border trim an
    exact predicate rather than a threshold.  The uniform +1 cancels
    in the average-hash bits exactly like the jitter does, so the
    oracle's bit prediction is the unshifted block form."""
    res, jit = doc_id % LB_RESIDUES, (doc_id // 3) % 3
    return [
        [
            (LB_M_RES * res + LB_M_BX * (x // 8) + LB_M_BY * (y // 8)) % 200
            + 1
            + jit
            for x in range(LB_SIDE)
        ]
        for y in range(LB_SIDE)
    ]


def _lb_synth_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Encode the SAME content pixels under the framing variant
    (doc_id // {LB_RESIDUES}) % 4 selects (independent of the content
    residue — the audio tier's coupling lesson): 0 'bare' 32x32,
    1 'letterbox' (+{LB_PAD} black rows top and bottom), 2 'pillarbox'
    (+{LB_PAD} black columns left and right), 3 'framed' (+{LB_FRAME}
    on all four sides).  All truecolor PNG — byte-distinct payloads of
    three different canvas shapes."""
    from go_map_reduce_spark.operators.multimodal import encode_png

    for pdf in batches:
        payloads, variants = [], []
        for doc_id in pdf["doc_id"]:
            grays = _lb_gray(doc_id)
            variant = ("bare", "letterbox", "pillarbox", "framed")[
                (doc_id // LB_RESIDUES) % 4
            ]
            if variant == "letterbox":
                canvas = (
                    [[0] * LB_SIDE] * LB_PAD
                    + grays
                    + [[0] * LB_SIDE] * LB_PAD
                )
            elif variant == "pillarbox":
                canvas = [[0] * LB_PAD + row + [0] * LB_PAD for row in grays]
            elif variant == "framed":
                w = LB_SIDE + 2 * LB_FRAME
                canvas = (
                    [[0] * w] * LB_FRAME
                    + [[0] * LB_FRAME + row + [0] * LB_FRAME for row in grays]
                    + [[0] * w] * LB_FRAME
                )
            else:
                canvas = grays
            # numpy form of the per-pixel RGB triple: identical bytes
            import numpy as np

            rgb = np.repeat(np.asarray(canvas, dtype=np.uint8), 3, axis=1)
            rows = [rgb[y].tobytes() for y in range(rgb.shape[0])]
            payloads.append(encode_png(len(canvas[0]), len(canvas), rows))
            variants.append(variant)
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "variant": variants, "payload": payloads}
        )


def _lb_hash_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """REAL PNG decode (chunk walk + filter reconstruction), exact
    border trim (drop rows/columns that are entirely zero — content
    pixels are >= 1 by construction, so the content bounding box is
    exact), then the pipeline33 exact-integer average hash over the
    trimmed {LB_SIDE}x{LB_SIDE} content."""
    import numpy as np

    from go_map_reduce_spark.operators.multimodal import decode_image

    for pdf in batches:
        out = {"doc_id": [], "variant": [], "ahash": []}
        for doc_id, variant, payload in zip(
            pdf["doc_id"], pdf["variant"], pdf["payload"]
        ):
            w, h, bpp, px = decode_image(bytes(payload))
            gray = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)[:, :, 0]
            keep_r = np.nonzero(gray.any(axis=1))[0]
            keep_c = np.nonzero(gray.any(axis=0))[0]
            content = gray[
                keep_r[0] : keep_r[-1] + 1, keep_c[0] : keep_c[-1] + 1
            ]
            if content.shape != (LB_SIDE, LB_SIDE):
                raise ValueError(f"unexpected content dims {content.shape}")
            cells = (
                content.astype(np.int64).reshape(8, 4, 8, 4).sum(axis=(1, 3))
            )
            total = int(content.astype(np.int64).sum())
            bits = 64 * cells > total
            out["doc_id"].append(doc_id)
            out["variant"].append(variant)
            out["ahash"].append(
                "".join("1" if b else "0" for b in bits.ravel())
            )
        yield pd.DataFrame(out)


@query(
    "image_letterbox_dedup",
    oracle=f"""
    WITH lb_docs AS (
      SELECT doc_id, doc_id % {LB_RESIDUES} AS res,
             CASE (doc_id // {LB_RESIDUES}) % 4
                  WHEN 0 THEN 'bare'
                  WHEN 1 THEN 'letterbox'
                  WHEN 2 THEN 'pillarbox'
                  ELSE 'framed' END AS variant
      FROM documents
    ),
    lb_blocks AS (
      SELECT res, bx, by,
             ({LB_M_RES} * res + {LB_M_BX} * bx + {LB_M_BY} * by) % 200 AS g
      FROM (SELECT DISTINCT res FROM lb_docs),
           range({LB_BLOCKS}) t1(bx), range({LB_BLOCKS}) t2(by)
    ),
    lb_tot AS (SELECT res, SUM(g) AS total FROM lb_blocks GROUP BY res),
    lb_bits AS (
      SELECT b.res, b.bx, b.by,
             CASE WHEN {LB_BLOCKS * LB_BLOCKS} * b.g > t.total
                  THEN '1' ELSE '0' END AS bit
      FROM lb_blocks b JOIN lb_tot t ON t.res = b.res
    ),
    lb_rows AS (
      SELECT res, by, string_agg(repeat(bit, 2), '' ORDER BY bx) AS rowstr
      FROM lb_bits GROUP BY res, by
    ),
    lb_hashes AS (
      SELECT res, string_agg(rowstr || rowstr, '' ORDER BY by) AS ahash
      FROM lb_rows GROUP BY res
    ),
    lb_tagged AS (
      SELECT d.doc_id, d.variant, h.ahash
      FROM lb_docs d JOIN lb_hashes h ON h.res = d.res
    )
    SELECT ahash,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST(COUNT(DISTINCT variant) AS BIGINT) AS n_variants,
           CAST(SUM(CASE WHEN variant = 'bare' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bare,
           CAST(SUM(CASE WHEN variant = 'letterbox' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_letterbox,
           CAST(SUM(CASE WHEN variant = 'pillarbox' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pillarbox,
           CAST(SUM(CASE WHEN variant = 'framed' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_framed
    FROM lb_tagged GROUP BY ahash
    """,
)
def image_letterbox_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Letterbox/pillarbox-invariant image dedup — the image sibling
    of ``audio_shift_dedup``: the same content pixels arrive bare,
    letterboxed (+{LB_PAD}px black bars top/bottom), pillarboxed
    (+{LB_PAD}px bars left/right), and framed (+{LB_FRAME}px all
    around) — four byte-distinct PNG payloads on THREE different
    canvas shapes, which both exact dedup and a raw whole-canvas
    perceptual hash fail to collapse (the bars shift every cell
    boundary and drag the mean down; pinned in tests).  Every payload
    is really decoded; the exact border trim (content pixels are >= 1
    by construction, bars are exact zero) recovers the content
    bounding box, and the pipeline33 exact-integer average hash
    collapses each content residue to ONE cluster.  The oracle
    predicts every hash bit from the unshifted block closed form (the
    uniform +1 content offset cancels like the brightness jitter) —
    no codec and no trim logic on the DuckDB side — so a wrong
    bounding box or an off-by-one bar width fails the hash gate.

    100 TB shape: identical to the cross-codec tier — two Arrow-
    batched map stages (encode / decode+trim+hash; pixels never
    shuffle), one shuffle of 64-bit hash keys for the cluster
    aggregate.  The trim is one row/column scan inside the map task:
    framing-robustness costs zero payload shuffles."""
    from go_map_reduce_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    ids = _spread_ids(spark, sf_dir)
    media = ids.mapInPandas(
        _lb_synth_batch,
        schema="doc_id long, variant string, payload binary",
    )
    hashed = media.mapInPandas(
        _lb_hash_batch,
        schema="doc_id long, variant string, ahash string",
    )
    return hashed.groupBy("ahash").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.count_distinct("variant").cast("long").alias("n_variants"),
        F.sum((F.col("variant") == "bare").cast("long"))
        .cast("long")
        .alias("n_bare"),
        F.sum((F.col("variant") == "letterbox").cast("long"))
        .cast("long")
        .alias("n_letterbox"),
        F.sum((F.col("variant") == "pillarbox").cast("long"))
        .cast("long")
        .alias("n_pillarbox"),
        F.sum((F.col("variant") == "framed").cast("long"))
        .cast("long")
        .alias("n_framed"),
    )
