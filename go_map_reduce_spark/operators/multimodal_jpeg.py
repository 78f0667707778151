"""JPEG multimodal tier: the compressed-codec decode that was
PIL-gated in earlier rounds, now native (functions/jpegcodec.py —
pure-stdlib marker/Huffman machinery + numpy DCT; public ITU-T T.81,
baseline AND progressive).

Query shape mirrors the BMP/PNG tiers: synthesize a deterministic
payload per document (mapInPandas encode stage), decode it back
(mapInPandas decode stage), compare typed features against a
closed-form SQL oracle. JPEG is LOSSY, so the synthesis is chosen to
make the codec exact where the oracle looks: every 8x8 block is
CONSTANT (DCT of a constant block is a single DC coefficient — no AC
rounding) and the quantization table is all-ones, so decoded pixels
equal the closed form bit-for-bit while the bitstream still exercises
DC differential coding, category/extend encoding, EOB, canonical DHT
construction, and byte unstuffing. Non-constant content is covered by
the codec's own round-trip pytests (tolerance ≤ 1, the float-DCT
rounding bound).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: F401

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.functions.jpegcodec import (
    decode_jpeg_gray,
    encode_jpeg_gray,
)
from go_map_reduce_spark.registry import query


def _synth_jpeg_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One deterministic grayscale JPEG per doc: width = 8*(1+doc_id%3),
    height = 8*(1+doc_id%2); block (bx, by) is solid
    (doc_id*7 + bx*13 + by*29) % 256 — closed-form, block-constant.

    The STREAM LAYOUT varies by doc_id so the one driver-gated query
    exercises all three entropy layouts: doc_id%3==0 encodes
    progressive (SOF2 — DC+AC first/refinement scans, EOBRUN),
    doc_id%3==1 baseline with restart markers every 2 MCUs (DRI/RSTn),
    else plain baseline. Block-constant content with an all-ones quant
    table decodes bit-exactly under every layout, so the closed-form
    oracle is layout-invariant."""
    from go_map_reduce_spark.functions.jpegcodec import (
        encode_jpeg_progressive_gray,
    )

    import numpy as np

    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            w, h = 8 * (1 + doc_id % 3), 8 * (1 + doc_id % 2)
            # numpy form of the per-pixel closed form: same bytes
            bx = (np.arange(w) // 8) * 13
            by = (np.arange(h) // 8) * 29
            img = (
                (int(doc_id) * 7 + bx[None, :] + by[:, None]) % 256
            ).astype(np.uint8)
            if doc_id % 3 == 0:
                # even ids in this slice also carry per-scan restart
                # markers — the progressive+DRI combination
                payloads.append(
                    encode_jpeg_progressive_gray(
                        w, h, img.tobytes(),
                        restart_interval=2 if doc_id % 2 == 0 else 0,
                    )
                )
            elif doc_id % 3 == 1:
                payloads.append(
                    encode_jpeg_gray(w, h, img.tobytes(), restart_interval=2)
                )
            else:
                payloads.append(encode_jpeg_gray(w, h, img.tobytes()))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def _decode_jpeg_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        out = {"doc_id": [], "width": [], "height": [], "bpp": [], "pixel_sum": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, bpp, px = decode_jpeg_gray(bytes(payload))
            out["doc_id"].append(doc_id)
            out["width"].append(w)
            out["height"].append(h)
            out["bpp"].append(bpp)
            # numpy form of sum(px): same integer
            out["pixel_sum"].append(int(np.frombuffer(px, np.uint8).sum()))
        yield pd.DataFrame(out)


@query(
    "multimodal_jpeg_decode",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             8 * (1 + doc_id % 3) AS w,
             8 * (1 + doc_id % 2) AS h
      FROM documents
    ),
    blocks AS (
      SELECT doc_id, w, h, by, unnest(range(w // 8)) AS bx
      FROM (SELECT doc_id, w, h, unnest(range(h // 8)) AS by FROM dims)
    )
    SELECT doc_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(8 AS BIGINT) AS bpp,
           CAST(SUM(64 * ((doc_id * 7 + bx * 13 + by * 29) % 256)) AS BIGINT)
             AS pixel_sum
    FROM blocks
    GROUP BY doc_id, w, h
    """,
)
def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG decode through the multimodal path: marker walk, DHT
    canonical-Huffman table build, entropy decode with DC prediction
    and byte unstuffing, dequantize, dezigzag, IDCT — the full T.81
    pipeline, dependency-free (functions/jpegcodec.py), across all
    three entropy layouts (baseline, baseline+restart markers,
    progressive SOF2 — one per doc_id residue class, see
    ``_synth_jpeg_batch``). The oracle predicts
    width/height/bpp/pixel_sum from the block-constant synthesis
    closed form (the construction under which the lossy codec is
    exact — see module docstring); any table-build, prediction, or
    IDCT-scaling mistake diverges pixel_sum. Two narrow mapInPandas
    stages, no shuffle — compressed media decode stays a map at
    100 TB."""
    from go_map_reduce_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    media = ids.mapInPandas(_synth_jpeg_batch, schema="doc_id long, payload binary")
    return media.mapInPandas(
        _decode_jpeg_batch,
        schema="doc_id long, width long, height long, bpp long, pixel_sum long",
    )
