"""Round-13 second batch: the incremental CROSS-MODAL admit.

``incremental_dedup_new_batch`` (pipeline20) gave the daily-crawl
shape for TEXT: batch-vs-index band-key join, index never self-joined.
``crossmodal_dedup_survivors`` (pipeline35) gave the unified identity
across text + image + audio + video — but as a BATCH recompute.  A
production pipeline needs both at once: each day's batch must be
admitted against the STANDING corpus's content identity in every
modality, at daily cost O(|batch|) + a broadcast of the standing
fingerprint index, never a corpus self-join.

This tier defines its OWN batch carve-out, doc_id % {XM_BATCH_MOD} ==
{XM_BATCH_REM}, NOT the pipeline20 one: doc_id % 10 == 7 forces
doc_id % 5 == 2, i.e. every pipeline20 batch doc would be an
image/audio carrier and none a video carrier or non-carrier — the
coupled-key aliasing the pipeline34 postmortem warned about, which
would leave two of the operator's four decision paths corpus-untested.
{XM_BATCH_MOD} is coprime to the carrier modulus 5 (and to the
content moduli 16 / 3), so the batch spans image, audio and video
carriers AND non-carriers.  The text side re-instantiates the ONE
shingle/signature/band implementation (operators/dedup.py) under this
carve-out — same pieces, third consumption pattern, exactly how
pipeline20 consumed them.

Reference anchor: the reference's map-side first-wins dedup
(mrapps/indexer.go:21-26) is the in-batch election's seed; the
standing-index contract extends mr/s3.go's bucket-as-source-of-truth
discipline to derived fingerprint state.

Composition queries import tier functions directly (package
convention: the staleness closure must see the edges)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.operators.dedup import (
    _SQL_BANDS,
    _SQL_SHINGLES,
    _SQL_SIGS,
    _doc_shingle_sets,
    _spark_bands,
    _spark_signatures,
    _verify_jaccard,
    JACCARD_THRESHOLD,
    LSH_BUCKET_CAP,
)
from go_map_reduce_spark.operators.pipeline33 import (
    AUD_TAGGED_CTES,
    CC_TAGGED_CTES,
)
from go_map_reduce_spark.operators.pipeline34 import (
    _AUD_RANK_SQL,
    _IMG_RANK_SQL,
    _PREF_BASE,
    AUD_RANK,
    IMG_RANK,
    _rank_col,
)
from go_map_reduce_spark.operators.pipeline35 import (
    _IS_AUD_CARRIER_SQL,
    _IS_IMG_CARRIER_SQL,
    _IS_VID_CARRIER_SQL,
    _VID_RANK_SQL,
    VID_RANK,
    VPD_TAGGED_CTES,
    _carrier_media_frames,
)
from go_map_reduce_spark.registry import query, track_cache

XM_BATCH_MOD = 7
XM_BATCH_REM = 3
_IS_XM_BATCH_SQL = f"doc_id % {XM_BATCH_MOD} = {XM_BATCH_REM}"

# The asymmetric text near-dup check under THIS tier's carve-out —
# the pipeline20 oracle body with the residue swapped and only the
# verdict column kept (no best-match columns: the admit needs a
# boolean, not a provenance row).
_TXT_SQL = f"""
    WITH sh AS ({_SQL_SHINGLES}),
         sigs AS ({_SQL_SIGS}),
         bands AS ({_SQL_BANDS}),
         bcnt AS (
           SELECT band, bkey FROM bands
           GROUP BY band, bkey HAVING COUNT(*) <= {LSH_BUCKET_CAP}
         ),
         small AS (
           SELECT b.doc_id, b.band, b.bkey
           FROM bands b JOIN bcnt USING (band, bkey)
         ),
         cand AS (
           SELECT DISTINCT n.doc_id AS doc_a, i.doc_id AS doc_b
           FROM small n JOIN small i
             ON n.band = i.band AND n.bkey = i.bkey
           WHERE n.doc_id % {XM_BATCH_MOD} = {XM_BATCH_REM}
             AND i.doc_id % {XM_BATCH_MOD} <> {XM_BATCH_REM}
         ),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         inter AS (
           SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
           FROM cand c
           JOIN sh sa ON sa.doc_id = c.doc_a
           JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
           GROUP BY c.doc_a, c.doc_b
         ),
         hit AS (
           SELECT DISTINCT i.doc_a AS doc_id
           FROM inter i
           JOIN sizes na ON na.doc_id = i.doc_a
           JOIN sizes nb ON nb.doc_id = i.doc_b
           WHERE CAST(i.n_inter AS DOUBLE) / (na.n + nb.n - i.n_inter)
                 >= {JACCARD_THRESHOLD}
         )
    SELECT d.doc_id, (h.doc_id IS NOT NULL) AS text_dup
    FROM (SELECT doc_id FROM documents WHERE {_IS_XM_BATCH_SQL}) d
    LEFT JOIN hit h ON h.doc_id = d.doc_id
"""


def _text_dup_vs_standing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, text_dup) for every XM-batch doc: any STANDING doc a
    verified near-dup (exact shingle Jaccard >= {JACCARD_THRESHOLD}
    among capped LSH band-key candidates)?  The pipeline20 asymmetric
    join — batch side small, index never self-joined — re-instantiated
    under this tier's carve-out from the one registered
    shingle/signature/band implementation."""
    docsets = _doc_shingle_sets(spark, sf_dir).persist().transform(track_cache)
    bands = _spark_bands(_spark_signatures(docsets))
    bsz = F.count(F.lit(1)).over(W.partitionBy("band", "bkey"))
    small = bands.withColumn("bsz", bsz).where(
        F.col("bsz") <= LSH_BUCKET_CAP
    ).drop("bsz")
    is_new = (F.col("doc_id") % XM_BATCH_MOD) == XM_BATCH_REM
    n, i = small.where(is_new).alias("n"), small.where(~is_new).alias("i")
    cand = (
        n.join(
            i,
            (F.col("n.band") == F.col("i.band"))
            & (F.col("n.bkey") == F.col("i.bkey")),
        )
        .select(
            F.col("n.doc_id").alias("doc_a"), F.col("i.doc_id").alias("doc_b")
        )
        .distinct()
    )
    hit = (
        _verify_jaccard(docsets, cand)
        .select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    batch_docs = docsets.where(is_new).select("doc_id")
    return batch_docs.join(hit, "doc_id", "left").select(
        "doc_id", F.coalesce("hit", F.lit(False)).alias("text_dup")
    )


def _media_decisions(
    batchc: DataFrame, standing_fp: DataFrame
) -> DataFrame:
    """The media half of the admit decision, as a pure frame-to-frame
    operator: given the batch carriers (doc_id, modality, fp, rnk) and
    the standing fingerprint index (modality, fp), emit per batch
    carrier (doc_id, modality, media_dup_standing, media_dup_batch).
    Factored out so the in-batch election path is unit-testable on a
    synthetic novel-content frame: on the SYNTHETIC corpus every
    perceptual content also exists among standing carriers (the tiers
    deliberately use ~11-16 contents corpus-wide), so the election is
    corpus-degenerate there — pinned in tests both ways (all-standing
    on the corpus; keeper/reject on the synthetic frame).  The real
    case it models: a NEW viral content re-uploaded k times in one
    day's crawl."""
    standing = standing_fp.select("modality", "fp").distinct().withColumn(
        "standing", F.lit(True)
    )
    pref = F.when(
        F.col("doc_id") >= _PREF_BASE,
        F.raise_error(
            F.concat(
                F.lit("doc_id overflows the packed preference key "
                      f"(>= 2^40={_PREF_BASE}): "),
                F.col("doc_id").cast("string"),
            )
        ).cast("long"),
    ).otherwise(F.col("rnk") * F.lit(_PREF_BASE) + F.col("doc_id"))
    packed = batchc.withColumn("pref", pref.cast("long"))
    keeper = packed.groupBy("modality", "fp").agg(
        F.min_by("doc_id", "pref").alias("kdoc")
    )
    return (
        packed.join(F.broadcast(standing), ["modality", "fp"], "left")
        .join(F.broadcast(keeper), ["modality", "fp"])
        .select(
            "doc_id",
            "modality",
            F.coalesce("standing", F.lit(False)).alias("media_dup_standing"),
            (
                ~F.coalesce("standing", F.lit(False))
                & (F.col("doc_id") != F.col("kdoc"))
            ).alias("media_dup_batch"),
        )
    )


def _all_carrier_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, modality, fp, rnk) for every media carrier — the three
    pipeline35 carrier slices under one normalized fingerprint schema,
    with the survivor-preference rank computed per modality so the
    in-batch election packs it exactly like pipeline34 does."""
    imgc, audc, vidc = _carrier_media_frames(spark, sf_dir)
    img = imgc.select(
        "doc_id",
        F.lit("image").alias("modality"),
        F.col("ahash").alias("fp"),
        _rank_col("codec", IMG_RANK).cast("long").alias("rnk"),
    )
    aud = audc.select(
        "doc_id",
        F.lit("audio").alias("modality"),
        F.col("afp").alias("fp"),
        _rank_col("layout", AUD_RANK).cast("long").alias("rnk"),
    )
    vid = vidc.select(
        "doc_id",
        F.lit("video").alias("modality"),
        F.col("vfp").alias("fp"),
        _rank_col("variant", VID_RANK).cast("long").alias("rnk"),
    )
    return img.unionByName(aud).unionByName(vid)


@query(
    "crossmodal_incremental_admit",
    oracle=f"""
    WITH {CC_TAGGED_CTES},
    {AUD_TAGGED_CTES},
    {VPD_TAGGED_CTES},
    car AS (
      SELECT doc_id, 'image' AS modality, ahash AS fp,
             ({_IMG_RANK_SQL}) AS rnk
      FROM tagged WHERE {_IS_IMG_CARRIER_SQL}
      UNION ALL
      SELECT doc_id, 'audio', afp, ({_AUD_RANK_SQL})
      FROM aud_tagged WHERE {_IS_AUD_CARRIER_SQL}
      UNION ALL
      SELECT doc_id, 'video', vfp, ({_VID_RANK_SQL})
      FROM vpd_tagged WHERE {_IS_VID_CARRIER_SQL}
    ),
    standing_fp AS (
      SELECT DISTINCT modality, fp FROM car
      WHERE NOT (doc_id % {XM_BATCH_MOD} = {XM_BATCH_REM})
    ),
    batchc AS (SELECT * FROM car WHERE {_IS_XM_BATCH_SQL}),
    keeper AS (
      SELECT modality, fp,
             arg_min(doc_id, rnk * {_PREF_BASE} + doc_id) AS kdoc
      FROM batchc GROUP BY modality, fp
    ),
    txt AS ({_TXT_SQL})
    SELECT d.doc_id,
           COALESCE(b.modality, 'none') AS modality,
           t.text_dup,
           COALESCE(b.doc_id IS NOT NULL AND s.fp IS NOT NULL, FALSE)
             AS media_dup_standing,
           COALESCE(b.doc_id IS NOT NULL AND s.fp IS NULL
                    AND d.doc_id <> k.kdoc, FALSE) AS media_dup_batch,
           NOT t.text_dup
             AND NOT COALESCE(s.fp IS NOT NULL, FALSE)
             AND NOT COALESCE(b.doc_id IS NOT NULL AND s.fp IS NULL
                              AND d.doc_id <> k.kdoc, FALSE) AS admit
    FROM (SELECT doc_id FROM documents WHERE {_IS_XM_BATCH_SQL}) d
    JOIN txt t ON t.doc_id = d.doc_id
    LEFT JOIN batchc b ON b.doc_id = d.doc_id
    LEFT JOIN standing_fp s
      ON s.modality = b.modality AND s.fp = b.fp
    LEFT JOIN keeper k ON k.modality = b.modality AND k.fp = b.fp
    """,
)
def crossmodal_incremental_admit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Admit each daily-batch document against the STANDING corpus's
    content identity in EVERY modality: text (asymmetric LSH +
    verified Jaccard, re-instantiated from the registered
    shingle/signature pieces under this tier's carve-out), and
    carried media (image aHash / audio energy fingerprint / video
    sequence fingerprint — the pipeline35 carrier model).  A batch
    doc is rejected if its text near-dups the index (``text_dup``),
    its media content already exists among standing carriers
    (``media_dup_standing``), or its media content is novel but
    another batch carrier won the within-batch election for that
    fingerprint (``media_dup_batch`` — packed (format-rank, doc_id)
    arg-min, so the first/most-lossless upload of novel content is
    the one admitted).  Non-carriers pass the media checks vacuously
    (modality 'none').  The {XM_BATCH_MOD}-coprime carve-out keeps
    the modality paths corpus-exercised (module docstring); the
    in-batch election is corpus-DEGENERATE on the synthetic tiers
    (every perceptual content also exists among standing carriers, so
    media_dup_batch is all-false there — pinned BOTH ways: degeneracy
    on the corpus, keeper/reject mechanics on a synthetic
    novel-content frame through the same _media_decisions operator).

    Oracle: composes the shared shingle/band SQL pieces and the three
    closed-form fingerprint CTE bodies; the election replays the
    pipeline34 packed arg-min.  No LSH, codec or election logic
    duplicated on the DuckDB side.

    100 TB shape — the daily-crawl cost model, now cross-modal: the
    text side is the batch-vs-index band join (index never
    self-joins); the standing fingerprint set is DISTINCT (modality,
    fp) — at scale a stored index table, small enough to broadcast
    (≤ #distinct perceptual contents), so the media check is a
    broadcast hash join against batch carriers only; the in-batch
    election is one groupBy over (modality, fp) of the BATCH slice
    with a map-side-combinable packed min.  Daily work is
    O(|batch| · bucket) + O(|batch|) — independent of corpus size;
    nothing re-decodes standing payloads (the fp frames are the
    session-memoized decode tiers; at 100 TB, yesterday's stored
    index)."""
    txt = _text_dup_vs_standing(spark, sf_dir)
    car = _all_carrier_fps(spark, sf_dir)
    is_new = (F.col("doc_id") % XM_BATCH_MOD) == XM_BATCH_REM
    media = _media_decisions(
        car.where(is_new), car.where(~is_new).select("modality", "fp")
    )
    batch_docs = (
        load_table(spark, sf_dir, "documents").select("doc_id").where(is_new)
    )
    return (
        batch_docs.join(txt, "doc_id")
        .join(media, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("modality", F.lit("none")).alias("modality"),
            "text_dup",
            F.coalesce("media_dup_standing", F.lit(False)).alias(
                "media_dup_standing"
            ),
            F.coalesce("media_dup_batch", F.lit(False)).alias(
                "media_dup_batch"
            ),
            (
                ~F.col("text_dup")
                & ~F.coalesce("media_dup_standing", F.lit(False))
                & ~F.coalesce("media_dup_batch", F.lit(False))
            ).alias("admit"),
        )
    )
