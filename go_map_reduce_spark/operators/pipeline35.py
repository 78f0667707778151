"""Round-12 pipeline operators: the cross-modal dedup capstone, the
media admit stage the curation funnel composes, video's perceptual
dedup tier, and the erasure cascade into the DERIVED stores.

``crossmodal_dedup_survivors`` is the endgame of the dedup tiers: a
real crawl dedups the DOCUMENT, not each modality separately.  The
verified text near-dup pairs (MinHash-LSH banded + exact-Jaccard),
the image perceptual clusters (cross-codec aHash) and the audio
perceptual clusters (layout-invariant energy fingerprint) union into
ONE edge set over one doc universe, the registered large-star
connected-components operator contracts it, and one survivor per
unified cluster is elected under a single composed policy: quality
(content mass) first, then lossless-media preference (the pipeline34
rank tables: PNG < BMP < JPEG, mono < stereo < loud), then doc_id.
Media cluster co-membership enters the edge set as STAR edges (every
member → the cluster's minimum doc_id): connectivity-equivalent to
the all-pairs co-membership relation but LINEAR in cluster size — an
all-pairs encoding of a 10k-member boilerplate cluster would emit
5·10⁷ edges before CC even started.  Media edges are scoped to the
MEDIA CARRIERS (the funnel stage's model, below): in the synthetic
corpus every doc_id synthesizes an image and an audio track from only
~11+16 distinct perceptual contents, so unscoped media co-membership
would contract the entire corpus into ONE cluster (measured at
sf0.01) and the capstone would report nothing; the carrier slice is
also the semantically honest universe — a document that carries no
media has no media co-membership.

``media_admit_decision`` is the funnel-facing form of the media tier:
a deterministic ~20% of documents CARRY a media object (image or
audio, alternating), and a carrier is admitted iff it is its
perceptual cluster's survivor among carriers — the
``media_dedup_survivors`` arg-min policy applied to the carrier
slice.  The carrier model is deliberately sparse: the synthetic media
tiers give EVERY doc_id an image and an audio track with only ~11+16
distinct perceptual contents corpus-wide, so gating the whole corpus
on global survivorship would collapse the text funnel to ~27
documents and destroy every downstream funnel consumer; a ~20% slice
keeps the media stage a real, attributable funnel stage (the r11
verdict's media_dropped) without the degenerate corpus shape.
Non-carriers pass vacuously.

Reference anchor: the map-side dedup in mrapps/indexer.go:21-26 is
the engine-level seed of the survivor tier; the erasure discipline
extends the reference's truncate-then-rebuild storage contract
(mr/s3.go:92-124) to derived state.

Composition queries import tier functions directly (package
convention: the staleness closure must see the edges)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.operators.advanced import _cc_largestar
from go_map_reduce_spark.operators.dedup import minhash_near_dup_pairs
from go_map_reduce_spark.operators.pipeline33 import (
    AUD_TAGGED_CTES,
    CC_TAGGED_CTES,
    audio_fp_frame,
    cc_hashed_frame,
)
from go_map_reduce_spark.operators.pipeline34 import (
    _AUD_RANK_SQL,
    _IMG_RANK_SQL,
    _PREF_BASE,
    AUD_RANK,
    IMG_RANK,
    _rank_col,
    _survivor_agg,
)
from go_map_reduce_spark.operators.textstats import text_quality_scores
from go_map_reduce_spark.registry import ORACLES, query, shared_frame

# --------------------------------------------------------------------------
# The media admit stage (consumed by the curation funnel, pipeline27)
# --------------------------------------------------------------------------

# A document CARRIES a media object iff doc_id % MOD == REM (~20% of the
# corpus); the carried object alternates image/audio via doc_id // MOD
# (decoupled from the carrier predicate AND from the media tiers'
# doc_id % 16 content residues — the pipeline34 coupled-key lesson).
MEDIA_CARRIER_MOD = 5
MEDIA_CARRIER_REM = 2

# The survivor election CTEs over the carrier slice, given the
# pipeline33 closed-form CTE bodies (CC_TAGGED_CTES → tagged,
# AUD_TAGGED_CTES → aud_tagged) are in scope.  ``msv`` is the admitted
# carrier set: one survivor per carrier-populated perceptual cluster,
# elected by the IDENTICAL packed arg-min the media_dedup_survivors act
# registers.
_IS_IMG_CARRIER_SQL = (
    f"doc_id % {MEDIA_CARRIER_MOD} = {MEDIA_CARRIER_REM}"
    f" AND (doc_id // {MEDIA_CARRIER_MOD}) % 2 = 0"
)
_IS_AUD_CARRIER_SQL = (
    f"doc_id % {MEDIA_CARRIER_MOD} = {MEDIA_CARRIER_REM}"
    f" AND (doc_id // {MEDIA_CARRIER_MOD}) % 2 = 1"
)

MEDIA_SV_CTES = f"""
    media_img_sv AS (
      SELECT CAST(arg_min(doc_id, ({_IMG_RANK_SQL}) * {_PREF_BASE} + doc_id)
                  AS BIGINT) AS sdoc
      FROM tagged WHERE {_IS_IMG_CARRIER_SQL}
      GROUP BY ahash
    ),
    media_aud_sv AS (
      SELECT CAST(arg_min(doc_id, ({_AUD_RANK_SQL}) * {_PREF_BASE} + doc_id)
                  AS BIGINT) AS sdoc
      FROM aud_tagged WHERE {_IS_AUD_CARRIER_SQL}
      GROUP BY afp
    ),
    msv AS (SELECT sdoc FROM media_img_sv
            UNION ALL SELECT sdoc FROM media_aud_sv)
"""

# media_ok as a SQL predicate over a documents-keyed relation aliased
# ``d`` with ``msv`` in scope (pipeline27 embeds this in STAGED_ORACLE).
MEDIA_OK_SQL = (
    f"(d.doc_id % {MEDIA_CARRIER_MOD} <> {MEDIA_CARRIER_REM}"
    " OR sv.sdoc IS NOT NULL)"
)


def _carrier(col: F.Column) -> F.Column:
    return (col % MEDIA_CARRIER_MOD) == MEDIA_CARRIER_REM


def _carrier_media_frames(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The carrier slices of the two decoded media frames: image
    carriers of cc_hashed_frame, audio carriers of audio_fp_frame.
    ONE definition of 'which documents carry which media' shared by
    the funnel stage and the cross-modal capstone, so the two cannot
    drift."""
    img = cc_hashed_frame(spark, sf_dir)
    aud = audio_fp_frame(spark, sf_dir)
    side = F.expr(f"doc_id DIV {MEDIA_CARRIER_MOD}") % 2
    imgc = img.where(_carrier(F.col("doc_id")) & (side == 0))
    audc = aud.where(_carrier(F.col("doc_id")) & (side == 1))
    return imgc, audc


def media_survivor_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The admitted carrier set — one survivor doc_id per
    carrier-populated perceptual cluster (image clusters among image
    carriers, audio clusters among audio carriers), elected by the
    registered ``_survivor_agg`` arg-min policy.  Tiny by construction
    (≤ #distinct perceptual keys rows), so every consumer broadcasts
    it: the media stage adds ZERO shuffles to the funnel."""
    imgc, audc = _carrier_media_frames(spark, sf_dir)
    img_sv = _survivor_agg(
        imgc, "ahash", "codec", _rank_col("codec", IMG_RANK)
    ).select(F.col("survivor_doc_id").alias("doc_id"))
    aud_sv = _survivor_agg(
        audc, "afp", "layout", _rank_col("layout", AUD_RANK)
    ).select(F.col("survivor_doc_id").alias("doc_id"))
    return img_sv.unionByName(aud_sv)


def media_keep_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, media_ok) for EVERY document: non-carriers pass
    vacuously; a carrier passes iff it is its cluster's survivor.
    One broadcast left join of the tiny survivor set — no shuffle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    sv = media_survivor_ids(spark, sf_dir).withColumn("is_sv", F.lit(True))
    return docs.join(F.broadcast(sv), "doc_id", "left").select(
        "doc_id",
        (~_carrier(F.col("doc_id")) | F.coalesce("is_sv", F.lit(False))).alias(
            "media_ok"
        ),
    )


@query(
    "media_admit_decision",
    oracle=f"""
    WITH {CC_TAGGED_CTES},
    {AUD_TAGGED_CTES},
    {MEDIA_SV_CTES}
    SELECT d.doc_id,
           d.doc_id % {MEDIA_CARRIER_MOD} = {MEDIA_CARRIER_REM} AS is_carrier,
           {MEDIA_OK_SQL} AS media_ok
    FROM documents d LEFT JOIN msv sv ON sv.sdoc = d.doc_id
    """,
)
def media_admit_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media funnel stage as its own gated artifact: per document,
    whether it carries media and whether the media stage admits it
    (non-carrier, or its perceptual cluster's survivor among
    carriers).  This is the per-doc decision column
    ``staged_decisions`` (pipeline27) composes; registering it
    separately bisects a funnel regression to the stage in one
    artifact read, exactly like the gate/cut/keep/split stages.

    100 TB shape: the survivor election is one groupBy per media tier
    over the carrier slice (the pipeline34 plan), the decision itself
    a broadcast left join of the ≤ #clusters survivor set against a
    doc_id-only scan — no corpus shuffle anywhere."""
    dec = media_keep_decision(spark, sf_dir)
    return dec.select(
        "doc_id", _carrier(F.col("doc_id")).alias("is_carrier"), "media_ok"
    )


# --------------------------------------------------------------------------
# The cross-modal dedup capstone
# --------------------------------------------------------------------------


def _star_edges(frame: DataFrame, key: str) -> DataFrame:
    """Cluster co-membership as star edges (member → cluster-min
    doc_id): the connectivity of the co-membership relation in
    LINEAR edges per cluster.  One map-side-combinable min per key
    plus one broadcastable hub join — never the quadratic all-pairs
    expansion."""
    hubs = frame.groupBy(key).agg(F.min("doc_id").alias("hub"))
    return (
        frame.join(hubs, key)
        .where(F.col("doc_id") != F.col("hub"))
        .select(F.col("doc_id").alias("doc_a"), F.col("hub").alias("doc_b"))
    )


def _crossmodal_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unified (doc_id, cluster_id) over text ∪ image ∪ audio edges via
    the registered large-star operator — memoized per context
    (registry.shared_frame): the unified cluster assignment is the
    frame a cross-modal pipeline composes on, and its lineage contains
    the LSH verify join plus both media decode tiers."""

    def _build() -> DataFrame:
        txt = minhash_near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
        imgc, audc = _carrier_media_frames(spark, sf_dir)
        edges = (
            txt.union(_star_edges(imgc, "ahash"))
            .union(_star_edges(audc, "afp"))
            .localCheckpoint(eager=True)
        )
        return _cc_largestar(edges).localCheckpoint(eager=True)

    return shared_frame(
        spark, f"crossmodal_labels:{sf_dir}", _build, data_path=sf_dir
    )


@query(
    "crossmodal_dedup_survivors",
    oracle=f"""
    WITH RECURSIVE
    {CC_TAGGED_CTES},
    {AUD_TAGGED_CTES},
    txt_pairs AS (
      SELECT doc_a, doc_b FROM ({ORACLES["minhash_near_dup_pairs"]})
    ),
    imgc AS (SELECT * FROM tagged WHERE {_IS_IMG_CARRIER_SQL}),
    audc AS (SELECT * FROM aud_tagged WHERE {_IS_AUD_CARRIER_SQL}),
    img_hub AS (SELECT ahash, MIN(doc_id) AS hub FROM imgc GROUP BY ahash),
    img_edges AS (
      SELECT t.doc_id AS doc_a, h.hub AS doc_b
      FROM imgc t JOIN img_hub h ON h.ahash = t.ahash
      WHERE t.doc_id <> h.hub
    ),
    aud_hub AS (SELECT afp, MIN(doc_id) AS hub FROM audc GROUP BY afp),
    aud_edges AS (
      SELECT a.doc_id AS doc_a, a2.hub AS doc_b
      FROM audc a JOIN aud_hub a2 ON a2.afp = a.afp
      WHERE a.doc_id <> a2.hub
    ),
    all_edges AS (
      SELECT doc_a, doc_b FROM txt_pairs
      UNION SELECT doc_a, doc_b FROM img_edges
      UNION SELECT doc_a, doc_b FROM aud_edges
    ),
    sym AS (SELECT doc_a AS a, doc_b AS b FROM all_edges
            UNION SELECT doc_b, doc_a FROM all_edges),
    reach(a, b) AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ),
    labels AS (
      SELECT a AS doc_id, least(a, MIN(b)) AS cluster_id
      FROM reach GROUP BY a
    ),
    quality AS ({ORACLES["text_quality_scores"]}),
    members AS (
      SELECT d.doc_id,
             COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
             CAST(COALESCE(q.n_tokens, 0) AS BIGINT) AS n_tokens,
             t.codec, au.layout,
             ic.ahash AS c_ahash, ac.afp AS c_afp
      FROM documents d
      JOIN tagged t ON t.doc_id = d.doc_id
      JOIN aud_tagged au ON au.doc_id = d.doc_id
      LEFT JOIN imgc ic ON ic.doc_id = d.doc_id
      LEFT JOIN audc ac ON ac.doc_id = d.doc_id
      LEFT JOIN labels l ON l.doc_id = d.doc_id
      LEFT JOIN quality q ON q.doc_id = d.doc_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY cluster_id
               ORDER BY n_tokens DESC, ({_IMG_RANK_SQL}),
                        ({_AUD_RANK_SQL}), doc_id
             ) AS rk
      FROM members
    ),
    surv AS (
      SELECT cluster_id, doc_id AS survivor_doc_id,
             n_tokens AS survivor_n_tokens,
             codec AS survivor_codec, layout AS survivor_layout
      FROM ranked WHERE rk = 1
    ),
    agg AS (
      SELECT cluster_id,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT c_ahash) AS BIGINT) AS n_img_clusters,
             CAST(COUNT(DISTINCT c_afp) AS BIGINT) AS n_aud_clusters,
             CAST(COUNT(*) - 1 AS BIGINT) AS cut_count
      FROM members GROUP BY cluster_id
    )
    SELECT a.cluster_id, a.n_docs, a.n_img_clusters, a.n_aud_clusters,
           CAST(s.survivor_doc_id AS BIGINT) AS survivor_doc_id,
           s.survivor_n_tokens, s.survivor_codec, s.survivor_layout,
           a.cut_count
    FROM agg a JOIN surv s ON s.cluster_id = a.cluster_id
    """,
)
def crossmodal_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cross-modal dedup capstone: ONE cluster graph, ONE survivor
    policy.  Verified text near-dup pairs, image perceptual
    co-membership and audio perceptual co-membership (both as
    linear-size star edges) union over the document universe; the
    registered large-star operator contracts the graph in O(log n)
    rounds; every document lands in exactly one unified cluster
    (isolated docs are singletons); and each cluster keeps ONE
    survivor under the composed policy — most content (n_tokens)
    first, then the lossless-media preference tables the
    media_dedup_survivors act registers (PNG < BMP < JPEG, then
    mono < stereo < loud), then lowest doc_id.  Emits per unified
    cluster: member count, how many image / audio perceptual clusters
    it absorbs (each per-modality cluster is a REFINEMENT of the
    unified clustering — pinned in tests), the survivor's identity /
    content mass / formats, and the cut-list size.

    Oracle: composes the registered tier CTEs verbatim (pipeline33
    closed forms, the minhash pair SQL, the quality-tier SQL) with
    the recursive-CTE transitive closure the CC tier already gates
    against — no codec, no LSH and no graph logic duplicated on the
    DuckDB side beyond those registered bodies.

    100 TB shape: the media decode tiers read their session-memoized
    frames; star-edge construction is one short-key min-aggregate per
    tier; large-star is the registered O(log n) contraction whose
    edge frame only ever SHRINKS; the survivor election is one
    groupBy over cluster_id with a single struct-ordered ``min_by``
    per output column (map-side-combinable arg-min — no window over
    the corpus, no members-vs-cluster self-join).  Everything heavy
    is linear in edges, and the edge encoding keeps edges linear in
    members."""
    labels = _crossmodal_labels(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    quality = text_quality_scores(spark, sf_dir).select("doc_id", "n_tokens")
    img = cc_hashed_frame(spark, sf_dir).select("doc_id", "codec")
    aud = audio_fp_frame(spark, sf_dir).select("doc_id", "layout")
    imgc, audc = _carrier_media_frames(spark, sf_dir)
    img_k = imgc.select("doc_id", F.col("ahash").alias("c_ahash"))
    aud_k = audc.select("doc_id", F.col("afp").alias("c_afp"))
    members = (
        docs.join(labels, "doc_id", "left")
        .join(quality, "doc_id", "left")
        .join(img, "doc_id")
        .join(aud, "doc_id")
        .join(img_k, "doc_id", "left")
        .join(aud_k, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            "codec",
            "layout",
            "c_ahash",
            "c_afp",
        )
    )
    ordk = F.struct(
        (-F.col("n_tokens")).alias("neg_q"),
        _rank_col("codec", IMG_RANK).alias("img_rank"),
        _rank_col("layout", AUD_RANK).alias("aud_rank"),
        F.col("doc_id").alias("tie"),
    )
    return members.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_distinct("c_ahash").cast("long").alias("n_img_clusters"),
        F.count_distinct("c_afp").cast("long").alias("n_aud_clusters"),
        F.min_by("doc_id", ordk).cast("long").alias("survivor_doc_id"),
        F.min_by("n_tokens", ordk).cast("long").alias("survivor_n_tokens"),
        F.min_by("codec", ordk).alias("survivor_codec"),
        F.min_by("layout", ordk).alias("survivor_layout"),
        (F.count(F.lit(1)) - F.lit(1)).cast("long").alias("cut_count"),
    )
