"""Round-13 third batch: post-curation training-mixture planning.

After the funnel decides WHAT survives (gate → dedup → media), a
training run must decide HOW OFTEN to sample each source: raw
(natural) proportions let the largest crawl dominate, so production
mixtures are temperature-flattened — sample source s with probability
∝ tokens_s^(1/T).  ``source_mixture_plan`` computes the standard
T = 2 plan (sqrt weighting — chosen over a general pow() because IEEE
sqrt is correctly rounded and therefore bit-identical across engines)
over the funnel's kept documents: per source the kept doc/token mass,
its natural and temperature shares, the epochs a {TARGET_MULT}x-total
-token run would replay that source, and an over-cap flag
(> {EPOCH_CAP} epochs — the memorization-risk threshold a mixture
reviewer checks first).

Float determinism: token masses are exact longs; sqrt is per-row
IEEE; the weight DENOMINATOR is the only cross-row float aggregate
and goes through the registry's decimal detour
(functions/numeric.dsum — summation-order-free, oracle twin
sql_dsum); shares and epochs are then per-row double arithmetic with
identical association in both engines, rounded at 6dp for the output
(the match_jaccard precedent).

Reference anchor: the wc/indexer apps aggregate per-key mass
(mrapps/wc.go:21-44); mixture planning is that aggregate pointed at
the training loop.

Composition queries import tier functions directly (package
convention: the staleness closure must see the edges)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.functions.numeric import dsum, sql_dsum
from go_map_reduce_spark.operators.pipeline27 import (
    STAGED_ORACLE,
    staged_decisions,
)
from go_map_reduce_spark.operators.pipeline33 import (
    AUD_TAGGED_CTES,
    CC_TAGGED_CTES,
)
from go_map_reduce_spark.operators.pipeline35 import (
    _XM_CHAIN,
    VPD_TAGGED_CTES,
)
from go_map_reduce_spark.registry import query

TARGET_MULT = 3  # plan a 3x-total-kept-token training run
EPOCH_CAP = 4.0  # flag any source replayed more than this many times


@query(
    "source_mixture_plan",
    oracle=f"""
    WITH staged AS ({STAGED_ORACLE}),
    kept AS (
      SELECT d.source, st.n_tokens - st.n_removed AS tok
      FROM staged st JOIN documents d ON d.doc_id = st.doc_id
      WHERE st.gate_ok AND st.dedup_ok AND st.media_ok
    ),
    per_src AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
             CAST(SUM(tok) AS BIGINT) AS tokens_kept
      FROM kept GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(tokens_kept) AS BIGINT) AS total,
             {sql_dsum('sqrt(CAST(tokens_kept AS DOUBLE))')} AS wsum
      FROM per_src
    )
    SELECT p.source, p.n_docs_kept, p.tokens_kept,
           round(CAST(p.tokens_kept AS DOUBLE) / t.total, 6) AS nat_share,
           round(sqrt(CAST(p.tokens_kept AS DOUBLE)) / t.wsum, 6)
             AS temp_share,
           round({TARGET_MULT}.0 * t.total
                 * (sqrt(CAST(p.tokens_kept AS DOUBLE)) / t.wsum)
                 / p.tokens_kept, 6) AS planned_epochs,
           {TARGET_MULT}.0 * t.total
             * (sqrt(CAST(p.tokens_kept AS DOUBLE)) / t.wsum)
             / p.tokens_kept > {EPOCH_CAP} AS over_cap
    FROM per_src p, tot t
    """,
)
def source_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The temperature-flattened training mixture over the funnel's
    kept documents: per source, kept doc/token mass, natural share,
    T=2 (sqrt) share, the epochs a {TARGET_MULT}x-total-token run
    replays that source (planned_epochs = target · share / tokens),
    and the over-{EPOCH_CAP}-epochs flag.  Temperature flattening
    upsamples small sources — exactly the sources the flag then
    watches for memorization-grade repetition; a mixture reviewer
    reads the flagged rows first.

    Oracle: the staged funnel CTE (one definition of kept), sqrt
    weights, and the decimal-detour denominator via sql_dsum — the
    only cross-row float aggregate; everything after it is per-row
    IEEE arithmetic with identical association, rounded at 6dp.

    100 TB shape: one map-side-combinable long-sum aggregate per
    source over the memoized decision frame joined to the narrow
    (doc_id, source) projection; the totals are a #sources-row second
    aggregate cross-joined back as a broadcast single row — no second
    corpus pass, no window, no corpus shuffle beyond the source
    aggregate itself."""
    staged = staged_decisions(spark, sf_dir)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    kept = (
        staged.where("gate_ok AND dedup_ok AND media_ok")
        .join(src, "doc_id")
        .select("source", (F.col("n_tokens") - F.col("n_removed")).alias("tok"))
    )
    per_src = kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_kept"),
        F.sum("tok").cast("long").alias("tokens_kept"),
    )
    tot = per_src.agg(
        F.sum("tokens_kept").cast("long").alias("total"),
        dsum(F.sqrt(F.col("tokens_kept").cast("double"))).alias("wsum"),
    )
    w = F.sqrt(F.col("tokens_kept").cast("double"))
    epochs = (
        F.lit(float(TARGET_MULT))
        * F.col("total").cast("double")
        * (w / F.col("wsum"))
        / F.col("tokens_kept")
    )
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs_kept",
        "tokens_kept",
        F.round(F.col("tokens_kept").cast("double") / F.col("total"), 6).alias(
            "nat_share"
        ),
        F.round(w / F.col("wsum"), 6).alias("temp_share"),
        F.round(epochs, 6).alias("planned_epochs"),
        (epochs > F.lit(EPOCH_CAP)).alias("over_cap"),
    )


# --------------------------------------------------------------------------
# Cut provenance for the unified capstone (the "why was my doc removed"
# audit a data-subject / pipeline-debug request starts from)
# --------------------------------------------------------------------------


@query(
    "crossmodal_cut_provenance",
    oracle=f"""
    WITH RECURSIVE
    {CC_TAGGED_CTES},
    {AUD_TAGGED_CTES},
    {VPD_TAGGED_CTES},
    {_XM_CHAIN},
    surv AS (
      SELECT cluster_id, doc_id AS survivor_doc_id FROM ranked WHERE rk = 1
    ),
    csz AS (
      SELECT cluster_id, COUNT(*) AS n_docs FROM members GROUP BY cluster_id
    ),
    txt_docs AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM txt_pairs
        UNION ALL SELECT doc_b FROM txt_pairs
      )
    ),
    img_multi AS (SELECT ahash FROM imgc GROUP BY ahash HAVING COUNT(*) > 1),
    aud_multi AS (SELECT afp FROM audc GROUP BY afp HAVING COUNT(*) > 1),
    vid_multi AS (SELECT vfp FROM vidc GROUP BY vfp HAVING COUNT(*) > 1)
    SELECT m.doc_id, m.cluster_id,
           CAST(s.survivor_doc_id AS BIGINT) AS survivor_doc_id,
           COALESCE(td.doc_id IS NOT NULL, FALSE) AS text_linked,
           COALESCE(im.ahash IS NOT NULL, FALSE) AS img_linked,
           COALESCE(am.afp IS NOT NULL, FALSE) AS aud_linked,
           COALESCE(vm.vfp IS NOT NULL, FALSE) AS vid_linked
    FROM members m
    JOIN csz c ON c.cluster_id = m.cluster_id AND c.n_docs > 1
    JOIN surv s ON s.cluster_id = m.cluster_id
    LEFT JOIN txt_docs td ON td.doc_id = m.doc_id
    LEFT JOIN img_multi im ON im.ahash = m.c_ahash
    LEFT JOIN aud_multi am ON am.afp = m.c_afp
    LEFT JOIN vid_multi vm ON vm.vfp = m.c_vfp
    WHERE m.doc_id <> s.survivor_doc_id
    """,
)
def crossmodal_cut_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document CUT by the cross-modal capstone (a non-survivor
    member of a multi-member unified cluster): which tiers tie it into
    the cluster graph — a verified text near-dup pair, image / audio
    perceptual co-membership among carriers, video sequence
    co-membership — plus its cluster and the survivor it lost to.
    The booleans answer "which evidence attached this doc", the first
    question both a pipeline debugger and a data-subject inquiry ask;
    the path to the survivor may still be transitive (pinned: every
    cut doc has at least ONE tier linked — isolated docs are
    singletons by construction, so membership implies an edge).

    100 TB shape: reuses the memoized member frame; the tier flags
    are one broadcastable multi-member key set per modality (≤
    #perceptual keys) plus the distinct text-pair endpoint set (≤
    2·|verified pairs|) — broadcast left joins, no new corpus
    shuffle beyond the survivor arg-min the capstone already pays."""
    from go_map_reduce_spark.operators.dedup import minhash_near_dup_pairs
    from go_map_reduce_spark.operators.pipeline35 import (
        _carrier_media_frames,
        _crossmodal_members,
        _xm_ordk,
    )

    members = _crossmodal_members(spark, sf_dir)
    surv = members.groupBy("cluster_id").agg(
        F.min_by("doc_id", _xm_ordk()).cast("long").alias("survivor_doc_id"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    pairs = minhash_near_dup_pairs(spark, sf_dir)
    txt_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("text_linked", F.lit(True))
    )
    imgc, audc, vidc = _carrier_media_frames(spark, sf_dir)

    def multi(frame: DataFrame, key: str, mkey: str, flag: str) -> DataFrame:
        return (
            frame.groupBy(key)
            .count()
            .where("count > 1")
            .select(F.col(key).alias(mkey), F.lit(True).alias(flag))
        )

    out = (
        members.join(surv, "cluster_id")
        .where(F.col("doc_id") != F.col("survivor_doc_id"))
        .where(F.col("n_docs") > 1)
        .join(F.broadcast(txt_docs), "doc_id", "left")
        .join(
            F.broadcast(multi(imgc, "ahash", "c_ahash", "img_linked")),
            "c_ahash",
            "left",
        )
        .join(
            F.broadcast(multi(audc, "afp", "c_afp", "aud_linked")),
            "c_afp",
            "left",
        )
        .join(
            F.broadcast(multi(vidc, "vfp", "c_vfp", "vid_linked")),
            "c_vfp",
            "left",
        )
    )
    return out.select(
        "doc_id",
        "cluster_id",
        "survivor_doc_id",
        F.coalesce("text_linked", F.lit(False)).alias("text_linked"),
        F.coalesce("img_linked", F.lit(False)).alias("img_linked"),
        F.coalesce("aud_linked", F.lit(False)).alias("aud_linked"),
        F.coalesce("vid_linked", F.lit(False)).alias("vid_linked"),
    )
