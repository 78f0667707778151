"""Round-6 pipeline operators: training-data curation depth.

Seven operators a 100 TB pretraining-data pipeline runs daily, each
beyond the reference's MapReduce surface (the reference has no
analytics tier at all — mr/worker.go:15-165 schedules opaque map/reduce
fns) and each expressed Spark-first:

- DSIR importance weights (Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling"): hashed-bigram
  log-likelihood ratios against a target domain.
- Cross-document repeated spans (Lee et al. 2022, "Deduplicating
  Training Data Makes Language Models Better"): the fraction of each
  document's K-token windows that also occur in other documents — the
  diagnostic behind substring-level dedup.
- Embedding truncation recall (Matryoshka-style evaluation): does
  half-dimension retrieval reproduce full-dimension top-k?
- Hybrid BM25 + vector retrieval fused by Reciprocal Rank Fusion
  (Cormack et al. 2009).
- Perceptual (average-hash) image dedup over REAL decoded pixels:
  brightness-jittered byte-distinct payloads that exact dedup misses
  collapse into aHash groups.
- Key-skew profile: the pre-join diagnostic that decides salting.
- Tokenizer fertility by language: BPE-ish tokens per whitespace word
  and bytes per token — the cost model of a multilingual corpus.

Scale notes are per-operator; none shuffles more than its keys, none
collects to the driver, and the only Python tiers are Arrow-batched
mapInPandas codec stages (the established multimodal discipline,
operators/multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.functions.numeric import dsum, sql_dsum
from go_map_reduce_spark.functions.vector import cosine, norm_sq, sql_cosine
from go_map_reduce_spark.operators import search as _search  # noqa: F401
from go_map_reduce_spark.operators.textstats import BPE_RE
from go_map_reduce_spark.registry import ORACLES, query

# (the search import above runs before this module's decorators so the
# hybrid query can embed the registered bm25 oracle verbatim — package
# __init__ imports operators alphabetically, pipeline22 < search)

# --------------------------------------------------------------------------
# DSIR importance weights (hashed-bigram log-likelihood ratio)
# --------------------------------------------------------------------------

DSIR_BUCKETS = 512
DSIR_TARGET_LANG = "en"

_DSIR_SQL_TOKS = r"list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')"


@query(
    "dsir_importance_weights",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, {_DSIR_SQL_TOKS} AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, lang,
             CAST(CAST(concat('0x', substr(md5(t[i+1] || ' ' || t[i+2]), 1, 7))
                  AS BIGINT) % {DSIR_BUCKETS} AS INT) AS bucket
      FROM toks, unnest(range(len(t) - 1)) AS u(i)
      WHERE len(t) >= 2
    ),
    raw AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c_raw FROM grams GROUP BY bucket
    ),
    tgt AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c_tgt
      FROM grams WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY bucket
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_raw,
             CAST(COUNT(*) FILTER (lang = '{DSIR_TARGET_LANG}') AS DOUBLE) AS n_tgt
      FROM grams
    ),
    ratio AS (
      SELECT raw.bucket,
             round(ln((COALESCE(c_tgt, 0) + 0.5) / (n_tgt + 0.5 * {DSIR_BUCKETS}))
                   - ln((c_raw + 0.5) / (n_raw + 0.5 * {DSIR_BUCKETS})), 6) AS llr
      FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket CROSS JOIN tot
    )
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           {sql_dsum("r.llr")} AS dsir_weight
    FROM grams g JOIN ratio r ON g.bucket = r.bucket
    GROUP BY g.doc_id
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): importance weight of each
    document = Σ over its hashed-bigram features of
    log p_target(f) − log p_raw(f), with add-0.5 smoothing over
    {DSIR_BUCKETS} hash buckets. Target distribution here: the
    '{DSIR_TARGET_LANG}' slice of the same corpus (in production, the
    high-quality reference corpus).

    100 TB shape: ONE tokenize+hash pass over the corpus; the bucket
    LM is a {DSIR_BUCKETS}-row frame (constant size regardless of
    corpus size) that joins back by broadcast, so the only data-sized
    shuffles are the two bucket counts and the per-doc sum — all
    map-side combinable. No vocabulary pass, no driver-side model.
    The md5-prefix bucket hash is the engine's cross-engine convention
    (feature_hashing_vectors); per-row log ratios round to 6 dp and the
    per-doc sum is an exact decimal sum (functions/numeric.py), so the
    result is bit-identical across engines and partitionings."""
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", toks.alias("t")
    )
    grams = (
        docs.where(F.size("t") >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr("transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i+1]))")
            ).alias("gram"),
        )
        .select(
            "doc_id",
            "lang",
            (
                F.conv(F.substring(F.md5("gram"), 1, 7), 16, 10).cast("long")
                % DSIR_BUCKETS
            )
            .cast("int")
            .alias("bucket"),
        )
    )
    is_tgt = (F.col("lang") == DSIR_TARGET_LANG).cast("long")
    counts = grams.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("c_raw"), F.sum(is_tgt).alias("c_tgt")
    )
    tot = counts.agg(
        F.sum("c_raw").cast("double").alias("n_raw"),
        F.sum("c_tgt").cast("double").alias("n_tgt"),
    )
    ratio = counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            F.log(
                (F.col("c_tgt") + 0.5) / (F.col("n_tgt") + 0.5 * DSIR_BUCKETS)
            )
            - F.log(
                (F.col("c_raw") + 0.5) / (F.col("n_raw") + 0.5 * DSIR_BUCKETS)
            ),
            6,
        ).alias("llr"),
    )
    return (
        grams.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            dsum(F.col("llr")).alias("dsir_weight"),
        )
    )


# --------------------------------------------------------------------------
# Cross-document repeated spans (substring-dedup diagnostic)
# --------------------------------------------------------------------------

SPAN_K = 5


@query(
    "cross_doc_repeated_spans",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DSIR_SQL_TOKS} AS t FROM documents
    ),
    wins AS (
      SELECT doc_id, array_to_string(t[i+1:i+{SPAN_K}], ' ') AS win
      FROM toks, unnest(range(len(t) - {SPAN_K - 1})) AS u(i)
      WHERE len(t) >= {SPAN_K}
    ),
    spread AS (
      SELECT win, COUNT(DISTINCT doc_id) AS nd FROM wins GROUP BY win
    )
    SELECT w.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(COUNT(*) FILTER (s.nd >= 2) AS BIGINT) AS dup_windows,
           round(CAST(COUNT(*) FILTER (s.nd >= 2) AS DOUBLE) / COUNT(*), 6)
             AS dup_frac
    FROM wins w JOIN spread s ON w.win = s.win
    GROUP BY w.doc_id
    """,
)
def cross_doc_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication diagnostic (Lee et al. 2022): the
    fraction of each document's {SPAN_K}-token windows whose exact text
    also occurs in at least one OTHER document. Documents with high
    dup_frac are boilerplate/template candidates that document-level
    MinHash misses (they can be globally unique while 80% of their
    spans are copied).

    100 TB shape: windows shuffle by window text for the spread count
    (map-side combinable; at scale the key would be xxhash64(win) —
    same plan), then an equality join back and a per-doc count. Every
    stage is keys-only: no all-pairs comparison, no driver state. A
    production suffix-array dedup CUTS the spans; this query is the
    metric that decides whether to run it."""
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", toks.alias("t")
    )
    wins = (
        docs.where(F.size("t") >= SPAN_K)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(t) - {SPAN_K}),"
                    f" i -> array_join(slice(t, i + 1, {SPAN_K}), ' '))"
                )
            ).alias("win"),
        )
    )
    spread = wins.groupBy("win").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    return (
        wins.join(spread, "win")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum((F.col("nd") >= 2).cast("long")).alias("dup_windows"),
            F.round(
                F.sum((F.col("nd") >= 2).cast("long")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("dup_frac"),
        )
    )


# --------------------------------------------------------------------------
# Embedding truncation recall (Matryoshka-style evaluation)
# --------------------------------------------------------------------------

TRUNC_DIMS = 32
TRUNC_QUERIES = 8
TRUNC_K = 5


def _topk_sql(emb_expr: str, dims: int) -> str:
    """Oracle CTE body: per-query top-{TRUNC_K} neighbor set by cosine
    over the first `dims` dimensions."""
    return f"""
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {sql_cosine(f"q.{emb_expr}", f"c.{emb_expr}", f"q.nsq{dims}", f"c.nsq{dims}", dims)} DESC,
                          c.vec_id
               ) AS rk
        FROM e q JOIN e c ON q.vec_id < {TRUNC_QUERIES} AND c.vec_id <> q.vec_id
      ) WHERE rk <= {TRUNC_K}
    """


_NSQ_FULL = (
    "list_reduce(list_transform(range(1, 65),"
    " i -> CAST(embedding[i] * embedding[i] AS DOUBLE)), (x, y) -> x + y)"
)
_NSQ_HALF = (
    f"list_reduce(list_transform(range(1, {TRUNC_DIMS + 1}),"
    " i -> CAST(embedding[i] * embedding[i] AS DOUBLE)), (x, y) -> x + y)"
)


@query(
    "embedding_truncation_recall",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding,
             {_NSQ_FULL} AS nsq64,
             {_NSQ_HALF} AS nsq{TRUNC_DIMS}
      FROM embeddings
    ),
    full_k AS ({_topk_sql("embedding", 64)}),
    half_k AS ({_topk_sql("embedding", TRUNC_DIMS)})
    SELECT f.query_id,
           CAST(COUNT(h.neighbor_id) AS BIGINT) AS n_kept,
           round(CAST(COUNT(h.neighbor_id) AS DOUBLE) / {TRUNC_K}, 6) AS recall
    FROM full_k f
    LEFT JOIN half_k h
      ON f.query_id = h.query_id AND f.neighbor_id = h.neighbor_id
    GROUP BY f.query_id
    """,
)
def embedding_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation evaluation: for each query vector,
    what fraction of the full-64-dim cosine top-{TRUNC_K} survives when
    retrieval uses only the first {TRUNC_DIMS} dimensions? The metric
    that decides whether an index can store truncated vectors (2x
    memory/IO saving) — run it before shrinking a 100 TB ANN index.

    100 TB shape: identical to ann_bruteforce_topk twice — broadcast
    the tiny query side, one candidate scan per ranking (a production
    run fuses both rankings into one scan; kept separate here so each
    ranking is independently comparable), WindowGroupLimit top-k, then
    a {TRUNC_QUERIES}x{TRUNC_K}-row join. All JVM codegen (F.slice +
    F.aggregate), no UDF."""
    emb = load_table(spark, sf_dir, "embeddings")

    def topk(e: DataFrame, dims: int) -> DataFrame:
        vec = F.slice(F.col("embedding"), 1, dims)
        scored = e.select(
            "vec_id", vec.alias("v"), norm_sq(vec).alias("nsq")
        )
        q = scored.where(F.col("vec_id") < TRUNC_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nsq").alias("qnsq"),
        )
        w = W.partitionBy("query_id").orderBy(
            F.desc("cos_sim"), F.asc("neighbor_id")
        )
        return (
            scored.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                cosine(
                    F.col("qv"), F.col("v"), F.col("qnsq"), F.col("nsq")
                ).alias("cos_sim"),
            )
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= TRUNC_K)
            .select("query_id", "neighbor_id")
        )

    full_k = topk(emb, 64)
    half_k = topk(emb, TRUNC_DIMS).withColumnRenamed("neighbor_id", "kept_id")
    return (
        full_k.join(
            half_k,
            (full_k.query_id == half_k.query_id)
            & (full_k.neighbor_id == half_k.kept_id),
            "left",
        )
        .groupBy(full_k.query_id)
        .agg(
            F.count("kept_id").alias("n_kept"),
            F.round(F.count("kept_id").cast("double") / TRUNC_K, 6).alias(
                "recall"
            ),
        )
    )


# --------------------------------------------------------------------------
# Hybrid retrieval: BM25 + vector, Reciprocal Rank Fusion
# --------------------------------------------------------------------------

RRF_K = 60
RRF_POOL = 20
RRF_TOP = 10
RRF_QUERY_VEC = 0


@query(
    "hybrid_bm25_vector_rrf",
    oracle=f"""
    WITH bm_scores AS ({ORACLES["bm25_search_topk"]}),
    bm AS (
      SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
      FROM bm_scores
    ),
    e AS (
      SELECT vec_id, embedding, {_NSQ_FULL} AS nsq FROM embeddings
    ),
    vec AS (
      SELECT neighbor_id AS doc_id, rk AS r FROM (
        SELECT c.vec_id AS neighbor_id,
               row_number() OVER (
                 ORDER BY {sql_cosine("q.embedding", "c.embedding", "q.nsq", "c.nsq")} DESC,
                          c.vec_id
               ) AS rk
        FROM e q JOIN e c
          ON q.vec_id = {RRF_QUERY_VEC} AND c.vec_id <> q.vec_id
      ) WHERE rk <= {RRF_POOL}
    )
    SELECT doc_id, bm25_rank, vec_rank, rrf_score FROM (
      SELECT COALESCE(bm.doc_id, vec.doc_id) AS doc_id,
             CAST(bm.r AS BIGINT) AS bm25_rank,
             CAST(vec.r AS BIGINT) AS vec_rank,
             COALESCE(round(1.0 / ({RRF_K} + bm.r), 6), 0)
               + COALESCE(round(1.0 / ({RRF_K} + vec.r), 6), 0) AS rrf_score
      FROM bm FULL OUTER JOIN vec ON bm.doc_id = vec.doc_id
    )
    ORDER BY rrf_score DESC, doc_id
    LIMIT {RRF_TOP}
    """,
)
def hybrid_bm25_vector_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+semantic retrieval fused by Reciprocal Rank
    Fusion (Cormack et al. 2009): rrf(d) = Σ_lists 1/({RRF_K}+rank_d).
    The BM25 list is the registered bm25_search_topk tier verbatim
    (composition, not reimplementation); the vector list is cosine
    top-{RRF_POOL} for query vector {RRF_QUERY_VEC} (doc_id ≡ vec_id in
    this corpus). RRF needs only ranks, so the two scorers' score
    scales never need calibration — exactly why production hybrid
    search uses it.

    100 TB shape: each list is its own top-k pipeline ending in a
    ≤{RRF_POOL}-row frame; the fusion join is {RRF_POOL}x{RRF_POOL}
    rows regardless of corpus size. Ranking windows are global but over
    ≤{RRF_POOL}-row inputs (WindowGroupLimit upstream bounds state)."""
    from go_map_reduce_spark.operators.search import bm25_search_topk

    bm = bm25_search_topk(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("bm_r"),
    )
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", "embedding", norm_sq(F.col("embedding")).alias("nsq")
    )
    q = e.where(F.col("vec_id") == RRF_QUERY_VEC).select(
        F.col("embedding").alias("qv"), F.col("nsq").alias("qnsq")
    )
    vec = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != RRF_QUERY_VEC)
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine(
                F.col("qv"), F.col("embedding"), F.col("qnsq"), F.col("nsq")
            ).alias("cos_sim"),
        )
        .withColumn(
            "vec_r",
            F.row_number().over(W.orderBy(F.desc("cos_sim"), F.asc("doc_id"))),
        )
        .where(F.col("vec_r") <= RRF_POOL)
        .select("doc_id", "vec_r")
    )
    fused = (
        bm.join(vec, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.col("bm_r").cast("long").alias("bm25_rank"),
            F.col("vec_r").cast("long").alias("vec_rank"),
            (
                F.coalesce(F.round(1.0 / (RRF_K + F.col("bm_r")), 6), F.lit(0.0))
                + F.coalesce(
                    F.round(1.0 / (RRF_K + F.col("vec_r")), 6), F.lit(0.0)
                )
            ).alias("rrf_score"),
        )
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(RRF_TOP)


# --------------------------------------------------------------------------
# Perceptual (average-hash) image dedup over real decoded pixels
# --------------------------------------------------------------------------

AHASH_SIDE = 16  # synthesized images are 16x16; aHash grid is 8x8
AHASH_RESIDUES = 16  # doc_id % 16 drives content -> genuine dup groups


def _synth_jittered_bmp_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """One 16x16 BMP per doc. Row y is solid gray
    g(y) = (37·(doc_id % {AHASH_RESIDUES}) + 11·y) % 200 + doc_id % 3:
    the residue picks the PATTERN, the +doc_id%3 term is a global
    brightness jitter — so same-residue docs have byte-DIFFERENT
    payloads (exact dedup fails) with identical structure (aHash must
    group them). Closed form in doc_id, so the oracle predicts every
    hash bit without a codec."""
    from go_map_reduce_spark.operators.multimodal import encode_bmp

    side = AHASH_SIDE
    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            res, jit = doc_id % AHASH_RESIDUES, doc_id % 3
            rows = [
                bytes([(37 * res + 11 * y) % 200 + jit] * (3 * side))
                for y in range(side)
            ]
            payloads.append(encode_bmp(side, side, rows))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def _ahash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL average-hash over REAL decoded pixels: parse the BMP
    (magic/offset/padding via decode_bmp), 2x2 block means over the
    blue channel, bit=1 iff the block mean exceeds the global mean —
    in exact integer arithmetic (64·blocksum > total), so the hash is
    brightness-jitter-invariant by construction, not by rounding."""
    import numpy as np

    from go_map_reduce_spark.operators.multimodal import decode_image

    side = AHASH_SIDE
    for pdf in batches:
        out = {"doc_id": [], "ahash": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, _bpp, px = decode_image(bytes(payload))
            if (w, h) != (side, side):
                raise ValueError(f"unexpected decoded dims {w}x{h}")
            # bottom-up BGR rows; blue channel = every 3rd byte
            gray = np.frombuffer(px, dtype=np.uint8).reshape(side, side, 3)[
                :, :, 0
            ]
            blocks = (
                gray.astype(np.int64)
                .reshape(8, 2, 8, 2)
                .sum(axis=(1, 3))
            )  # 8x8 block sums of 4 pixels each
            total = int(gray.sum())
            bits = (64 * blocks > total).astype(np.uint8)
            out["doc_id"].append(doc_id)
            out["ahash"].append("".join("1" if b else "0" for b in bits.ravel()))
        yield pd.DataFrame(out)


@query(
    "image_ahash_dedup",
    oracle=f"""
    WITH per_doc AS (
      SELECT doc_id, doc_id % {AHASH_RESIDUES} AS res FROM documents
    ),
    rows_ AS (
      SELECT res, y, (37 * res + 11 * y) % 200 AS g
      FROM (SELECT DISTINCT res FROM per_doc), unnest(range({AHASH_SIDE})) AS u(y)
    ),
    tot AS (SELECT res, {AHASH_SIDE} * SUM(g) AS total FROM rows_ GROUP BY res),
    rowbits AS (
      SELECT a.res, a.y // 2 AS by,
             CASE WHEN 64 * 2 * (a.g + b.g) > t.total THEN '1' ELSE '0' END AS bit
      FROM rows_ a
      JOIN rows_ b ON a.res = b.res AND b.y = a.y + 1 AND a.y % 2 = 0
      JOIN tot t ON a.res = t.res
    ),
    hashes AS (
      SELECT res, string_agg(repeat(bit, 8), '' ORDER BY by) AS ahash
      FROM rowbits GROUP BY res
    ),
    tagged AS (
      SELECT d.doc_id, h.ahash FROM per_doc d JOIN hashes h ON d.res = h.res
    )
    SELECT doc_id, ahash,
           CAST(COUNT(*) OVER (PARTITION BY ahash) AS BIGINT) AS group_size
    FROM tagged
    """,
)
def image_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup: synthesize byte-distinct
    brightness-jittered BMPs (mapInPandas encode), REALLY decode them
    (magic/offset/padding parsing), compute an 8x8 average-hash in
    exact integer arithmetic, and group by hash. Exact (md5-of-bytes)
    dedup finds nothing here — every payload differs — while aHash
    collapses the {AHASH_RESIDUES} structural groups; that gap is
    precisely why multimodal pipelines dedup on perceptual hashes.

    100 TB shape: two narrow Arrow-batched codec stages (no shuffle),
    then ONE hash-key shuffle for group sizes — identical plan to
    dedup_exact_summary with ahash in place of md5. The decoded pixels
    never shuffle; only the 64-bit hash does."""
    from go_map_reduce_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    media = ids.mapInPandas(
        _synth_jittered_bmp_batch, schema="doc_id long, payload binary"
    )
    hashed = media.mapInPandas(
        _ahash_batch, schema="doc_id long, ahash string"
    )
    return hashed.select(
        "doc_id",
        "ahash",
        F.count(F.lit(1)).over(W.partitionBy("ahash")).alias("group_size"),
    )


# --------------------------------------------------------------------------
# Key-skew profile (the pre-join diagnostic that decides salting)
# --------------------------------------------------------------------------


@query(
    "key_skew_profile",
    oracle="""
    WITH counts AS (
      SELECT l_suppkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_suppkey
    ),
    prof AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt,
             round(CAST(SUM(cnt) AS DOUBLE) / COUNT(*), 6) AS avg_cnt
      FROM counts
    )
    SELECT p.n_keys, p.n_rows, p.max_cnt, p.avg_cnt,
           round(p.max_cnt / p.avg_cnt, 6) AS skew_ratio,
           round(CAST(p.max_cnt AS DOUBLE) / p.n_rows, 6) AS top1_share,
           (SELECT MIN(key) FROM counts WHERE cnt = p.max_cnt) AS heaviest_key
    FROM prof p
    """,
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic over lineitem.l_suppkey: key count,
    max/avg per-key cardinality, skew ratio, the heaviest key's share,
    and which key it is — the numbers that decide between a plain hash
    join, AQE skew handling, and explicit salting
    (salted_join_segment_value is the treatment; this is the triage).

    100 TB shape: one map-side-combinable key count, then a 1-row
    aggregate; the heaviest-key lookup filters the counts frame against
    the broadcast 1-row profile (no second scan of the data, no
    driver-side collect)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("key")
    )
    counts = li.groupBy("key").agg(F.count(F.lit(1)).alias("cnt"))
    prof = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.round(F.sum("cnt").cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_cnt"
        ),
    )
    heaviest = (
        counts.join(
            F.broadcast(prof.select("max_cnt")),
            counts.cnt == F.col("max_cnt"),
        )
        .agg(F.min("key").alias("heaviest_key"))
    )
    return (
        prof.crossJoin(F.broadcast(heaviest))
        .select(
            "n_keys",
            "n_rows",
            "max_cnt",
            "avg_cnt",
            F.round(F.col("max_cnt") / F.col("avg_cnt"), 6).alias("skew_ratio"),
            F.round(
                F.col("max_cnt").cast("double") / F.col("n_rows"), 6
            ).alias("top1_share"),
            "heaviest_key",
        )
    )


# --------------------------------------------------------------------------
# Tokenizer fertility by language
# --------------------------------------------------------------------------

@query(
    "tokenizer_fertility_by_lang",
    oracle=rf"""
    WITH per_doc AS (
      SELECT lang,
             CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                                  x -> x <> '')) AS BIGINT) AS ws_tokens,
             CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS BIGINT)
               AS bpe_tokens,
             n_chars
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ws_tokens) AS BIGINT) AS ws_tokens,
           CAST(SUM(bpe_tokens) AS BIGINT) AS bpe_tokens,
           round(CAST(SUM(bpe_tokens) AS DOUBLE) / SUM(ws_tokens), 6)
             AS fertility,
           round(CAST(SUM(n_chars) AS DOUBLE) / SUM(bpe_tokens), 6)
             AS chars_per_token
    FROM per_doc
    GROUP BY lang
    """,
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (tokens per whitespace word) and characters
    per token, by language — the multilingual cost model: languages
    with high fertility consume disproportionate context length, which
    drives corpus mixing weights (domain_mix_sampling) and per-language
    token budgets. Uses the engine's BPE-ish pretokenizer convention
    (textstats.BPE_RE: letter runs / digit runs / single symbol).

    100 TB shape: one per-row regex pass, integer sums into a
    5-group aggregate — exact cross-engine parity because every ratio
    is computed once from exact integer sums (no per-row floats)."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.filter(F.split("text", r"\s+"), lambda x: x != ""))
    bpe = F.size(F.expr(f"regexp_extract_all(text, '{BPE_RE}', 0)"))
    per = docs.select(
        "lang",
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
        "n_chars",
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws_tokens").alias("ws_tokens"),
        F.sum("bpe_tokens").alias("bpe_tokens"),
        F.round(
            F.sum("bpe_tokens").cast("double") / F.sum("ws_tokens"), 6
        ).alias("fertility"),
        F.round(F.sum("n_chars").cast("double") / F.sum("bpe_tokens"), 6).alias(
            "chars_per_token"
        ),
    )
