"""Similarity search over the `embeddings` table (ArrayType(FloatType)).

Two formulations of approximate-nearest-neighbor, per the pipeline
blueprint:

- brute-force cosine top-k: the exactness baseline. Query set ⨯
  candidate set with the small side broadcast — on a cluster this is a
  map-side-only job (no shuffle of the big side) whose cost is
  |Q|·|C|·d multiply-adds inside codegen'd array expressions, followed
  by a per-query top-k window.
- LSH-bucketed top-k: the scale path. Sign-bit bucketing (random
  hyperplanes degenerate to coordinate hyperplanes here; a production
  deployment multiplies by a fixed random matrix first — same plan) cuts
  candidates to one bucket; the join is an equality hash join on the
  bucket key. IVF is the same plan with k-means cell ids as the key.

Cosine math: see functions.vector — sequential-fold doubles,
bit-reproducible against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

import itertools

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.functions.vector import cosine, norm_sq, sql_cosine, sql_dot
from go_map_reduce_spark.registry import query, shared_frame

N_QUERY_VECS = 8  # brute-force demo query set: vec_id < 8
TOP_K = 5
BUCKET_TOP_K = 3

# Each ANN tier's top-k output is tiny (n_queries·k rows) but its plan
# is a whole retrieval pipeline; ann_recall_eval composes ALL the
# tiers against the brute truth, so without sharing, one suite run
# pays every pipeline twice (standalone query + inside the eval).
# The registry.shared_frame pattern (proven on the dedup cluster
# frame: 3.5-3.8 s consumers -> 0.05-0.3 s) memoizes each tier's
# RESULT rows behind an eager localCheckpoint keyed by (app, tier,
# data fingerprint) — builders are deterministic, so reuse is
# semantically invisible; standalone runs build on first call.


def _shared_topk(spark, key: str, sf_dir: str, build) -> DataFrame:
    return shared_frame(
        spark,
        f"{key}:{sf_dir}",
        lambda: build().localCheckpoint(eager=True),
        data_path=sf_dir,
    )


@query(
    "ann_bruteforce_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding, {sql_dot('embedding', 'embedding')} AS nsq
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {sql_cosine('q.embedding', 'c.embedding', 'q.nsq', 'c.nsq')} AS cos_sim
      FROM e q JOIN e c ON q.vec_id < {N_QUERY_VECS} AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
             ) AS rk
      FROM scored
    )
    WHERE rk <= {TOP_K}
    """,
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for a query set: broadcast the (tiny) query
    side, scan candidates once, window top-k per query. Deterministic
    ranking: cosine desc, neighbor_id asc tiebreak. Result shared via
    _shared_topk (the eval reuses it as its truth side)."""
    return _shared_topk(
        spark, "ann_brute", sf_dir, lambda: _ann_bruteforce_plan(spark, sf_dir)
    )


def _ann_bruteforce_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", "embedding", norm_sq(F.col("embedding")).alias("nsq"))
    q = e.where(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nsq").alias("q_nsq"),
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(
                F.col("q_emb"), F.col("embedding"), F.col("q_nsq"), F.col("nsq")
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= TOP_K)
    )


# Multi-probe sign-LSH config (r09 retune, driven by ann_recall_eval):
# 6 mean-centered sign bits, probing every bucket within Hamming
# distance 2 of the query's own (1 + 6 + 15 = 22 probes).  Settings
# chosen from the measured recall/scan frontier at sf0.01 (see
# PERFORMANCE.md r09): the r01 un-centered 8-bit/0-probe bucketing
# measured recall@3 ≈ 0.04 against the brute-force truth — the
# synthetic embeddings are near-isotropic (per-dim variance ≈ 0.017,
# mean-vector norm 0.05) and the true top-3 neighbors sit at cosine
# ≈ 0.33, so single-bucket sign-LSH is structurally blind here; 6
# centered bits at radius 2 measure recall@3 ≈ 0.67 while scanning
# ~1/3 of the corpus.
LSH_BITS = 6
LSH_RADIUS = 2
LSH_PROBE_MASKS = sorted(
    sum(1 << p for p in pos)
    for r in range(LSH_RADIUS + 1)
    for pos in itertools.combinations(range(LSH_BITS), r)
)

_SQL_MU = ", ".join(
    f"CAST(SUM(CAST(CAST(embedding[{i}] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)"
    f" / COUNT(*) AS mu{i}"
    for i in range(1, LSH_BITS + 1)
)
_SQL_CENTERED_BUCKET = " + ".join(
    f"CASE WHEN CAST(embedding[{i}] AS DOUBLE) - mu{i} > 0"
    f" THEN {1 << (i - 1)} ELSE 0 END"
    for i in range(1, LSH_BITS + 1)
)


@query(
    "ann_lsh_topk",
    oracle=f"""
    WITH mu AS (SELECT {_SQL_MU} FROM embeddings),
    e AS (
      SELECT vec_id, embedding,
             {_SQL_CENTERED_BUCKET} AS bucket,
             {sql_dot('embedding', 'embedding')} AS nsq
      FROM embeddings CROSS JOIN mu
    ),
    probes AS (
      SELECT e.vec_id AS query_id, e.embedding AS q_emb, e.nsq AS q_nsq,
             xor(e.bucket, m.mask) AS probe
      FROM e CROSS JOIN (
        SELECT unnest([{', '.join(str(m) for m in LSH_PROBE_MASKS)}]) AS mask
      ) m
      WHERE e.vec_id < {N_QUERY_VECS}
    ),
    scored AS (
      SELECT p.query_id, c.vec_id AS neighbor_id,
             {sql_cosine('p.q_emb', 'c.embedding', 'p.q_nsq', 'c.nsq')} AS cos_sim
      FROM probes p JOIN e c ON c.bucket = p.probe AND c.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
             ) AS rk
      FROM scored
    )
    WHERE rk <= {BUCKET_TOP_K}
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe sign-LSH ANN retrieval: each query vector's
    top-{BUCKET_TOP_K} neighbors within the buckets at Hamming
    distance <= {LSH_RADIUS} of its own {LSH_BITS}-bit mean-centered
    sign bucket, for the same {N_QUERY_VECS}-vector query set as the
    sibling tiers (brute / IVF / PQ) — the retrieval shape, where the
    index amortizes over a small query stream; the all-pairs
    neighbor-GRAPH shape lives in embedding_near_dup_pairs /
    semantic_dedup_survivors, whose banded keys bound pair work.
    (The r09 retune briefly ran this all-pairs: N x corpus/3 cosine
    work — 11.3 s at sf0.1 and quadratic at scale — for rows no
    consumer read; ann_recall_eval scores only the query set.)
    Centering
    (subtract the corpus per-dimension mean before taking signs)
    balances the buckets on non-centered corpora for free, and
    multi-probe — querying the Hamming-adjacent buckets instead of
    building extra hash tables — is the classic recall lever (Lv et
    al., VLDB 2007) that keeps ONE stored index while probing
    {len(LSH_PROBE_MASKS)} buckets per query.

    Candidate generation stays a pure equality join: the query side
    explodes its constant {len(LSH_PROBE_MASKS)}-mask probe list
    (bucket XOR mask), the corpus side keeps one integer bucket key,
    and probed buckets are distinct so no candidate pair duplicates.
    100 TB shape: the per-dim mean is a 1-row broadcast aggregate
    (decimal sums — bit-identical across engines); the index side
    never replicates (multi-probe multiplies the QUERY side only, by
    a constant); per-bucket work is bounded by bucket occupancy.
    Recall@{BUCKET_TOP_K} is measured, not assumed — ann_recall_eval
    (pipeline29) gates it against the brute-force truth; the
    bits/radius frontier is recorded in PERFORMANCE.md r09. Result
    shared via _shared_topk (the eval scores these same rows)."""
    return _shared_topk(
        spark, "ann_lsh", sf_dir, lambda: _ann_lsh_plan(spark, sf_dir)
    )


def _ann_lsh_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    mu = emb.agg(
        *[
            (
                F.sum(
                    F.element_at("embedding", i)
                    .cast("double")
                    .cast("decimal(38,12)")
                ).cast("double")
                / F.count(F.lit(1))
            ).alias(f"mu{i}")
            for i in range(1, LSH_BITS + 1)
        ]
    )
    bucket = None
    for i in range(1, LSH_BITS + 1):
        bit = F.when(
            F.element_at("embedding", i).cast("double") - F.col(f"mu{i}") > 0,
            F.lit(1 << (i - 1)),
        ).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    e = (
        emb.crossJoin(F.broadcast(mu))
        .select(
            "vec_id",
            "embedding",
            bucket.alias("bucket"),
            norm_sq(F.col("embedding")).alias("nsq"),
        )
    )
    q = e.where(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
        F.col("nsq").alias("q_nsq"),
    ).withColumn(
        "mask", F.explode(F.array(*[F.lit(m) for m in LSH_PROBE_MASKS]))
    ).withColumn("probe", F.col("q_bucket").bitwiseXOR(F.col("mask")))
    scored = (
        e.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("probe"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(
                F.col("q_emb"), F.col("embedding"), F.col("q_nsq"), F.col("nsq")
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= BUCKET_TOP_K)
    )


# Scalar-quantization config: global [qmin, qmax] range → 8-bit codes.
SQ_LEVELS = 256


@query(
    "embedding_quantization",
    oracle=f"""
    WITH rng AS (
      -- cast to DOUBLE here: the list elements are FLOAT, and a float
      -- (qmax - qmin) would diverge from Spark's double arithmetic
      SELECT CAST(min(list_reduce(embedding, (x, y) -> least(x, y))) AS DOUBLE)
               AS qmin,
             CAST(max(list_reduce(embedding, (x, y) -> greatest(x, y))) AS DOUBLE)
               AS qmax
      FROM embeddings
    ),
    coded AS (
      SELECT vec_id, embedding, qmin, qmax,
             list_transform(embedding,
               x -> CAST(least(floor((CAST(x AS DOUBLE) - qmin)
                                     / (qmax - qmin) * {SQ_LEVELS}),
                               {SQ_LEVELS - 1}) AS BIGINT)) AS codes
      FROM embeddings CROSS JOIN rng
    )
    SELECT vec_id,
           md5(array_to_string(codes, ',')) AS codes_md5,
           codes[1] AS code_first,
           codes[64] AS code_last,
           round(list_reduce(
             list_transform(range(1, 65),
               i -> CAST(
                 (CAST(embedding[i] AS DOUBLE)
                  - (qmin + (codes[i] + 0.5) * ((qmax - qmin) / {SQ_LEVELS})))
                 * (CAST(embedding[i] AS DOUBLE)
                    - (qmin + (codes[i] + 0.5) * ((qmax - qmin) / {SQ_LEVELS})))
                 AS DOUBLE)),
             (x, y) -> x + y) / 64, 12) AS mse
    FROM coded
    """,
)
def embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-bit scalar quantization of the embedding column — the memory
    lever of large-scale ANN (64 floats → 64 bytes, 4× smaller, before
    any product-quantization refinement). Global [min, max] come from a
    broadcast 1-row aggregate; codes are floor-scaled (floor, not
    round: both engines define floor identically on doubles, while
    round's tie behavior differs); reconstruction uses bin centers and
    the per-vector MSE is a sequential fold (engine-identical).

    Per-row work only, plus one broadcast — the quantization pass over
    100 TB of embeddings is a single narrow stage."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rng = emb.agg(
        F.min(
            F.aggregate(
                "embedding",
                F.lit(float("inf")),
                lambda acc, x: F.least(acc, x.cast("double")),
            )
        ).alias("qmin"),
        F.max(
            F.aggregate(
                "embedding",
                F.lit(float("-inf")),
                lambda acc, x: F.greatest(acc, x.cast("double")),
            )
        ).alias("qmax"),
    )
    width = (F.col("qmax") - F.col("qmin")) / SQ_LEVELS
    coded = emb.crossJoin(F.broadcast(rng)).withColumn(
        "codes",
        F.transform(
            "embedding",
            lambda x: F.least(
                F.floor(
                    (x.cast("double") - F.col("qmin"))
                    / (F.col("qmax") - F.col("qmin"))
                    * SQ_LEVELS
                ),
                F.lit(SQ_LEVELS - 1),
            ).cast("long"),
        ),
    )
    err = F.zip_with(
        "embedding",
        "codes",
        lambda x, c: (
            (x.cast("double") - (F.col("qmin") + (c + F.lit(0.5)) * width))
            * (x.cast("double") - (F.col("qmin") + (c + F.lit(0.5)) * width))
        ).cast("double"),
    )
    mse = F.aggregate(err, F.lit(0.0), lambda acc, x: acc + x) / F.lit(64.0)
    return coded.select(
        "vec_id",
        F.md5(F.array_join("codes", ",")).alias("codes_md5"),
        F.element_at("codes", 1).alias("code_first"),
        F.element_at("codes", 64).alias("code_last"),
        F.round(mse, 12).alias("mse"),
    )


# ------------------------------------------------- product quantization
#
# r09 retune, driven by ann_recall_eval: the r04 toy codebook (an
# untrained 8-vector data sample shared by all 4 subspaces) measured
# recall@5 ≈ 0.2 against the brute-force truth.  Two production fixes,
# both measured at sf0.01 (PERFORMANCE.md r09):
#   1. TRAIN the codebook — per-subspace k-means (Lloyd's, the
#      kmeans.py determinism discipline: first-K init, decimal sums,
#      (dist, cid) argmin ties), {PQ_ITERS} update rounds;
#   2. RERANK — ADC ranks a {PQ_RERANK}-candidate shortlist (~6% of
#      the corpus), then EXACT cosine orders the shortlist (the
#      Faiss IVFPQ+refine shape).
# M=8×K=16 trained + rerank-32 measures recall@5 ≈ 0.73-0.87 vs the
# untrained no-rerank 0.2.

PQ_M = 8          # subspaces
PQ_SUBDIM = 8     # dims per subspace (8 × 8 = 64)
PQ_K = 16         # centroids per subspace
PQ_ITERS = 3      # Lloyd update rounds (then one final assignment)
PQ_RERANK = 32    # ADC shortlist size fed to exact rerank
PQ_N_QUERY = 3    # query set: vec_id < 3
PQ_TOP_K = 10

_DEC12 = "decimal(38,12)"


def _pq_sql_rounds() -> str:
    """CTE chain for per-subspace k-means: exploded corpus `pe`,
    init `pc0`, then {PQ_ITERS}× (assign, update) and a final
    assignment `pa_final` — kmeans.py's oracle pattern keyed by
    (m, cid) instead of cid."""
    parts = [
        f"""
    pe AS (
      SELECT vec_id, (i - 1) // {PQ_SUBDIM} AS m, (i - 1) % {PQ_SUBDIM} AS sd,
             CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, range(1, 65) t(i)
      WHERE vec_id >= {PQ_N_QUERY}
    ),
    pc0 AS (
      SELECT vec_id - {PQ_N_QUERY} AS cid, m, sd, val
      FROM pe WHERE vec_id < {PQ_N_QUERY + PQ_K}
    )"""
    ]
    cur = "pc0"
    for it in range(1, PQ_ITERS + 2):
        out = "pa_final" if it == PQ_ITERS + 1 else f"pa{it}"
        parts.append(f"""
    {out}_dist AS (
      SELECT pe.vec_id, pe.m, c.cid,
             CAST(SUM(CAST((pe.val - c.val) * (pe.val - c.val)
                           AS DECIMAL(38,12))) AS DOUBLE) AS d2
      FROM pe JOIN {cur} c ON c.m = pe.m AND c.sd = pe.sd
      GROUP BY pe.vec_id, pe.m, c.cid
    ),
    {out} AS (
      SELECT vec_id, m, cid FROM (
        SELECT vec_id, m, cid,
               row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) AS rk
        FROM {out}_dist
      ) WHERE rk = 1
    )""")
        if it <= PQ_ITERS:
            parts.append(f"""
    pc{it} AS (
      SELECT a.cid, pe.m, pe.sd,
             CAST(SUM(CAST(pe.val AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS val
      FROM pa{it} a JOIN pe ON pe.vec_id = a.vec_id AND pe.m = a.m
      GROUP BY a.cid, pe.m, pe.sd
    )""")
            cur = f"pc{it}"
    return ",".join(parts), f"pc{PQ_ITERS}"


_PQ_ROUNDS_SQL, _PQ_FINAL_CENTS = _pq_sql_rounds()


@query(
    "pq_ann_topk",
    oracle=f"""
    WITH {_PQ_ROUNDS_SQL},
    qe AS (
      SELECT vec_id, (i - 1) // {PQ_SUBDIM} AS m, (i - 1) % {PQ_SUBDIM} AS sd,
             CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, range(1, 65) t(i)
      WHERE vec_id < {PQ_N_QUERY}
    ),
    qtab AS (
      SELECT q.vec_id AS query_id, q.m, c.cid,
             CAST(SUM(CAST((q.val - c.val) * (q.val - c.val)
                           AS DECIMAL(38,12))) AS DOUBLE) AS d
      FROM qe q JOIN {_PQ_FINAL_CENTS} c ON c.m = q.m AND c.sd = q.sd
      GROUP BY q.vec_id, q.m, c.cid
    ),
    adc AS (
      SELECT qt.query_id, a.vec_id AS neighbor_id,
             CAST(SUM(CAST(qt.d AS DECIMAL(38,6))) AS DOUBLE) AS adc_dist
      FROM pa_final a JOIN qtab qt ON qt.m = a.m AND qt.cid = a.cid
      GROUP BY qt.query_id, a.vec_id
    ),
    short AS (
      SELECT query_id, neighbor_id, adc_dist FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY query_id ORDER BY adc_dist, neighbor_id
               ) AS srk
        FROM adc
      ) WHERE srk <= {PQ_RERANK}
    ),
    en AS (
      SELECT vec_id, embedding, {sql_dot('embedding', 'embedding')} AS nsq
      FROM embeddings
    ),
    rer AS (
      SELECT s.query_id, s.neighbor_id, s.adc_dist,
             {sql_cosine('q.embedding', 'c.embedding', 'q.nsq', 'c.nsq')} AS cos_sim
      FROM short s
      JOIN en q ON q.vec_id = s.query_id
      JOIN en c ON c.vec_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id, adc_dist, cos_sim, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
             ) AS rk
      FROM rer
    )
    WHERE rk <= {PQ_TOP_K}
    """,
)
def pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al., TPAMI 2011) with a
    TRAINED codebook and exact reranking: per-subspace k-means
    ({PQ_M} subspaces × {PQ_K} centroids, {PQ_ITERS} Lloyd rounds,
    first-K init — the kmeans.py determinism discipline applied per
    subspace) encodes each corpus vector as {PQ_M} codes; each query
    precomputes a {PQ_M}×{PQ_K} distance table, ADC-ranks the code
    table, and the top-{PQ_RERANK} shortlist is reranked by EXACT
    cosine (the Faiss IVFPQ+refine shape).  Untrained sample
    codebooks measured recall@5 ≈ 0.2 on this corpus; trained +
    reranked measures ≈ 0.73-0.87 (ann_recall_eval / PERFORMANCE.md).

    Scale shape: training explodes vectors once (map side) and each
    Lloyd round is two hash aggregations with the ≤{PQ_M}×{PQ_K}×
    {PQ_SUBDIM}-row centroid table BROADCAST — corpus-sized shuffles
    never carry vectors, only (vec, m, cid) assignments; encoding is
    the same broadcast join; ADC partial-sums map-side; the exact
    rerank touches {PQ_RERANK} rows per query.  All distances are
    decimal sums (bit-identical across engines); argmin ties break
    by centroid id; empty clusters drop out of the update in both
    engines identically.  Result shared via _shared_topk (the eval
    scores these same rows)."""
    return _shared_topk(
        spark, "ann_pq", sf_dir, lambda: _pq_ann_plan(spark, sf_dir)
    )


# Decimal width for the in-row subspace distance fold: the kmeans.py
# _DEC_FOLD rationale applied to 8-dim subspaces — same scale-12
# per-term rounding as Sum(DECIMAL(38,12)), narrow enough that Spark's
# add-result inference keeps scale 12 through the fold.  Decimal
# addition is exact and order-free, so the fold equals the old
# aggregate bit for bit.
_PQ_DEC_FOLD = "decimal(20,12)"


def _pq_sub_view(emb: DataFrame) -> DataFrame:
    """(vec_id, m, sarr) — each vector's {PQ_M} subspace slices as
    double arrays; element casts identical to the exploded view's."""
    return emb.select(
        "vec_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {PQ_M - 1}), mi -> struct("
                f"CAST(mi AS INT) AS m,"
                f" transform(slice(embedding, mi * {PQ_SUBDIM} + 1,"
                f" {PQ_SUBDIM}), x -> CAST(x AS DOUBLE)) AS sarr))"
            )
        ).alias("e"),
    ).select("vec_id", "e.m", "e.sarr")


def _pq_assign_vec(sub: DataFrame, c: DataFrame) -> DataFrame:
    """Nearest-subspace-centroid assignment as a broadcast narrow map
    (r15: the r14 kmeans._spark_assign_vec pattern applied per
    subspace).  The old form joined the exploded (vec, m, sd) corpus
    against the centroid rows (×{PQ_K} fan-out), hash-aggregated the
    decimal distances (Exchange) and ran a row_number window per
    (vec_id, m) (second Exchange) — per Lloyd round.  Here the ≤
    {PQ_M}×{PQ_K}×{PQ_SUBDIM}-value codebook collapses to {PQ_M} rows
    of (cid, centroid-array) structs, broadcast-hash-joined on m; each
    (vec, m) row evaluates the {PQ_K} decimal folds inline and
    ``array_min`` over (d2, cid) structs is exactly the old
    ORDER BY d2, cid argmin.  Zero data-side Exchanges at any scale."""
    cents = (
        c.groupBy("m", "cid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("sd"), F.col("val")))
            ).alias("dv")
        )
        .select(
            "m",
            F.struct(
                F.col("cid"),
                F.transform("dv", lambda s: s["val"]).alias("cv"),
            ).alias("cc"),
        )
        .groupBy("m")
        .agg(F.array_sort(F.collect_list("cc")).alias("cs"))
    )

    def _d2(cv):
        return F.aggregate(
            F.zip_with(
                F.col("sarr"),
                cv,
                lambda x, y: ((x - y) * (x - y)).cast(_PQ_DEC_FOLD),
            ),
            F.lit(0).cast(_PQ_DEC_FOLD),
            lambda acc, t: (acc + t).cast(_PQ_DEC_FOLD),
        ).cast("double")

    best = F.array_min(
        F.transform(
            F.col("cs"),
            lambda cc: F.struct(
                _d2(cc["cv"]).alias("d2"), cc["cid"].alias("cid")
            ),
        )
    )
    return (
        sub.join(F.broadcast(cents), "m")
        .select("vec_id", "m", best.alias("best"))
        .select("vec_id", "m", F.col("best.cid").alias("cid"))
    )


def _pq_assign_exploded(pe: DataFrame, cents: DataFrame) -> DataFrame:
    """Exploded-input reference form of the PQ assignment — retained as
    the differential twin for _pq_assign_vec (tests compare the two
    bit-exact on real data through the full Lloyd chain)."""
    cc = cents.select(
        "cid",
        F.col("m").alias("cm"),
        F.col("sd").alias("csd"),
        F.col("val").alias("cval"),
    )
    diff = F.col("val") - F.col("cval")
    dist = (
        pe.join(
            F.broadcast(cc),
            (F.col("m") == F.col("cm")) & (F.col("sd") == F.col("csd")),
        )
        .groupBy("vec_id", "m", "cid")
        .agg(F.sum((diff * diff).cast(_DEC12)).cast("double").alias("d2"))
    )
    wa = W.partitionBy("vec_id", "m").orderBy("d2", "cid")
    return (
        dist.withColumn("rk", F.row_number().over(wa))
        .where(F.col("rk") == 1)
        .select("vec_id", "m", "cid")
    )


def _pq_ann_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    pe = (
        emb.where(F.col("vec_id") >= PQ_N_QUERY)
        .select("vec_id", F.posexplode("embedding").alias("p", "fval"))
        .select(
            "vec_id",
            (F.col("p") / PQ_SUBDIM).cast("int").alias("m"),
            (F.col("p") % PQ_SUBDIM).alias("sd"),
            F.col("fval").cast("double").alias("val"),
        )
        .persist()
    )
    from go_map_reduce_spark.registry import track_cache

    track_cache(pe)
    sub = _pq_sub_view(emb.where(F.col("vec_id") >= PQ_N_QUERY))
    c = pe.where(F.col("vec_id") < PQ_N_QUERY + PQ_K).select(
        (F.col("vec_id") - PQ_N_QUERY).alias("cid"), "m", "sd", "val"
    )

    def assign(cents: DataFrame) -> DataFrame:
        return _pq_assign_vec(sub, cents)

    def update(assigned: DataFrame) -> DataFrame:
        # the assignment frame is (corpus × M) narrow rows from a
        # zero-shuffle map — broadcast it so the exploded corpus side
        # never shuffles for the update either
        return (
            pe.join(F.broadcast(assigned), ["vec_id", "m"])
            .groupBy("cid", "m", "sd")
            .agg(
                (
                    F.sum(F.col("val").cast(_DEC12)).cast("double")
                    / F.count(F.lit(1))
                ).alias("val")
            )
        )

    for _ in range(PQ_ITERS):
        c = update(assign(c)).localCheckpoint(eager=True)
    codes = assign(c)
    qe = (
        emb.where(F.col("vec_id") < PQ_N_QUERY)
        .select("vec_id", F.posexplode("embedding").alias("p", "fval"))
        .select(
            F.col("vec_id").alias("query_id"),
            (F.col("p") / PQ_SUBDIM).cast("int").alias("m"),
            (F.col("p") % PQ_SUBDIM).alias("sd"),
            F.col("fval").cast("double").alias("val"),
        )
    )
    cc = c.select(
        "cid",
        F.col("m").alias("cm"),
        F.col("sd").alias("csd"),
        F.col("val").alias("cval"),
    )
    qdiff = F.col("val") - F.col("cval")
    qtab = (
        qe.join(
            F.broadcast(cc),
            (F.col("m") == F.col("cm")) & (F.col("sd") == F.col("csd")),
        )
        .groupBy("query_id", "m", "cid")
        .agg(F.sum((qdiff * qdiff).cast(_DEC12)).cast("double").alias("d"))
    )
    from go_map_reduce_spark.functions.numeric import dsum

    adc = (
        codes.join(F.broadcast(qtab), ["m", "cid"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(dsum(F.col("d")).alias("adc_dist"))
    )
    ws = W.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    short = (
        adc.withColumn("srk", F.row_number().over(ws))
        .where(F.col("srk") <= PQ_RERANK)
        .select("query_id", "neighbor_id", "adc_dist")
    )
    en = emb.select(
        "vec_id", "embedding", norm_sq(F.col("embedding")).alias("nsq")
    )
    qv = en.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nsq").alias("q_nsq"),
    )
    cv = en.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nsq").alias("c_nsq"),
    )
    rer = (
        short.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "adc_dist",
            cosine(
                F.col("q_emb"), F.col("c_emb"), F.col("q_nsq"), F.col("c_nsq")
            ).alias("cos_sim"),
        )
    )
    wr = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        rer.withColumn("rk", F.row_number().over(wr).cast("long"))
        .where(F.col("rk") <= PQ_TOP_K)
    )
