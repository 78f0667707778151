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

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.functions.vector import cosine, norm_sq, sql_cosine, sql_dot
from go_map_reduce_spark.operators.dedup import SIGN_BUCKET_DIMS, _SQL_SIGN_BUCKET
from go_map_reduce_spark.registry import query

N_QUERY_VECS = 8  # brute-force demo query set: vec_id < 8
TOP_K = 5
BUCKET_TOP_K = 3


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
    ranking: cosine desc, neighbor_id asc tiebreak."""
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


@query(
    "ann_lsh_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding,
             {_SQL_SIGN_BUCKET} AS bucket,
             {sql_dot('embedding', 'embedding')} AS nsq
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {sql_cosine('q.embedding', 'c.embedding', 'q.nsq', 'c.nsq')} AS cos_sim
      FROM e q JOIN e c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
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
    """Bucketed ANN: every vector's top-3 neighbors *within its sign-bit
    LSH bucket* — the candidate set an IVF/LSH index would probe. The
    self-join is an equality join on the 8-bit bucket key; per-bucket
    pair work is bounded by bucket size, not corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    bucket = F.concat(
        *[
            F.when(F.element_at("embedding", i) > 0, "1").otherwise("0")
            for i in range(1, SIGN_BUCKET_DIMS + 1)
        ]
    )
    e = emb.select(
        "vec_id",
        "embedding",
        bucket.alias("bucket"),
        norm_sq(F.col("embedding")).alias("nsq"),
    )
    q = e.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
        F.col("nsq").alias("q_nsq"),
    )
    scored = (
        e.join(
            q,
            (F.col("bucket") == F.col("q_bucket"))
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

PQ_M = 4          # subspaces
PQ_SUBDIM = 16    # dims per subspace (4 × 16 = 64)
PQ_K = 8          # centroids per subspace
PQ_N_QUERY = 3    # query set: vec_id < 3
PQ_TOP_K = 10


def _sql_subdot(a: str, b: str, a_off: str, b_off: str, dims: int) -> str:
    """In-order fold of Σ (a[a_off+i] − b[b_off+i])² as double."""
    return (
        f"list_reduce(list_transform(range(1, {dims + 1}), i -> "
        f"CAST(({a}[{a_off} + i] - {b}[{b_off} + i]) * "
        f"({a}[{a_off} + i] - {b}[{b_off} + i]) AS DOUBLE)), (x, y) -> x + y)"
    )


@query(
    "pq_ann_topk",
    oracle=f"""
    WITH centroids AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, embedding
      FROM embeddings
      WHERE vec_id >= {PQ_N_QUERY} AND vec_id < {PQ_N_QUERY + PQ_K}
    ),
    subspaces AS (SELECT unnest(range({PQ_M})) AS m),
    corpus AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {PQ_N_QUERY}
    ),
    dists AS (
      SELECT c.vec_id, s.m, cent.k,
             {_sql_subdot('c.embedding', 'cent.embedding',
                          f's.m * {PQ_SUBDIM}', f's.m * {PQ_SUBDIM}', PQ_SUBDIM)}
               AS d
      FROM corpus c CROSS JOIN subspaces s CROSS JOIN centroids cent
    ),
    mins AS (
      SELECT vec_id, m, MIN(d) AS min_d FROM dists GROUP BY vec_id, m
    ),
    codes AS (
      SELECT d.vec_id, d.m, MIN(d.k) AS code, MIN(mins.min_d) AS cell_d
      FROM dists d JOIN mins ON d.vec_id = mins.vec_id AND d.m = mins.m
                   AND d.d = mins.min_d
      GROUP BY d.vec_id, d.m
    ),
    qtable AS (
      SELECT q.vec_id AS query_id, s.m, cent.k,
             {_sql_subdot('q.embedding', 'cent.embedding',
                          f's.m * {PQ_SUBDIM}', f's.m * {PQ_SUBDIM}', PQ_SUBDIM)}
               AS d
      FROM embeddings q CROSS JOIN subspaces s CROSS JOIN centroids cent
      WHERE q.vec_id < {PQ_N_QUERY}
    ),
    adc AS (
      SELECT qt.query_id, codes.vec_id AS neighbor_id,
             CAST(SUM(CAST(qt.d AS DECIMAL(38,6))) AS DOUBLE) AS adc_dist
      FROM codes JOIN qtable qt ON codes.m = qt.m AND codes.code = qt.k
      GROUP BY qt.query_id, codes.vec_id
    )
    SELECT query_id, neighbor_id, adc_dist, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY query_id ORDER BY adc_dist, neighbor_id
             ) AS rk
      FROM adc
    )
    WHERE rk <= {PQ_TOP_K}
    """,
)
def pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al., TPAMI 2011): vectors are
    encoded as {PQ_M} one-byte codes (argmin centroid per subspace) and
    queries scan CODES, not vectors — the memory-bound regime that makes
    billion-scale ANN fit a cluster. Asymmetric distance (ADC): each
    query precomputes a {PQ_M}×{PQ_K} lookup table of subspace
    distances; a neighbor's distance is the sum of {PQ_M} table cells.

    Codebook: deterministic data sample (the {PQ_K} lowest non-query
    vec_ids) — a production pipeline k-means-trains each subspace
    (kmeans.py is that machinery) but the encode/ADC dataflow is
    identical and that's what this operator pins.

    Scale shape: the 32-row codebook and the query table broadcast;
    encoding is one map-side pass over the corpus (per row: {PQ_M}×
    {PQ_K} fixed-order folds, all codegen — no UDF, no shuffle); ADC
    groups (query, neighbor) partial sums map-side. Nothing shuffles
    except the final per-query top-k. Distances are sequential-fold
    doubles (functions/vector discipline), ADC sums exact decimal."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = (
        emb.where(
            (F.col("vec_id") >= PQ_N_QUERY)
            & (F.col("vec_id") < PQ_N_QUERY + PQ_K)
        )
        .select(
            (
                F.row_number().over(W.orderBy("vec_id")) - 1
            ).alias("k"),
            F.col("embedding").alias("cent"),
        )
    )
    subspaces = spark.range(PQ_M).select(F.col("id").cast("int").alias("m"))
    cent_grid = F.broadcast(centroids.crossJoin(subspaces))

    def subdist(vec: F.Column, cent: F.Column, m: F.Column) -> F.Column:
        a = F.slice(vec, m * PQ_SUBDIM + 1, PQ_SUBDIM)
        b = F.slice(cent, m * PQ_SUBDIM + 1, PQ_SUBDIM)
        diffs = F.zip_with(a, b, lambda x, y: ((x - y) * (x - y)).cast("double"))
        return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)

    corpus = emb.where(F.col("vec_id") >= PQ_N_QUERY)
    codes = (
        corpus.join(cent_grid)
        .select(
            "vec_id",
            "m",
            "k",
            subdist(F.col("embedding"), F.col("cent"), F.col("m")).alias("d"),
        )
        .groupBy("vec_id", "m")
        .agg(F.min(F.struct("d", "k")).alias("best"))
        .select("vec_id", "m", F.col("best.k").alias("code"))
    )
    qtable = (
        emb.where(F.col("vec_id") < PQ_N_QUERY)
        .join(cent_grid)
        .select(
            F.col("vec_id").alias("query_id"),
            "m",
            "k",
            subdist(F.col("embedding"), F.col("cent"), F.col("m")).alias("d"),
        )
    )
    from go_map_reduce_spark.functions.numeric import dsum

    adc = (
        codes.join(
            F.broadcast(qtable),
            (codes.m == qtable.m) & (codes.code == qtable.k),
        )
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(dsum(F.col("d")).alias("adc_dist"))
    )
    w = W.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        adc.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= PQ_TOP_K)
    )
