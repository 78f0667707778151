"""Exact top-k similarity with admissible pruning — the middle tier
between `ann_bruteforce_topk` (exact, linear, no pruning) and the
approximate paths (LSH / IVF / PQ in similarity.py, kmeans.py): the
result is BIT-IDENTICAL to brute force, but candidates whose cheap
partial-distance upper bound cannot reach the current k-th score are
eliminated before their full dot product is computed.

Technique (partial-distance / Cauchy–Schwarz pruning, the classic
exact-k-NN accelerator): split each vector into a head (first
HEAD_DIMS dims) and tail;  dot(q,c) = dot_head + dot_tail and
dot_tail ≤ ||q_tail||·||c_tail||, so

    cos(q,c) ≤ (dot_head + ||q_tail||·||c_tail||) / (||q||·||c||)

A pruning threshold τ (per query) comes from exactly scoring a small
deterministic probe subset; any candidate whose upper bound falls
below τ cannot enter the top-k and is skipped. Admissibility makes
this exact: every true top-k member scores ≥ τ, hence bounds ≥ τ.

HONESTY NOTE on effectiveness: pruning power is a property of the
DATA, not the plan. On this repo's synthetic `embeddings` table the
vectors are isotropic noise — pairwise distances concentrate (measured
d ∈ [1.10, 1.52] for ALL pairs, within- and cross-cluster alike), the
textbook curse-of-dimensionality regime where NO admissible bound can
separate candidates, so here the bound keeps ~everything and the
operator degrades gracefully to brute force plus one cheap extra
column. On data with genuine cluster structure (real text/image
embeddings have low intrinsic dimension) the same plan prunes hard —
`tests/test_round5_pipeline6.py` pins >70% elimination on a
constructed clustered corpus, and exactness on both corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.functions.vector import (
    cosine,
    dot_product,
    norm_sq,
    sql_cosine,
    sql_dot,
)
from go_map_reduce_spark.registry import query

PRUNE_N_QUERY = 6    # query set: vec_id < 6
PRUNE_TOP_K = 8
PRUNE_HEAD_DIMS = 16
PRUNE_PROBE_MOD = 8  # probe subset: vec_id % 8 == 0 (≈ corpus/8)
PRUNE_SLACK = 1e-9   # absorbs FP rounding in the bound computation


def pruned_exact_topk(
    emb: DataFrame,
    dims: int,
    n_query: int = PRUNE_N_QUERY,
    top_k: int = PRUNE_TOP_K,
    head_dims: int = PRUNE_HEAD_DIMS,
    probe_mod: int = PRUNE_PROBE_MOD,
) -> DataFrame:
    """Core pipeline over any (vec_id, embedding) frame — the
    registered query binds it to the parquet corpus; the pruning pytest
    binds it to a constructed clustered corpus where the bound bites.
    Returns (query_id, neighbor_id, cos_sim, rk)."""
    # clamp the split so dims <= head_dims can't produce a zero/negative
    # tail slice (degenerates gracefully: tiny tail → bound ≈ exact)
    head_dims = max(1, min(head_dims, dims - 1))
    e = emb.select(
        "vec_id",
        "embedding",
        norm_sq(F.col("embedding")).alias("nsq"),
        F.slice("embedding", 1, head_dims).alias("head"),
        norm_sq(F.slice("embedding", head_dims + 1, dims - head_dims)).alias(
            "tail_nsq"
        ),
    )
    q = e.where(F.col("vec_id") < n_query).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nsq").alias("q_nsq"),
        F.col("head").alias("q_head"),
        F.col("tail_nsq").alias("q_tail_nsq"),
    )
    # Stage 1 — probe: exact scores on the deterministic subset fix the
    # per-query floor τ (the k-th best probe score).
    probe_scored = (
        e.where(F.col("vec_id") % probe_mod == 0)
        .join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            cosine(
                F.col("q_emb"), F.col("embedding"), F.col("q_nsq"), F.col("nsq")
            ).alias("cos_sim"),
        )
    )
    wp = W.partitionBy("query_id").orderBy(F.desc("cos_sim"))
    tau = (
        probe_scored.withColumn("rk", F.row_number().over(wp))
        .where(F.col("rk") <= top_k)
        .groupBy("query_id")
        .agg(F.min("cos_sim").alias("tau"), F.count(F.lit(1)).alias("n_probe"))
    )
    # LEFT join + a floor below -1 (the cosine floor): τ is only
    # admissible when the probe subset yielded a FULL top_k — with fewer
    # than k probe scores, min-over-fewer can exceed the true k-th best
    # and would prune true neighbors. Both the empty-probe case (NULL
    # after the left join) and the short-probe case (n_probe < top_k)
    # fall back to keep-everything brute force.
    qt = (
        q.join(tau, "query_id", "left")
        .withColumn(
            "tau",
            F.when(F.col("n_probe") >= top_k, F.col("tau")).otherwise(
                F.lit(-2.0)
            ),
        )
        .drop("n_probe")
    )
    # Stage 2 — bound: head dot + Cauchy–Schwarz tail cap, head_dims/dims
    # of the full multiply-adds. Probes re-enter unconditionally (τ's own
    # evidence must stay in the pool even when its bound is slack-tight).
    bound = (
        dot_product(F.col("q_head"), F.col("head"))
        + F.sqrt(F.col("q_tail_nsq") * F.col("tail_nsq"))
    ) / (F.sqrt(F.col("q_nsq")) * F.sqrt(F.col("nsq")))
    survivors = e.join(
        F.broadcast(qt), F.col("vec_id") != F.col("query_id")
    ).where(
        (bound >= F.col("tau") - PRUNE_SLACK)
        | (F.col("vec_id") % probe_mod == 0)
    )
    # Stage 3 — verify: full cosine on survivors only, then the usual
    # per-query top-k window.
    scored = survivors.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(
            F.col("q_emb"), F.col("embedding"), F.col("q_nsq"), F.col("nsq")
        ).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= top_k)
    )


@query(
    "ann_pruned_exact_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding, {sql_dot('embedding', 'embedding')} AS nsq
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {sql_cosine('q.embedding', 'c.embedding', 'q.nsq', 'c.nsq')} AS cos_sim
      FROM e q JOIN e c ON q.vec_id < {PRUNE_N_QUERY} AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
             ) AS rk
      FROM scored
    )
    WHERE rk <= {PRUNE_TOP_K}
    """,
)
def ann_pruned_exact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-{PRUNE_TOP_K} with partial-distance pruning.
    The ORACLE is plain brute force — the differential proof that
    pruning is answer-preserving, which is the operator's whole point.

    Scale shape: the corpus never shuffles — queries, and then
    (query, τ) rows, broadcast; stages are narrow maps plus one final
    top-k. Norms/heads are tiny precomputable columns, so at 100 TB a
    column-pruned scan feeds the bound stage {PRUNE_HEAD_DIMS}+2 of
    {64} dims for every row that gets eliminated; survivors pay the
    full read. See the module docstring for when the bound actually
    eliminates (clustered data) vs when it can't (isotropic noise,
    like this synthetic corpus — measured and documented, not
    hidden)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return pruned_exact_topk(emb, dims=64)
