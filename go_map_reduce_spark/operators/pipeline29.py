"""Round-8 third batch: train-side decontamination + the dataset card.

``decontamination_cut`` is the decision-closing counterpart of
``contamination_check`` (dedup.py:708) with the sides swapped: that
query measures how contaminated each HELD-OUT doc is by the training
split; this one decides which TRAINING docs to DROP because they
contain benchmark n-grams — the eval-hygiene cut a pipeline applies
before training (the GPT-3 appendix-C / PaLM decontamination shape,
at n-gram-overlap granularity).

``curation_dataset_card`` is the datasheet a curation run publishes
next to its output: per (split, source) document and token counts of
the FINAL kept set — the capstone's per-doc decisions, regrouped by
provenance — with each cell's token share of its split. Composes the
same ``staged_decisions`` frame as the funnel (one definition of
"what the pipeline decided", pipeline27).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.operators.dedup import (
    _SQL_SHINGLES,
    HELDOUT_MOD,
    _overlap_profile,
    _spark_shingles,
)
from go_map_reduce_spark.operators.pipeline27 import (
    STAGED_ORACLE,
    staged_decisions,
)
from go_map_reduce_spark.registry import query, track_cache

# --------------------------------------------------------------------------
# Train-side decontamination cut
# --------------------------------------------------------------------------

DECON_DROP_RATE = 0.2  # drop a train doc when >= 20% of its distinct
#                        shingles appear in the benchmark; the
#                        benchmark boundary itself is dedup.HELDOUT_MOD
#                        — the SAME constant contamination_check uses,
#                        so both directions audit one split by
#                        construction


@query(
    "decontamination_cut",
    oracle=f"""
    WITH sh AS ({_SQL_SHINGLES}),
    bench AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % {HELDOUT_MOD} = 0
    ),
    tr AS (
      SELECT s.doc_id, s.shingle, b.shingle IS NOT NULL AS hit
      FROM sh s LEFT JOIN bench b ON b.shingle = s.shingle
      WHERE s.doc_id % {HELDOUT_MOD} <> 0
    ),
    agg AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_ngrams,
             CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
               AS n_benchmark_hits
      FROM tr GROUP BY doc_id
    )
    SELECT doc_id, n_ngrams, n_benchmark_hits,
           CAST(n_benchmark_hits AS DOUBLE) / n_ngrams AS overlap_rate,
           CASE WHEN CAST(n_benchmark_hits AS DOUBLE) / n_ngrams
                     >= {DECON_DROP_RATE}
                THEN 'drop' ELSE 'keep' END AS verdict
    FROM agg
    """,
)
def decontamination_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every TRAINING document (doc_id % HELDOUT_MOD != 0): the
    fraction of its shingle OCCURRENCES (non-distinct — a repeated
    benchmark shingle counts each time, the same occurrence-weighted
    rate ``contamination_check`` reports) that appear anywhere in the
    benchmark split's distinct-shingle vocabulary (doc_id %
    HELDOUT_MOD == 0), and the drop/keep verdict at the 0.2 overlap
    threshold — the training-side decontamination pass that protects
    EVAL integrity (the reverse direction of ``contamination_check``,
    which scores the held-out side; both directions run the SHARED
    ``_overlap_profile`` skeleton over the SHARED boundary constant,
    so they audit one split by construction).

    100 TB shape: identical join skeleton to contamination_check —
    ONE equality join on the shingle key, hash-shuffle sized by the
    vocabulary, never all-pairs. The decisive asymmetry at scale: the
    benchmark side is real-world TINY (benchmarks are megabytes
    against a 100 TB corpus), so its distinct-shingle index
    BROADCASTS and the train side never shuffles at all; the
    registered ``bloom_contamination_prefilter`` is the pre-pass that
    keeps even the probe cheap. The verdict column makes the
    downstream read a pushed-down filter (verdict = 'keep'), same as
    the split column's design. The shingle frame feeds both sides, so
    it persists once (the multi-consumer barrier rule, measured on
    contamination_check: 16 s -> ~1 s at sf0.1). Rate and threshold
    compare in double from two exact integers — bit-stable across
    engines."""
    sh = _spark_shingles(spark, sf_dir).persist().transform(track_cache)
    rate = F.col("n_benchmark_hits").cast("double") / F.col("n_ngrams")
    return (
        _overlap_profile(sh, score_heldout=False)
        .withColumnRenamed("n_overlap", "n_benchmark_hits")
        .select(
            "doc_id",
            "n_ngrams",
            "n_benchmark_hits",
            rate.alias("overlap_rate"),
            F.when(rate >= DECON_DROP_RATE, "drop")
            .otherwise("keep")
            .alias("verdict"),
        )
    )


# --------------------------------------------------------------------------
# The curation dataset card
# --------------------------------------------------------------------------


@query(
    "curation_dataset_card",
    oracle=f"""
    WITH staged AS ({STAGED_ORACLE}),
    kept AS (
      SELECT st.doc_id, st.split, d.source,
             st.n_tokens - st.n_removed AS tok
      FROM staged st JOIN documents d ON d.doc_id = st.doc_id
      WHERE st.gate_ok AND st.dedup_ok AND st.media_ok
    ),
    agg AS (
      SELECT split, source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(tok) AS BIGINT) AS tokens_kept
      FROM kept GROUP BY split, source
    )
    SELECT split, source, n_docs, tokens_kept,
           CAST(ROUND(CAST(tokens_kept AS DOUBLE)
                / SUM(tokens_kept) OVER (PARTITION BY split), 6)
                AS DOUBLE) AS token_share
    FROM agg
    """,
)
def curation_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The datasheet of the curated corpus: per (split, source) — the
    provenance axis a consumer audits — the kept-document count, the
    post-cut token count, and the cell's token share within its
    split. Rows exist only for (split, source) cells with at least
    one kept doc; shares sum to 1 per split and the per-split token
    totals reconcile exactly with the capstone funnel's tokens_kept
    (pinned by the cross-operator test).

    100 TB shape: reuses the capstone's ``staged_decisions`` frame
    verbatim (narrow per-doc decision columns — and the expensive
    cluster stage inside it reads the shared_frame blocks), joins
    provenance on doc_id from a column-pruned scan (doc_id, source
    only — plan-visible ReadSchema), and aggregates to a
    cardinality-|splits|x|sources| frame; the share window runs over
    that tiny aggregate, not the corpus."""
    staged = staged_decisions(spark, sf_dir)
    kept = staged.where(
        F.col("gate_ok") & F.col("dedup_ok") & F.col("media_ok")
    ).select(
        "doc_id",
        "split",
        (F.col("n_tokens") - F.col("n_removed")).alias("tok"),
    )
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    agg = (
        kept.join(src, "doc_id")
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").alias("tokens_kept"),
        )
    )
    w = W.partitionBy("split")
    return agg.select(
        "split",
        "source",
        "n_docs",
        F.col("tokens_kept").cast("long").alias("tokens_kept"),
        F.round(
            F.col("tokens_kept").cast("double")
            / F.sum("tokens_kept").over(w),
            6,
        )
        .cast("double")
        .alias("token_share"),
    )


# --------------------------------------------------------------------------
# ANN recall evaluation (approximate tiers vs the brute-force truth)
# --------------------------------------------------------------------------


def _recall_row(
    method: str,
    approx: DataFrame,
    brute: DataFrame,
    k: int,
    n_queries: int,
    pool_min_neighbor: int | None = None,
) -> DataFrame:
    """One (method, k, n_truth, n_hits, recall) row: the approximate
    tier's top-k against the brute-force top-k over the method's own
    query set — all counts computed as aggregates, nothing collected.
    ``pool_min_neighbor`` restricts the TRUTH side to the method's
    reachable candidate pool (PQ's corpus excludes the query
    vectors): an unreachable true neighbor must not be charged
    against the method's recall."""
    t = brute.where(
        (F.col("rk") <= k) & (F.col("query_id") < n_queries)
    )
    if pool_min_neighbor is not None:
        t = t.where(F.col("neighbor_id") >= pool_min_neighbor)
    t = t.select("query_id", "neighbor_id")
    e = approx.where(
        (F.col("rk") <= k) & (F.col("query_id") < n_queries)
    ).select("query_id", "neighbor_id")
    hits = e.join(t, ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    truth = t.agg(F.count(F.lit(1)).alias("n_truth"))
    # Empty-truth guard (r08 advice): a zero truth pool must surface as
    # an explicit NULL recall in BOTH engines (Spark's x/0 is already
    # NULL; DuckDB's double division would yield inf and fail the
    # differential confusingly), and the pytest suite asserts
    # n_truth > 0 so the condition fails loudly, not silently.
    return truth.crossJoin(hits).select(
        F.lit(method).alias("method"),
        F.lit(k).cast("long").alias("k"),
        F.col("n_truth").cast("long").alias("n_truth"),
        F.col("n_hits").cast("long").alias("n_hits"),
        F.when(
            F.col("n_truth") > 0,
            F.col("n_hits").cast("double") / F.col("n_truth"),
        ).alias("recall"),
    )


def _ann_methods() -> list:
    """(name, oracle_cte, k, n_queries, truth_pool_sql, truth_pool_col)
    per approximate method — k and n_queries MUST fit inside the
    brute-force frame's (TOP_K, N_QUERY_VECS) or the truth side would
    silently truncate (asserted loud here, import-time). PQ's truth is
    restricted to its reachable pool (its corpus excludes the query
    vectors), so its recall measures quantization error, not pool
    exclusion."""
    from go_map_reduce_spark.operators.kmeans import (
        IVF_TOP_K,
        N_IVF_QUERIES,
    )
    from go_map_reduce_spark.operators.similarity import (
        BUCKET_TOP_K,
        N_QUERY_VECS,
        PQ_N_QUERY,
        PQ_TOP_K,
        TOP_K,
    )

    methods = [
        ("lsh_bucket", "lshq", BUCKET_TOP_K, N_QUERY_VECS, "TRUE", None),
        ("ivf_probe", "ivfq", IVF_TOP_K, N_IVF_QUERIES, "TRUE", None),
        (
            "pq_adc",
            "pqq",
            min(TOP_K, PQ_TOP_K),
            PQ_N_QUERY,
            f"b.neighbor_id >= {PQ_N_QUERY}",
            PQ_N_QUERY,
        ),
    ]
    for name, _, k, nq, _, _ in methods:
        assert k <= TOP_K, (name, k, TOP_K)
        assert nq <= N_QUERY_VECS, (name, nq, N_QUERY_VECS)
    return methods


def _ann_recall_oracle() -> str:
    from go_map_reduce_spark.registry import ORACLES

    rows = []
    for name, cte, k, nq, pool_sql, _ in _ann_methods():
        rows.append(f"""
      SELECT '{name}' AS method, CAST({k} AS BIGINT) AS k,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM brute b
              WHERE b.rk <= {k} AND b.query_id < {nq}
                AND {pool_sql}) AS n_truth,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM {cte} a
              JOIN brute b ON b.query_id = a.query_id
                          AND b.neighbor_id = a.neighbor_id
                          AND b.rk <= {k}
              WHERE a.rk <= {k} AND a.query_id < {nq}) AS n_hits""")
    body = "\n      UNION ALL\n".join(rows)
    return f"""
    WITH brute AS ({ORACLES['ann_bruteforce_topk']}),
    lshq AS ({ORACLES['ann_lsh_topk']}),
    ivfq AS ({ORACLES['ivf_probe_topk']}),
    pqq AS ({ORACLES['pq_ann_topk']}),
    per_method AS ({body}
    )
    SELECT method, k, n_truth, n_hits,
           CASE WHEN n_truth > 0 THEN CAST(n_hits AS DOUBLE) / n_truth
                ELSE NULL END AS recall
    FROM per_method
    """


@query("ann_recall_eval", oracle=_ann_recall_oracle())
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN calibration run — `minhash_recall_eval`'s counterpart
    for the similarity tier: recall@k of each approximate method
    (sign-bit LSH buckets, IVF cell probe, PQ asymmetric-distance)
    against the brute-force cosine truth, per method over its own
    registered query set and k. Recall is a DATA measurement, not an
    axiom: an LSH bucket that doesn't contain a true neighbor, an IVF
    cell boundary that splits a neighborhood, or PQ quantization
    error each cost real recall, and the number is what an index
    owner tunes against (nprobe, bucket bits, PQ_M) before trusting
    the index at corpus scale.

    100 TB shape: pure composition — each tier's registered plan runs
    unchanged (brute: broadcast query side over one corpus scan; LSH/
    IVF: equality joins on bucket/cell keys; PQ: broadcast code
    table); the eval adds only top-k-sized equality joins and
    constant-size aggregates, with the (≤ n_queries·k row) brute
    frame persisted across the three comparisons. No collect — all
    five columns are computed as aggregates."""
    from go_map_reduce_spark.operators.kmeans import ivf_probe_topk
    from go_map_reduce_spark.operators.similarity import (
        ann_bruteforce_topk,
        ann_lsh_topk,
        pq_ann_topk,
    )
    from go_map_reduce_spark.registry import track_cache

    brute = (
        ann_bruteforce_topk(spark, sf_dir)
        .select("query_id", "neighbor_id", "rk")
        .persist()
        .transform(track_cache)
    )
    approx_frames = {
        "lsh_bucket": ann_lsh_topk(spark, sf_dir),
        "ivf_probe": ivf_probe_topk(spark, sf_dir),
        "pq_adc": pq_ann_topk(spark, sf_dir),
    }
    rows = [
        _recall_row(name, approx_frames[name], brute, k, nq, pool_col)
        for name, _, k, nq, _, pool_col in _ann_methods()
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
