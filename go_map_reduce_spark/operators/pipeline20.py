"""Round-4 pipeline batch: incremental corpus maintenance.

The daily-crawl production shape: a NEW batch of documents arrives and
must be deduplicated against the EXISTING corpus index without
recomputing the corpus — at 100 TB the index side's minhash bands are
a stored table keyed by (band, bkey) and only the new batch's
signatures are computed fresh; the candidate join is the same
band-key equality join as the symmetric pipeline
(operators/dedup.py), just asymmetric (small new side ⋈ large stored
side), and the verify stage is confined to candidates exactly as
before. Here both sides derive from the one `documents` table via a
deterministic split so the DuckDB oracle can replay the whole thing.

Reference parity note: the reference has no dedup surface at all
(mr/ is a bare MapReduce scheduler); this is part of the
training-pipeline extension family (SURVEY.md §12-13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

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
from go_map_reduce_spark.registry import query, track_cache

# Deterministic batch split: docs with doc_id % 10 == 7 play the role
# of "today's crawl" (~10% of the corpus); everything else is the
# standing index.
NEW_BATCH_MOD = 10
NEW_BATCH_REM = 7


@query(
    "incremental_dedup_new_batch",
    oracle=f"""
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
           WHERE n.doc_id % {NEW_BATCH_MOD} = {NEW_BATCH_REM}
             AND i.doc_id % {NEW_BATCH_MOD} <> {NEW_BATCH_REM}
         ),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         inter AS (
           SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
           FROM cand c
           JOIN sh sa ON sa.doc_id = c.doc_a
           JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
           GROUP BY c.doc_a, c.doc_b
         ),
         ver AS (
           SELECT i.doc_a, i.doc_b,
                  CAST(i.n_inter AS DOUBLE) / (na.n + nb.n - i.n_inter)
                    AS jaccard
           FROM inter i
           JOIN sizes na ON na.doc_id = i.doc_a
           JOIN sizes nb ON nb.doc_id = i.doc_b
           WHERE CAST(i.n_inter AS DOUBLE) / (na.n + nb.n - i.n_inter)
                 >= {JACCARD_THRESHOLD}
         ),
         best AS (
           SELECT doc_a, doc_b, jaccard,
                  row_number() OVER (
                    PARTITION BY doc_a ORDER BY jaccard DESC, doc_b
                  ) AS rk
           FROM ver
         )
    SELECT d.doc_id,
           (b.doc_b IS NOT NULL) AS is_near_dup,
           b.doc_b AS match_doc_id,
           round(b.jaccard, 6) AS match_jaccard
    FROM (SELECT doc_id FROM documents
          WHERE doc_id % {NEW_BATCH_MOD} = {NEW_BATCH_REM}) d
    LEFT JOIN (SELECT * FROM best WHERE rk = 1) b ON b.doc_a = d.doc_id
    """,
)
def incremental_dedup_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: admit or reject each NEW-batch document
    against the standing corpus index. Per new doc: is any index doc a
    verified near-dup (exact shingle Jaccard ≥ {JACCARD_THRESHOLD}
    among LSH band-key candidates), and if so which index doc matches
    best (max Jaccard, doc_id tiebreak)?

    Scale shape — the reason this is its own operator and not "run the
    symmetric pipeline on the union": the candidate join is NEW ⋈
    INDEX on (band, bkey) — new-batch-sized on one side, so daily work
    is O(|new| · bucket) regardless of corpus size, and index-side
    band keys never recompute (at 100 TB they are a stored table;
    here both sides come off one scan so the oracle can replay it).
    Index⋈index pairs are never generated. The degenerate-bucket cap
    applies as in the symmetric pipeline (over-cap buckets are
    boilerplate — handled by lsh_template_clusters' keep-one policy,
    not pairwise verification). Verify is confined to candidates
    (array_intersect per pair); the best-match pick is a per-new-doc
    window over candidate matches only. Cites dedup.py's pipeline
    pieces directly — one shingle/signature implementation, two
    consumption patterns (batch self-dedup vs incremental admit)."""
    docsets = _doc_shingle_sets(spark, sf_dir).persist().transform(track_cache)
    bands = _spark_bands(_spark_signatures(docsets))
    bsz = F.count(F.lit(1)).over(W.partitionBy("band", "bkey"))
    small = bands.withColumn("bsz", bsz).where(
        F.col("bsz") <= LSH_BUCKET_CAP
    ).drop("bsz")
    is_new = (F.col("doc_id") % NEW_BATCH_MOD) == NEW_BATCH_REM
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
    verified = _verify_jaccard(docsets, cand)
    rk = F.row_number().over(
        W.partitionBy("doc_a").orderBy(F.desc("jaccard"), F.asc("doc_b"))
    )
    best = verified.withColumn("rk", rk).where(F.col("rk") == 1)
    new_docs = docsets.where(is_new).select("doc_id")
    return new_docs.join(
        best, new_docs.doc_id == best.doc_a, "left"
    ).select(
        "doc_id",
        F.col("doc_b").isNotNull().alias("is_near_dup"),
        F.col("doc_b").alias("match_doc_id"),
        F.round("jaccard", 6).alias("match_jaccard"),
    )
