"""Ranked keyword retrieval: BM25 top-k over the documents corpus.

The reference's inverted index (mrapps/indexer.go:20-39) stops at the
posting list; this module adds the retrieval step a training-data /
search pipeline runs on top of it — Okapi BM25 scoring of a fixed query
term set, returning the k best documents.

Scale design: the token explode is filtered to the query terms BEFORE
any shuffle (a 3-element IN list prunes ~all rows map-side); document
frequencies and corpus length statistics are tiny aggregates broadcast
back onto the per-doc partials; the final top-k is a TakeOrderedAndProject
(no global sort materialization). No driver-side actions, no UDFs.

Float determinism: idf is ln() rounded to 6dp (cross-libm safety, same
discipline as quality_filters.unigram_logprob_scores); every other
per-row op is a fixed-order IEEE double expression mirrored textually in
the oracle; the per-document sum over query terms is an exact decimal
sum (functions/numeric.dsum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.functions.numeric import dsum, sql_dsum
from go_map_reduce_spark.operators.textstats import _sql_toks, _toks
from go_map_reduce_spark.registry import query

QUERY_TERMS = ("vector", "stream", "hash")
K1 = 1.2
B = 0.75
TOP_K = 20


@query(
    "bm25_search_topk",
    oracle=f"""
    WITH doc_toks AS (
      SELECT doc_id, {_sql_toks('text')} AS toks FROM documents
    ),
    doclen AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM doc_toks
      WHERE len(toks) > 0
    ),
    corpus AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM doclen
    ),
    tf AS (
      SELECT doc_id, tok AS term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(toks) AS tok FROM doc_toks)
      WHERE tok IN {QUERY_TERMS!r}
      GROUP BY doc_id, tok
    ),
    df AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    idf AS (
      SELECT term, df,
             round(ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0), 6)
               AS idf
      FROM df CROSS JOIN corpus
    ),
    scored AS (
      SELECT tf.doc_id,
             idf.idf * (tf.tf * ({K1} + 1.0))
               / (tf.tf + {K1} * (1.0 - {B} + {B} * (CAST(dl.dl AS DOUBLE) / corpus.avgdl)))
               AS term_score
      FROM tf
      JOIN idf ON tf.term = idf.term
      JOIN doclen dl ON tf.doc_id = dl.doc_id
      CROSS JOIN corpus
    )
    SELECT doc_id, {sql_dsum('term_score')} AS bm25
    FROM scored
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT {TOP_K}
    """,
)
def bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-{20}: score = Σ_t idf(t) · tf·(k1+1) /
    (tf + k1·(1 − b + b·dl/avgdl)) for the fixed query term set."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", _toks(F.col("text")).alias("toks"))
    doclen = toks.where(F.size("toks") > 0).select(
        "doc_id", F.size("toks").cast("long").alias("dl")
    )
    corpus = doclen.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    # dl rides the explode so scoring never re-joins the full per-doc
    # table (only the 3-row df/idf and 1-row corpus frames join back,
    # both broadcast — the corpus-wide doc_id shuffle disappears).
    tf = (
        toks.where(F.size("toks") > 0)
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("dl"),
            F.explode("toks").alias("term"),
        )
        .where(F.col("term").isin(*QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"), F.max("dl").alias("dl"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = df.crossJoin(F.broadcast(corpus)).select(
        "term",
        F.round(
            F.log(
                (F.col("n_docs").cast("double") - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
                + 1.0
            ),
            6,
        ).alias("idf"),
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            (
                F.col("idf")
                * (F.col("tf") * (K1 + 1.0))
                / (
                    F.col("tf")
                    + K1 * (1.0 - B + B * (F.col("dl").cast("double") / F.col("avgdl")))
                )
            ).alias("term_score"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(dsum(F.col("term_score")).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(TOP_K)
    )
