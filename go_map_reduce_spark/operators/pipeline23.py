"""Round-6 pipeline operators, second batch: dedup calibration and
corpus-audit depth.

- MinHash estimator calibration: signature-agreement estimate vs exact
  Jaccard for every verified near-dup pair (is 12 hashes enough?).
- Cross-source duplication matrix: which sources copy from which —
  the provenance view of the near-dup pair set.
- Quality rule gate with audit reasons: FineWeb/Gopher-style
  keep/drop decision recording WHICH rule fired first.
- Contrastive negative sampling: deterministic hash-ranked negatives
  from other label classes, the retrieval-training data op.
- Conditional entropy H(lang | source): the information-theoretic
  audit behind corpus mixing (chi2/KL's third sibling).

All five compose registered tiers or pure per-row expressions; the
composition queries import the tier functions directly (never via the
registry's string keys) so the gate's per-function staleness closure
sees the dependency edges."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.functions.numeric import dsum, sql_dsum
from go_map_reduce_spark.operators.dedup import (
    N_HASHES,
    _SQL_SHINGLES,
    _SQL_SIGS,
    _doc_shingle_sets,
    _spark_signatures,
    minhash_near_dup_pairs,
)
from go_map_reduce_spark.registry import ORACLES, query

# --------------------------------------------------------------------------
# MinHash estimator calibration
# --------------------------------------------------------------------------

_SIG_COLS = [f"mh{j}" for j in range(N_HASHES)]


@query(
    "minhash_jaccard_estimate_error",
    oracle=f"""
    WITH pairs AS ({ORACLES["minhash_near_dup_pairs"]}),
    sh AS ({_SQL_SHINGLES}),
    sigs AS ({_SQL_SIGS})
    SELECT p.doc_a, p.doc_b, p.jaccard,
           round(({" + ".join(f"CAST(a.mh{j} = b.mh{j} AS INT)" for j in range(N_HASHES))})
                 / {N_HASHES}.0, 6) AS est,
           round(abs(({" + ".join(f"CAST(a.mh{j} = b.mh{j} AS INT)" for j in range(N_HASHES))})
                 / {N_HASHES}.0 - p.jaccard), 6) AS abs_err
    FROM pairs p
    JOIN sigs a ON a.doc_id = p.doc_a
    JOIN sigs b ON b.doc_id = p.doc_b
    """,
)
def minhash_jaccard_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration: for every VERIFIED near-dup pair,
    the signature-agreement estimate (matching components / {N_HASHES})
    against the exact shingle Jaccard, with absolute error — the
    measurement that decides whether {N_HASHES} hashes suffice or the
    signature must widen before trusting estimates at corpus scale
    (minhash_recall_eval answers "did LSH find the pairs"; this answers
    "can the signatures REPLACE the verify stage").

    100 TB shape: the pair frame is candidate-sized, signatures are
    per-row/no-shuffle (_spark_signatures), and the two signature
    joins are keyed equality joins on the pair endpoints — nothing
    scales beyond the already-bounded pair set."""
    pairs = minhash_near_dup_pairs(spark, sf_dir)
    sigs = _spark_signatures(_doc_shingle_sets(spark, sf_dir))
    a = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(c).alias(f"a_{c}") for c in _SIG_COLS],
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(c).alias(f"b_{c}") for c in _SIG_COLS],
    )
    agree = sum(
        (F.col(f"a_{c}") == F.col(f"b_{c}")).cast("int") for c in _SIG_COLS
    )
    est = F.round(agree / float(N_HASHES), 6)
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            est.alias("est"),
            F.round(F.abs(agree / float(N_HASHES) - F.col("jaccard")), 6).alias(
                "abs_err"
            ),
        )
    )


# --------------------------------------------------------------------------
# Cross-source duplication matrix
# --------------------------------------------------------------------------


@query(
    "cross_source_dup_matrix",
    oracle=f"""
    WITH pairs AS ({ORACLES["minhash_near_dup_pairs"]})
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round({sql_dsum("p.jaccard")} / COUNT(*), 6) AS avg_jaccard
    FROM pairs p
    JOIN documents da ON da.doc_id = p.doc_a
    JOIN documents db ON db.doc_id = p.doc_b
    GROUP BY 1, 2
    """,
)
def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance view of near-duplication: for each (unordered) pair
    of sources, how many verified near-dup pairs cross them and at what
    mean similarity — the matrix that tells a corpus curator WHICH
    feeds mirror each other (same-source cells) or syndicate content
    (cross-source cells), i.e. where dedup budget actually goes.

    100 TB shape: the pair set is already bounded by the LSH tier; the
    two doc_id→source lookups are keyed joins against a two-column
    projection of documents, and the final aggregate groups a
    pair-sized frame by a source-pair key (bounded by #sources²).
    The mean goes through the exact-decimal-sum convention
    (functions/numeric.py) like every cross-engine float aggregate."""
    pairs = minhash_near_dup_pairs(spark, sf_dir)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    joined = (
        pairs.join(src.withColumnRenamed("source", "sa"), pairs.doc_a == src.doc_id)
        .drop("doc_id")
        .join(
            src.withColumnRenamed("source", "sb").withColumnRenamed(
                "doc_id", "doc_id_b"
            ),
            pairs.doc_b == F.col("doc_id_b"),
        )
    )
    return (
        joined.select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            "jaccard",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(dsum(F.col("jaccard")) / F.count(F.lit(1)), 6).alias(
                "avg_jaccard"
            ),
        )
    )


# --------------------------------------------------------------------------
# Quality rule gate with audit reasons
# --------------------------------------------------------------------------

GATE_MIN_TOKENS = 15
GATE_MAX_TOKENS = 1000
GATE_MIN_STOPWORD = 0.05
GATE_MAX_DUPTOK = 0.7

_GATE_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "for")


@query(
    "doc_quality_composite_gate",
    oracle=rf"""
    WITH per_doc AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE CAST(len(list_filter(toks,
                         x -> list_contains({list(_GATE_STOPWORDS)}, x)))
                       AS DOUBLE) / len(toks) END AS stopword_ratio,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
                       / len(toks) END AS dup_token_frac
      FROM (SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '\s+'),
                               x -> x <> '') AS toks
            FROM documents)
    )
    SELECT doc_id, n_tokens,
           round(stopword_ratio, 6) AS stopword_ratio,
           round(dup_token_frac, 6) AS dup_token_frac,
           CASE
             WHEN n_tokens < {GATE_MIN_TOKENS} THEN 'too_short'
             WHEN n_tokens > {GATE_MAX_TOKENS} THEN 'too_long'
             WHEN stopword_ratio < {GATE_MIN_STOPWORD} THEN 'low_stopword'
             WHEN dup_token_frac > {GATE_MAX_DUPTOK} THEN 'repetitive'
             ELSE 'keep'
           END AS verdict
    FROM per_doc
    """,
)
def doc_quality_composite_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-gate with an audit trail (the FineWeb/Gopher filtering
    pattern): every document gets a verdict — 'keep' or the FIRST
    failing rule in a FIXED evaluation order (length bounds, stopword
    floor, repetition ceiling). Recording the reason, not just the
    boolean, is what makes a 100 TB filter debuggable: the reason
    histogram is the pipeline's drift alarm, and re-tuning one
    threshold re-scores only its rule.

    100 TB shape: entirely per-row array expressions (one lower+split
    pass, reused by all rules) — no shuffle at all; the gate composes
    signals inline rather than joining text_quality_scores /
    repetition_stats so the scan stays single-pass.

    r15: memoized via registry.shared_frame — four call sites compose
    on the verdict frame (the staged decisions, the bucketed layout,
    the streaming-admit side frame, this query itself) and each used
    to re-pay the full text scan + tokenize pass; the frame is five
    narrow columns per doc.  Build billed to the first consumer
    (memo-aware bench reps)."""
    from go_map_reduce_spark.registry import shared_frame

    def _build() -> DataFrame:
        toks = F.filter(
            F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != ""
        )
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", toks.alias("toks")
        )
        n = F.size("toks")
        stop = F.when(n == 0, F.lit(0.0)).otherwise(
            F.size(F.filter("toks", lambda x: x.isin(*_GATE_STOPWORDS))).cast(
                "double"
            )
            / n
        )
        dup = F.when(n == 0, F.lit(0.0)).otherwise(
            1.0 - F.size(F.array_distinct("toks")).cast("double") / n
        )
        verdict = (
            F.when(n < GATE_MIN_TOKENS, "too_short")
            .when(n > GATE_MAX_TOKENS, "too_long")
            .when(stop < GATE_MIN_STOPWORD, "low_stopword")
            .when(dup > GATE_MAX_DUPTOK, "repetitive")
            .otherwise("keep")
        )
        return docs.select(
            "doc_id",
            n.cast("long").alias("n_tokens"),
            F.round(stop, 6).alias("stopword_ratio"),
            F.round(dup, 6).alias("dup_token_frac"),
            verdict.alias("verdict"),
        ).localCheckpoint(eager=True)

    return shared_frame(
        spark, f"quality_gate:{sf_dir}", _build, data_path=sf_dir
    )


# --------------------------------------------------------------------------
# Contrastive negative sampling
# --------------------------------------------------------------------------

NEG_QUERIES = 8
NEG_K = 10


@query(
    "contrastive_negative_sampling",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, label AS q_label
      FROM embeddings WHERE vec_id < {NEG_QUERIES}
    ),
    ranked AS (
      SELECT q.query_id, c.vec_id AS neg_id,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY md5(q.query_id || '_' || c.vec_id), c.vec_id
             ) AS rk
      FROM q JOIN embeddings c ON c.label <> q.q_label
    )
    SELECT query_id, neg_id, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {NEG_K}
    """,
)
def contrastive_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive/retrieval
    training: for each query vector, {NEG_K} negatives drawn from OTHER
    label classes, ranked by md5(query_id, candidate_id) — a
    reproducible pseudo-random draw (same batch every epoch/rerun, the
    property a distributed trainer needs for resumable data loading;
    vary the epoch by folding an epoch counter into the hash).

    100 TB shape: the query side broadcasts ({NEG_QUERIES} rows), the
    candidate scan is one pass, and WindowGroupLimit caps per-query
    state at {NEG_K} rows before the exchange — identical plan shape to
    ann_bruteforce_topk with the hash replacing cosine."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < NEG_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    ranked = (
        emb.select("vec_id", "label")
        .join(F.broadcast(q), F.col("label") != F.col("q_label"))
        .select(
            "query_id",
            F.col("vec_id").alias("neg_id"),
            F.md5(F.concat_ws("_", "query_id", "vec_id")).alias("h"),
        )
        .withColumn(
            "rk",
            F.row_number()
            .over(W.partitionBy("query_id").orderBy("h", "neg_id"))
            .cast("long"),
        )
        .where(F.col("rk") <= NEG_K)
    )
    return ranked.select("query_id", "neg_id", "rk")


# --------------------------------------------------------------------------
# Conditional entropy H(lang | source)
# --------------------------------------------------------------------------


@query(
    "conditional_entropy_lang_by_source",
    oracle=f"""
    WITH cells AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY source, lang
    ),
    totals AS (
      SELECT source, SUM(c) AS ns FROM cells GROUP BY source
    ),
    terms AS (
      SELECT c.source, t.ns,
             round(-(CAST(c.c AS DOUBLE) / t.ns)
                   * ln(CAST(c.c AS DOUBLE) / t.ns), 6) AS term
      FROM cells c JOIN totals t ON c.source = t.source
    )
    SELECT source,
           CAST(ns AS BIGINT) AS n_docs,
           {sql_dsum("term")} AS lang_entropy
    FROM terms
    GROUP BY source, ns
    """,
)
def conditional_entropy_lang_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source language entropy H(lang | source=s) in nats — the
    third sibling of the chi²/KL corpus audits (chi2_lang_source tests
    independence, kl_divergence_by_lang measures drift; this scores
    each source's language MIXEDNESS, flagging single-language feeds
    masquerading as multilingual and vice versa — the signal behind
    per-source routing in a multilingual pipeline).

    100 TB shape: one (source, lang) count (map-side combinable,
    bounded by #sources x #langs), then arithmetic on that tiny frame.
    Per-term values round to 6 dp and sum via the exact decimal
    convention, so the entropy is bit-identical across engines."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    totals = cells.groupBy("source").agg(F.sum("c").alias("ns"))
    p = F.col("c").cast("double") / F.col("ns")
    terms = cells.join(totals, "source").select(
        "source", "ns", F.round(-p * F.log(p), 6).alias("term")
    )
    return terms.groupBy("source", "ns").agg(
        dsum(F.col("term")).alias("lang_entropy")
    ).select(
        "source", F.col("ns").cast("long").alias("n_docs"), "lang_entropy"
    )
