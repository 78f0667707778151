"""Repetition / language-model quality filters for pretraining corpora.

The Gopher and C4 pipelines filter documents on repetition signals
(duplicate-token fraction, adjacent repeats, fraction of the document
covered by its most frequent n-gram) and on language-model plausibility
(mean unigram log-probability); a vocabulary-coverage curve drives
tokenizer/vocab sizing. These generalize the reference's wordcount
analytics (SURVEY.md §2b A1) into the corpus-hygiene operators a 100 TB
text pipeline runs before training.

Scale design:
- Per-document signals (distinct fraction, adjacent repeats) are pure
  per-row array expressions — zero shuffle, whole-stage codegen.
- The top-bigram signal aggregates (doc_id, bigram) — a shuffle whose
  key cardinality is bounded by corpus token count, the same cost class
  as wordcount; the per-doc max then reuses the doc_id partitioning.
- Unigram log-prob broadcasts the vocabulary frequency table (vocab ≪
  corpus — Heaps' law) and shuffles only the per-doc mean aggregation.
- Vocabulary coverage windows over the *aggregated* vocab frame (one
  row per distinct word), never over the corpus — the unpartitioned
  cumulative window is safe because its input is post-aggregation and
  orders of magnitude smaller than the data.

Determinism: counts are exact integers; log-probs are rounded per-row
to 6 dp before an exact decimal mean (functions/numeric.dsum), the same
transcendental-tail discipline as tfidf_top_terms (relational3.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.functions.numeric import dsum, sql_dsum
from go_map_reduce_spark.registry import query

TOK_SQL = "list_filter(regexp_split_to_array(text, '[^A-Za-z]+'), x -> x <> '')"


def _toks() -> F.Column:
    return F.filter(F.split("text", "[^A-Za-z]+"), lambda x: x != "")


# --------------------------------------------------------------------------
# Repetition filters (Gopher-style)
# --------------------------------------------------------------------------
@query(
    "repetition_stats",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {TOK_SQL} AS toks FROM documents
    ),
    perdoc AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
               AS dup_token_frac,
             CAST(len(list_filter(range(1, len(toks)),
                                  i -> toks[i] = toks[i+1])) AS BIGINT)
               AS adjacent_repeats
      FROM tok WHERE len(toks) >= 2
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i+1])) AS bigram
      FROM tok WHERE len(toks) >= 2
    ),
    bgc AS (
      SELECT doc_id, bigram, COUNT(*) AS n FROM bg GROUP BY doc_id, bigram
    ),
    top AS (
      SELECT doc_id, MAX(n) AS top_bigram_n FROM bgc GROUP BY doc_id
    )
    SELECT p.doc_id, p.n_tokens, p.dup_token_frac, p.adjacent_repeats,
           CAST(t.top_bigram_n AS DOUBLE) / (p.n_tokens - 1) AS top_bigram_frac
    FROM perdoc p JOIN top t ON p.doc_id = t.doc_id
    """,
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals: duplicate-token fraction,
    adjacent same-token repeats, and the share of bigram slots taken by
    the document's most frequent bigram (Gopher's "top n-gram
    fraction"). The first two are per-row array expressions; the third
    is a (doc_id, bigram) count whose per-doc max reuses the doc_id
    hash partitioning (Catalyst plans one exchange for both aggs)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = _toks()
    perdoc = (
        docs.select(
            "doc_id",
            toks.alias("toks"),
        )
        .where(F.size("toks") >= 2)
        .select(
            "doc_id",
            "toks",
            F.size("toks").cast("long").alias("n_tokens"),
            (
                1.0
                - F.size(F.array_distinct("toks")).cast("double") / F.size("toks")
            ).alias("dup_token_frac"),
            F.expr(
                "CAST(size(filter(sequence(0, size(toks)-2),"
                " i -> toks[i] = toks[i+1])) AS BIGINT)"
            ).alias("adjacent_repeats"),
        )
    )
    from go_map_reduce_spark.functions.texttok import kgrams

    bigrams = kgrams(F.col("toks"), 2)
    top = (
        perdoc.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("doc_id")
        .agg(F.max("n").alias("top_bigram_n"))
    )
    return perdoc.join(top, "doc_id").select(
        "doc_id",
        "n_tokens",
        "dup_token_frac",
        "adjacent_repeats",
        (F.col("top_bigram_n").cast("double") / (F.col("n_tokens") - 1)).alias(
            "top_bigram_frac"
        ),
    )


# --------------------------------------------------------------------------
# Unigram language-model scoring
# --------------------------------------------------------------------------
@query(
    "unigram_logprob_scores",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({TOK_SQL}) AS word FROM documents
    ),
    freq AS (SELECT word, COUNT(*) AS n_w FROM tok GROUP BY word),
    total AS (SELECT COUNT(*) AS n_total FROM tok)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           {sql_dsum('round(ln(CAST(f.n_w AS DOUBLE) / n_total), 6)')} / COUNT(*)
             AS mean_logprob
    FROM tok t JOIN freq f ON t.word = f.word CROSS JOIN total
    GROUP BY t.doc_id
    """,
)
def unigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean unigram log-probability per document — the cheap
    language-model plausibility score (CCNet/Gopher use a 5-gram LM;
    the unigram variant is the same dataflow with a smaller model).
    The corpus vocabulary with counts IS the model: built in one
    wordcount pass, broadcast back onto the token stream (vocab ≪
    corpus), so the only big shuffle is the per-doc mean. Per-token
    ln() is rounded to 6 dp, then the mean is an exact decimal sum —
    deterministic across engines and partitionings."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select("doc_id", F.explode(_toks()).alias("word"))
    freq = tok.groupBy("word").agg(F.count(F.lit(1)).alias("n_w"))
    total = tok.agg(F.count(F.lit(1)).alias("n_total"))
    logp = F.round(F.log(F.col("n_w").cast("double") / F.col("n_total")), 6)
    return (
        tok.join(F.broadcast(freq), "word")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (dsum(logp) / F.count(F.lit(1))).alias("mean_logprob"),
        )
    )


# --------------------------------------------------------------------------
# Corpus-drift measurement: per-language unigram KL divergence
# --------------------------------------------------------------------------
@query(
    "kl_divergence_by_lang",
    oracle=f"""
    WITH tok AS (
      SELECT lang, unnest({TOK_SQL}) AS word FROM documents
    ),
    lw AS (SELECT lang, word, COUNT(*) AS n_lw FROM tok GROUP BY lang, word),
    l AS (SELECT lang, SUM(n_lw) AS n_l FROM lw GROUP BY lang),
    w AS (SELECT word, SUM(n_lw) AS n_w FROM lw GROUP BY word),
    t AS (SELECT SUM(n_lw) AS n_total FROM lw),
    terms AS (
      SELECT lw.lang,
             (CAST(n_lw AS DOUBLE) / n_l)
               * round(ln((CAST(n_lw AS DOUBLE) / n_l)
                          / (CAST(n_w AS DOUBLE) / n_total)), 6) AS term
      FROM lw JOIN l ON lw.lang = l.lang
              JOIN w ON lw.word = w.word
              CROSS JOIN t
    )
    SELECT terms.lang,
           CAST(l.n_l AS BIGINT) AS n_tokens,
           {sql_dsum('term', 9)} AS kl_vs_corpus
    FROM terms JOIN l ON terms.lang = l.lang
    GROUP BY terms.lang, l.n_l
    """,
)
def kl_divergence_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift per language slice: KL(P_lang ‖ P_corpus) over
    unigram distributions — the mixture-monitoring statistic a data
    pipeline tracks when rebalancing sources. One (lang, word) count
    pass; the language totals (|langs| rows) and word totals (vocab
    rows, Heaps-bounded) re-aggregate FROM that frame — the corpus is
    tokenized exactly once. Word totals join back on word (vocab-sized
    shuffle, broadcast-eligible); per-term products are fixed-order IEEE
    with a 6 dp ln(), summed exactly at scale 9."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    tok = docs.select("lang", F.explode(_toks()).alias("word"))
    lw = tok.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("n_lw"))
    l_tot = lw.groupBy("lang").agg(F.sum("n_lw").alias("n_l"))
    w_tot = lw.groupBy("word").agg(F.sum("n_lw").alias("n_w"))
    total = lw.agg(F.sum("n_lw").alias("n_total"))
    p = F.col("n_lw").cast("double") / F.col("n_l")
    q = F.col("n_w").cast("double") / F.col("n_total")
    term = p * F.round(F.log(p / q), 6)
    return (
        lw.join(F.broadcast(l_tot), "lang")
        .join(F.broadcast(w_tot), "word")
        .crossJoin(F.broadcast(total))
        .groupBy("lang")
        .agg(
            F.max("n_l").cast("long").alias("n_tokens"),
            dsum(term, 9).alias("kl_vs_corpus"),
        )
    )


# --------------------------------------------------------------------------
# Vocabulary coverage curve
# --------------------------------------------------------------------------
TOP_VOCAB = 50


@query(
    "vocab_coverage",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({TOK_SQL}) AS word FROM documents
    ),
    freq AS (SELECT word, COUNT(*) AS n FROM tok GROUP BY word),
    total AS (SELECT SUM(n) AS n_total FROM freq)
    SELECT word, n AS n_occurrences,
           CAST(rank AS BIGINT) AS rank,
           CAST(cum AS DOUBLE) / n_total AS coverage
    FROM (
      SELECT word, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, word) AS rank,
             SUM(n) OVER (ORDER BY n DESC, word
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM freq
    ) r CROSS JOIN total
    WHERE rank <= {TOP_VOCAB}
    """,
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-coverage curve of the top-{TOP_VOCAB} vocabulary: what
    fraction of all corpus tokens the k most frequent words cover —
    the tokenizer/vocab-sizing diagnostic. The unpartitioned cumulative
    window runs over the POST-AGGREGATION vocab frame (one row per
    distinct word), never the corpus; coverage is an exact integer
    cumsum divided once per row."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    tok = docs.select(F.explode(_toks()).alias("word"))
    freq = tok.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    total = freq.agg(F.sum("n").alias("n_total"))
    w = W.orderBy(F.col("n").desc(), F.col("word"))
    ranked = freq.select(
        "word",
        "n",
        F.row_number().over(w).alias("rank"),
        F.sum("n").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).alias(
            "cum"
        ),
    ).where(F.col("rank") <= TOP_VOCAB)
    return ranked.crossJoin(F.broadcast(total)).select(
        "word",
        F.col("n").alias("n_occurrences"),
        F.col("rank").cast("long").alias("rank"),
        (F.col("cum").cast("double") / F.col("n_total")).alias("coverage"),
    )


# --------------------------------------------------------------------------
# Bigram (conditional) language-model scoring
# --------------------------------------------------------------------------

BIGRAM_ADD_K = 0.5  # add-k smoothing mass per (context, word) cell


@query(
    "bigram_logprob_scores",
    oracle=f"""
    WITH ta AS (SELECT doc_id, {TOK_SQL} AS toks FROM documents),
    bg AS (
      SELECT doc_id, toks[i] AS prev, toks[i + 1] AS w
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM ta)
    ),
    big AS (SELECT prev, w, COUNT(*) AS c FROM bg GROUP BY prev, w),
    ctx AS (SELECT prev, COUNT(*) AS n_ctx FROM bg GROUP BY prev),
    vocab AS (
      SELECT COUNT(DISTINCT word) AS v
      FROM (SELECT unnest(toks) AS word FROM ta)
    )
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           {sql_dsum(f'''round(ln((CAST(g.c AS DOUBLE) + {BIGRAM_ADD_K})
                     / (CAST(x.n_ctx AS DOUBLE) + {BIGRAM_ADD_K} * v)), 6)''')}
             / COUNT(*) AS mean_logprob
    FROM bg b
    JOIN big g ON g.prev = b.prev AND g.w = b.w
    JOIN ctx x ON x.prev = b.prev
    CROSS JOIN vocab
    GROUP BY b.doc_id
    """,
)
def bigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean CONDITIONAL log-probability per document under an add-k
    smoothed bigram LM trained on the corpus itself — the next step up
    from `unigram_logprob_scores` toward the 5-gram KenLM scoring that
    CCNet/Gopher run: P(w | prev) = (C(prev,w) + k) / (C(prev) + k·V),
    so the score now reacts to word ORDER (a shuffled document keeps
    its unigram score but collapses here), which is exactly what the
    plausibility filter is for.

    Dataflow: one explode pass emits (doc_id, prev, w) via two shifted
    array slices (per-row, no self-join); the bigram and context count
    tables aggregate off that same frame and join back broadcast
    (model ≪ corpus — at vocabulary scales where the bigram table
    outgrows broadcast, the same plan hash-joins on (prev, w) with the
    token stream already partitioned by prev from the context join).
    Smoothing constants: V is the corpus vocabulary size (1-row
    broadcast); k = {BIGRAM_ADD_K}. Per-bigram ln() rounds to 6 dp
    before an exact decimal mean — the module's standard
    transcendental-tail discipline, bit-identical to the DuckDB twin.
    Docs with fewer than two tokens contribute no row (no bigrams —
    same convention as the oracle's inner join)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ta = docs.select("doc_id", _toks().alias("toks"))
    n = F.size("toks")
    bg = ta.where(n >= 2).select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("toks", 1, n - 1).alias("prev"),
                F.slice("toks", 2, n - 1).alias("w"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.prev").alias("prev"), F.col("p.w").alias("w"))
    big = bg.groupBy("prev", "w").agg(F.count(F.lit(1)).alias("c"))
    ctx = bg.groupBy("prev").agg(F.count(F.lit(1)).alias("n_ctx"))
    vocab = ta.select(F.explode("toks").alias("word")).agg(
        F.count_distinct("word").alias("v")
    )
    logp = F.round(
        F.log(
            (F.col("c").cast("double") + F.lit(BIGRAM_ADD_K))
            / (F.col("n_ctx").cast("double") + F.lit(BIGRAM_ADD_K) * F.col("v"))
        ),
        6,
    )
    return (
        bg.join(F.broadcast(big), ["prev", "w"])
        .join(F.broadcast(ctx), "prev")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (dsum(logp) / F.count(F.lit(1))).alias("mean_logprob"),
        )
    )
