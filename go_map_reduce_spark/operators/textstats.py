"""Text-analysis operators for training-data pipelines: quality scoring,
language-ID heuristic, token counting, document fingerprinting.

These generalize the reference's text processing (its only analytics are
token-count shapes, SURVEY.md §2b) to the operations an LLM-data
pipeline runs at scale. All per-document computation is native Spark
expressions (regexp/array/hash functions — JVM codegen, no Python), so
the work is embarrassingly parallel over document partitions; nothing
here shuffles except the final tiny aggregations.

Determinism: every float here is a per-row IEEE operation (ratios of
counts) — bit-identical across engines; no float aggregation at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.registry import query

# Shared vocab-derived marker sets for the language-ID heuristic.
# (Synthetic corpus: real deployments plug in per-language stopword
# lists; the heuristic's *shape* — marker hit-rate argmax — is what the
# operator provides.)
LANG_MARKERS = {
    "en": ("the", "fast", "slow"),
    "de": ("data", "group", "window"),
    "es": ("query", "row", "table"),
}

STOPWORDS = ("the", "a", "of", "and")

# BPE-ish pretokenizer: letter runs, digit runs, single other non-space.
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _toks(col: Column) -> Column:
    return F.filter(F.split(col, r"\s+"), lambda x: x != "")


def _sql_toks(expr: str) -> str:
    return rf"list_filter(regexp_split_to_array({expr}, '\s+'), x -> x <> '')"


@query(
    "text_quality_scores",
    oracle=f"""
    SELECT doc_id,
           n_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT)
             AS n_letters,
           CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
             / len(toks) AS avg_token_len,
           CAST(len(list_filter(toks, x -> x IN {STOPWORDS!r})) AS DOUBLE)
             / len(toks) AS stopword_ratio,
           CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))
                AS DOUBLE) / length(text) AS punct_ratio
    FROM (SELECT doc_id, text, n_chars, {_sql_toks('text')} AS toks FROM documents)
    WHERE len(toks) > 0
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, token, stopword and punctuation signals
    per document — the filter inputs of a pretraining data pipeline.
    Pure per-row expressions; ratios are single IEEE divisions."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _toks(F.col("text"))
    letters = F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
    nonpunct = F.length(F.regexp_replace("text", "[^A-Za-z0-9 ]", ""))
    return (
        docs.select(
            "doc_id",
            "n_chars",
            "text",
            F.size(toks).cast("long").alias("n_tokens"),
            letters.cast("long").alias("n_letters"),
            (letters.cast("double") / F.size(toks)).alias("avg_token_len"),
            (
                F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double")
                / F.size(toks)
            ).alias("stopword_ratio"),
            (
                (F.length("text") - nonpunct).cast("double") / F.length("text")
            ).alias("punct_ratio"),
        )
        .where(F.col("n_tokens") > 0)
        .drop("text")
    )


def _marker_score_sql(markers: tuple[str, ...]) -> str:
    return f"len(list_filter(toks, x -> x IN {markers!r}))"


@query(
    "language_id",
    oracle=f"""
    SELECT doc_id, lang AS labeled_lang,
           CASE
             WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
             WHEN s_de >= s_es THEN 'de'
             ELSE 'es'
           END AS predicted_lang,
           CAST(s_en AS BIGINT) AS s_en,
           CAST(s_de AS BIGINT) AS s_de,
           CAST(s_es AS BIGINT) AS s_es
    FROM (
      SELECT doc_id, lang,
             {_marker_score_sql(LANG_MARKERS['en'])} AS s_en,
             {_marker_score_sql(LANG_MARKERS['de'])} AS s_de,
             {_marker_score_sql(LANG_MARKERS['es'])} AS s_es
      FROM (SELECT doc_id, lang, {_sql_toks('text')} AS toks FROM documents)
    )
    """,
)
def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: marker-token hit counts per language
    profile, argmax with a fixed preference order (en > de > es on ties)
    so the prediction is deterministic. Real deployments swap in
    character-n-gram profiles; the operator shape (per-row scoring +
    argmax, zero shuffles) is identical."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _toks(F.col("text"))
    scored = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[
            F.size(F.filter(toks, lambda x: x.isin(*m))).cast("long").alias(f"s_{k}")
            for k, m in LANG_MARKERS.items()
        ],
    )
    return scored.select(
        "doc_id",
        "labeled_lang",
        F.when(
            (F.col("s_en") >= F.col("s_de")) & (F.col("s_en") >= F.col("s_es")), "en"
        )
        .when(F.col("s_de") >= F.col("s_es"), "de")
        .otherwise("es")
        .alias("predicted_lang"),
        "s_en",
        "s_de",
        "s_es",
    )


@query(
    "token_counts_bpe",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_sql_toks('text')}) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
)
def token_counts_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish
    pretokenizer regex (letter runs / digit runs / single punctuation) —
    the cost estimator of a training pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(_toks(F.col("text"))).cast("long").alias("n_ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(text, '{BPE_RE}', 0)"))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


@query(
    "token_array_functions",
    oracle=r"""
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_toks,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           CAST(list_contains(toks, 'the') AS BOOLEAN) AS has_the,
           array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3,
           array_to_string(list_reverse_sort(list_distinct(toks))[1:2], ',') AS last2,
           toks[1] AS first_tok,
           toks[-1] AS last_tok
    FROM (SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '[^A-Za-z]+'), x -> x <> '')
                   AS toks
          FROM documents)
    WHERE len(toks) > 0
    """,
)
def token_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface (SURVEY.md §2c scalar fns row): size,
    distinct, membership, sort/slice, element access — all Catalyst
    higher-order/array expressions over the token array; list outputs
    serialized to strings so results are engine-representation-neutral."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", "[^A-Za-z]+"), lambda x: x != "")
    t = docs.select("doc_id", toks.alias("toks")).where(F.size("toks") > 0)
    dis = F.array_distinct("toks")
    return t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_toks"),
        F.size(dis).cast("long").alias("n_distinct"),
        F.array_contains("toks", "the").alias("has_the"),
        F.concat_ws(",", F.slice(F.array_sort(dis), 1, 3)).alias("first3"),
        F.concat_ws(",", F.slice(F.sort_array(dis, asc=False), 1, 2)).alias("last2"),
        F.element_at("toks", 1).alias("first_tok"),
        F.element_at("toks", -1).alias("last_tok"),
    )


@query(
    "doc_fingerprints",
    oracle=rf"""
    SELECT doc_id,
           md5(text) AS content_hash,
           (SELECT min(md5(s)) FROM unnest(shingles) AS t(s)) AS winnow_fp
    FROM (
      SELECT doc_id, text,
             CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(range(1, len(toks) - 3),
                                      i -> array_to_string(toks[i:i+4], ' '))
             END AS shingles
      FROM (SELECT doc_id, text, {_sql_toks('text')} AS toks FROM documents)
    )
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: full-content hash + a winnowing-style
    shingle fingerprint (min hash over 5-token shingles — the rolling-
    hash-min idea with md5 as the portable hash). Used downstream as the
    exact-dedup key and as a stable doc identity across recrawls."""
    from go_map_reduce_spark.functions.texttok import kgrams

    docs = load_table(spark, sf_dir, "documents")
    tk = F.col("__toks")
    shingles = F.when(
        F.size(tk) < 5, F.array(F.concat_ws(" ", tk))
    ).otherwise(kgrams(tk, 5))
    return docs.select(
        "doc_id", "text", _toks(F.col("text")).alias("__toks")
    ).select(
        "doc_id",
        F.md5("text").alias("content_hash"),
        F.array_min(F.transform(shingles, F.md5)).alias("winnow_fp"),
    )


@query(
    "bigram_stats",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '[^A-Za-z]+'), x -> x <> '')
               AS toks
      FROM documents
    ),
    bg AS (
      SELECT unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i+1])) AS bigram
      FROM tok WHERE len(toks) >= 2
    ),
    counts AS (
      SELECT split_part(bigram, ' ', 1) AS w1, split_part(bigram, ' ', 2) AS w2,
             COUNT(*) AS n
      FROM bg GROUP BY 1, 2
    ),
    firsts AS (SELECT w1, SUM(n) AS n1 FROM counts GROUP BY w1)
    SELECT c.w1, c.w2, c.n, CAST(c.n AS DOUBLE) / f.n1 AS p_next
    FROM counts c JOIN firsts f ON c.w1 = f.w1
    WHERE c.n >= 5
    """,
)
def bigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language statistics: counts and conditional next-word
    probability P(w2|w1) = c(w1 w2)/Σc(w1 ·) — exact integer ratio.
    The n-gram model shape behind language-ID and quality scoring at
    corpus scale; one explode + two cascading aggregations."""
    from go_map_reduce_spark.catalog import ensure_min_parallelism

    docs = ensure_min_parallelism(
        spark, load_table(spark, sf_dir, "documents").select("text")
    )
    from go_map_reduce_spark.functions.texttok import kgrams

    toks = F.filter(F.split("text", "[^A-Za-z]+"), lambda x: x != "")
    bg = (
        docs.select(toks.alias("__toks"))
        .where(F.size("__toks") >= 2)
        .select(F.explode(kgrams(F.col("__toks"), 2)).alias("bigram"))
        .select(
            F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)).alias("w2"),
        )
    )
    counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    firsts = counts.groupBy("w1").agg(F.sum("n").alias("n1"))
    return (
        counts.join(firsts, "w1")
        .where(F.col("n") >= 5)
        .select("w1", "w2", "n", (F.col("n").cast("double") / F.col("n1")).alias("p_next"))
    )


# Portable redaction patterns (valid in both Java regex and RE2): no
# backrefs, no lookaround — the subset that runs identically everywhere.
EMAIL_RE = "[A-Za-z0-9]+@[A-Za-z]+[.][A-Za-z]+"
PHONE_RE = "[0-9]{3}-[0-9]{4}"


@query(
    "pii_redaction",
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                              '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5,
           CAST(length(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                                      '{PHONE_RE}', '<PHONE>', 'g'))
                AS BIGINT) AS redacted_len
    FROM seeded
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the compliance pass of a training-data pipeline:
    count and replace email/phone patterns per document. The synthetic
    corpus has no organic PII, so the query deterministically seeds each
    doc with a doc_id-derived email + phone first (both engines build
    the identical string), then redacts; the oracle pins match counts
    AND the exact redacted output (via md5). Patterns restricted to the
    Java-regex ∩ RE2 subset so engines agree; pure per-row regexp work,
    embarrassingly parallel, no shuffle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace("text", F.lit(EMAIL_RE), F.lit("<EMAIL>")),
        F.lit(PHONE_RE),
        F.lit("<PHONE>"),
    )
    return seeded.select(
        "doc_id",
        F.regexp_count("text", F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count("text", F.lit(PHONE_RE)).alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
        F.length(redacted).cast("long").alias("redacted_len"),
    )


@query(
    "training_corpus_selection",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, text, {_sql_toks('text')} AS toks FROM documents
    ),
    scored AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(toks, x -> x IN {STOPWORDS!r})) AS DOUBLE)
               / len(toks) AS stopword_ratio,
             min(doc_id) OVER (PARTITION BY md5(text)) AS keep_doc_id
      FROM toks
    )
    SELECT doc_id, n_tokens, stopword_ratio
    FROM scored
    WHERE doc_id = keep_doc_id            -- exact-dedup survivor
      AND n_tokens BETWEEN 10 AND 10000   -- length gate
      AND stopword_ratio <= 0.5           -- quality gate
    """,
)
def training_corpus_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end data-diet composition: exact-dedup survivorship
    (keep min doc_id per content hash) ∩ length gate ∩ quality gate
    (stopword ratio) — the final SELECT of a training pipeline, built
    from the same primitives the standalone queries expose. One window
    over md5(text) (dedup) + per-row scoring; a single shuffle on the
    16-byte content hash, never on document bodies."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = _toks(F.col("text"))
    w = Window.partitionBy(F.md5("text"))
    scored = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        (
            F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double")
            / F.size(toks)
        ).alias("stopword_ratio"),
        F.min("doc_id").over(w).alias("keep_doc_id"),
    )
    return scored.where(
        (F.col("doc_id") == F.col("keep_doc_id"))
        & F.col("n_tokens").between(10, 10000)
        & (F.col("stopword_ratio") <= 0.5)
    ).select("doc_id", "n_tokens", "stopword_ratio")


PACK_BUDGET = 512   # tokens per training sequence
PACK_SHARD = 100    # docs per packing shard (keys doc_id DIV 100)


@query(
    "sequence_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, CAST(len({_sql_toks('text')}) AS BIGINT) AS n_tokens
      FROM documents
    ),
    cum AS (
      SELECT doc_id, n_tokens, doc_id // {PACK_SHARD} AS shard,
             SUM(n_tokens) OVER (PARTITION BY doc_id // {PACK_SHARD}
                                 ORDER BY doc_id) - n_tokens AS start_off
      FROM toks
    )
    SELECT doc_id, n_tokens, shard,
           CAST(shard * 1000000 + start_off // {PACK_BUDGET} AS BIGINT) AS seq_id,
           CAST(start_off % {PACK_BUDGET} AS BIGINT) AS off_in_seq
    FROM cum
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing — the concat-and-chunk layout step
    before LLM training: documents are concatenated in deterministic
    doc_id order and cut into {PACK_BUDGET}-token sequences; each doc
    reports the sequence it starts in and its offset inside it.

    Packing is SHARD-LOCAL ({PACK_SHARD} docs per shard): the running
    token offset is a window partitioned by shard, so the cumsum is a
    per-shard sort — never the single-partition global-ORDER-BY window
    that would serialize the corpus through one task. Sequence ids
    namespace by shard (shard × 1e6 + local chunk), exactly how a
    1000-executor packing job shards its output. All-integer
    arithmetic — bit-stable across engines."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.size(_toks(F.col("text"))).cast("long").alias("n_tokens")
    )
    shard = (F.col("doc_id") / PACK_SHARD).cast("long")
    w = Window.partitionBy("shard").orderBy("doc_id")
    cum = toks.select(
        "doc_id", "n_tokens", shard.alias("shard")
    ).withColumn("start_off", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return cum.select(
        "doc_id",
        "n_tokens",
        "shard",
        (F.col("shard") * 1_000_000
         + (F.col("start_off") / PACK_BUDGET).cast("long")).alias("seq_id"),
        (F.col("start_off") % PACK_BUDGET).alias("off_in_seq"),
    )


# Target sampling rate per language domain — the "data diet" mix. Rates
# are exact per-domain fractions of that domain's doc count.
MIX_RATES = {"en": 0.5, "zh": 0.3, "fr": 0.2, "es": 0.2, "de": 0.1}
MIX_DEFAULT_RATE = 0.1

_MIX_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in MIX_RATES.items())
    + f" ELSE {MIX_DEFAULT_RATE} END"
)


@query(
    "domain_mix_sampling",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rk,
             COUNT(*) OVER (PARTITION BY lang) AS n_lang
      FROM documents
    )
    SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
    FROM ranked
    WHERE rk <= CEIL(({_MIX_CASE}) * n_lang)
    """,
)
def domain_mix_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix (data-diet) sampling: each language domain is
    downsampled to its target rate by keeping the first
    ceil(rate × |domain|) docs in md5(doc_id) order — a deterministic,
    retry-stable permutation, so the sample is reproducible across
    runs, engines, AND scale-factor-independent of partitioning
    (the same property as deterministic_sample_orders, but with
    per-domain quotas — how a training pipeline reweighs sources).

    One window per domain (hash shuffle on lang); at 100 TB the skew
    concern is a mega-domain (one lang = 90% of docs) — the md5 order
    lets the window be replaced by a pure filter on the hash value
    (md5 < rate-quantile threshold), which needs no sort at all; the
    window form is kept here because it makes the quota exact rather
    than expected."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    w_rank = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    w_n = Window.partitionBy("lang")
    rate = F.coalesce(
        *[
            F.when(F.col("lang") == k, F.lit(v)).otherwise(F.lit(None))
            for k, v in MIX_RATES.items()
        ],
        F.lit(MIX_DEFAULT_RATE),
    )
    ranked = docs.select(
        "doc_id",
        "lang",
        F.row_number().over(w_rank).cast("long").alias("rk"),
        F.count(F.lit(1)).over(w_n).alias("n_lang"),
        rate.alias("rate"),
    )
    return ranked.where(
        F.col("rk") <= F.ceil(F.col("rate") * F.col("n_lang"))
    ).select("doc_id", "lang", "rk")
