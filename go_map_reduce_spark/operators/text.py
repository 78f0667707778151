"""Text operators: the reference's application-level computations (SURVEY.md §2b).

Each of the reference's Map/Reduce plugin apps becomes one declarative
DataFrame query over the ``documents`` table; Catalyst gets the whole
plan (scan → project → explode → partial agg → shuffle → final agg), so
we get column pruning (only ``text``/``doc_id`` read from parquet) and
map-side combine — which the reference explicitly lacks (every
("word","1") pair crosses its shuffle, mr/worker.go:73).

Scale notes: groupBy on `word` is a hash-partitioned shuffle whose
cardinality is the vocabulary, not the corpus — safe at 100 TB. The
inverted index's per-word doc list (reference semantics,
mrapps/indexer.go:36-39) is inherently unbounded in the number of
documents; it is kept because it IS the reference's query, but flagged:
at pipeline scale you'd keep the (word, doc) pairs relational instead of
materializing the joined string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.functions.texttok import exploded_tokens, sql_exploded_tokens
from go_map_reduce_spark.registry import query

# Cap for the scale-safe inverted-index variant: top docs kept per word.
TOP_DOCS_PER_WORD = 10


@query(
    "wordcount",
    oracle=f"""
    SELECT word, COUNT(*) AS cnt
    FROM {sql_exploded_tokens('documents')}
    GROUP BY word
    """,
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 wc (mrapps/wc.go:21-44): tokenize on non-letter runs, count per word."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        exploded_tokens(docs.select("text"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "inverted_index",
    oracle=f"""
    SELECT word, COUNT(*) AS n_docs,
           string_agg(doc, ',' ORDER BY doc) AS docs
    FROM (
      SELECT DISTINCT CAST(doc_id AS VARCHAR) AS doc, word
      FROM {sql_exploded_tokens('documents')}
    )
    GROUP BY word
    """,
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 indexer (mrapps/indexer.go:20-39): per-word doc count + sorted doc list.

    Map-side dedup (the app's in-memory set, indexer.go:21-26) is
    ``distinct()`` on (doc, word); the reduce-side value sort
    (indexer.go:37) is ``sort_array`` — lexicographic on the stringified
    doc id, exactly like the reference's string sort.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = (
        exploded_tokens(docs.select("doc_id", "text"))
        .select(F.col("doc_id").cast("string").alias("doc"), "word")
        .distinct()
    )
    return pairs.groupBy("word").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.concat_ws(",", F.sort_array(F.collect_list("doc"))).alias("docs"),
    )


@query(
    "inverted_index_topdocs",
    oracle=f"""
    WITH tok AS (SELECT doc_id, word FROM {sql_exploded_tokens('documents')}),
         pairs AS (
           SELECT word, doc_id, COUNT(*) AS tf FROM tok GROUP BY word, doc_id
         ),
         totals AS (SELECT word, COUNT(*) AS n_docs FROM pairs GROUP BY word),
         ranked AS (
           SELECT word, doc_id,
                  row_number() OVER (
                    PARTITION BY word ORDER BY tf DESC, doc_id) AS rn
           FROM pairs
         )
    SELECT t.word, t.n_docs,
           string_agg(CAST(r.doc_id AS VARCHAR), ',' ORDER BY r.rn) AS top_docs
    FROM totals t JOIN ranked r USING (word)
    WHERE r.rn <= {TOP_DOCS_PER_WORD}
    GROUP BY t.word, t.n_docs
    """,
)
def inverted_index_topdocs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe inverted index: per word, the TOTAL doc frequency plus
    only the top-K docs by term frequency (ties by doc id).

    This is the 100 TB formulation of A2: the parity ``inverted_index``
    materializes every doc id into one row per word (the reference's own
    semantics, mrapps/indexer.go:36-39 — unbounded for a hot word like
    "the"), while here per-group state is bounded at TOP_DOCS_PER_WORD.
    The row_number ≤ K filter compiles to WindowGroupLimit, so each
    shuffle partition pre-prunes to its local top-K BEFORE the exchange
    (asserted in tests/test_plans.py) — a hot word ships K rows per map
    partition, not its full posting list."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = (
        exploded_tokens(docs.select("doc_id", "text"))
        .groupBy("word", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    totals = pairs.groupBy("word").agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("word").orderBy(F.col("tf").desc(), F.col("doc_id"))
    top = (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_DOCS_PER_WORD)
    )
    capped = top.groupBy("word").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("rn", F.col("doc_id").cast("string").alias("doc"))
                    )
                ),
                lambda s: s.doc,
            ),
        ).alias("top_docs")
    )
    return totals.join(capped, "word").select("word", "n_docs", "top_docs")


@query(
    "doc_token_counts",
    oracle=f"""
    SELECT doc_id, COUNT(*) AS n_tokens
    FROM {sql_exploded_tokens('documents')}
    GROUP BY doc_id
    """,
)
def doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 early_exit semantics (mrapps/early_exit.go:21-39): count per file.

    The reference emits one pair per file then counts; generalized here
    to tokens-per-document (same group-count shape, non-degenerate).
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        exploded_tokens(docs.select("doc_id", "text"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
    )


@query(
    "sorted_string_agg",
    oracle="""
    SELECT lang,
           COUNT(DISTINCT source) AS n_sources,
           string_agg(DISTINCT source, ' ' ORDER BY source) AS sources
    FROM documents
    GROUP BY lang
    """,
)
def sorted_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A6 crash/nocrash reduce shape (mrapps/crash.go:45-55):
    per key, values sorted then space-joined — the determinism rule the
    reference enforces inside Reduce, expressed as
    sort_array(collect_set(...)).
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count_distinct("source").alias("n_sources"),
        F.concat_ws(" ", F.sort_array(F.collect_set("source"))).alias("sources"),
    )


CHUNK_TOKENS = 20  # tokens per chunk in the UDTF chunker


@query(
    "doc_chunks_udtf",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '[^A-Za-z]+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    c AS (
      SELECT doc_id, toks,
             UNNEST(range(1, CAST(ceil(len(toks) / {CHUNK_TOKENS}.0)
                                  AS BIGINT) + 1)) AS i
      FROM t WHERE len(toks) > 0
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_idx,
           CAST(least(i * {CHUNK_TOKENS}, len(toks))
                - (i - 1) * {CHUNK_TOKENS} AS BIGINT) AS n_tokens,
           array_to_string(
             toks[(i - 1) * {CHUNK_TOKENS} + 1 : i * {CHUNK_TOKENS}],
             ' ') AS chunk_text
    FROM c
    """,
)
def doc_chunks_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking via a Python UDTF (Spark 4 user-defined TABLE
    function): each doc expands to ceil(n_tokens/{CHUNK_TOKENS}) chunk
    rows through a SQL LATERAL join — the chunking step in front of an
    embedding/RAG pipeline. Arrow-optimized (useArrow) so batches cross
    the Python boundary columnar; the UDTF runs per-partition with no
    shuffle (plan: scan → Python eval → project, mapInPandas execution
    with SQL-lateral ergonomics). The same expansion is expressible
    natively (slice + posexplode) — the UDTF spelling pins Spark's
    Python-UDTF execution against the native DuckDB oracle."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="doc_id bigint, chunk_idx int, n_tokens bigint,"
        " chunk_text string",
        useArrow=True,
    )
    class DocChunks:
        def eval(self, doc_id, text):  # noqa: ANN001 — UDTF signature
            import re

            toks = [t for t in re.split("[^A-Za-z]+", text or "") if t]
            for i in range(0, len(toks), CHUNK_TOKENS):
                yield (
                    doc_id,
                    i // CHUNK_TOKENS + 1,
                    len(toks[i : i + CHUNK_TOKENS]),
                    " ".join(toks[i : i + CHUNK_TOKENS]),
                )

    spark.udtf.register("doc_chunks", DocChunks)
    load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).createOrReplaceTempView("_docs_for_udtf")
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_idx, c.n_tokens, c.chunk_text
        FROM _docs_for_udtf d,
             LATERAL doc_chunks(d.doc_id, d.text) c
        """
    )


def _arrow_token_stats(batches):
    """pyarrow-native batch transform: token-run count and byte length
    per doc, computed entirely in Arrow compute kernels — no pandas
    conversion, no Python per-row loop. The cheapest Python tier for
    simple columnar ops."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        texts = batch.column("text")
        n_tokens = pc.cast(
            pc.count_substring_regex(texts, pattern="[A-Za-z]+"), pa.int64()
        )
        n_bytes = pc.cast(
            pc.binary_length(pc.cast(texts, pa.binary())), pa.int64()
        )
        yield pa.RecordBatch.from_arrays(
            [batch.column("doc_id"), n_tokens, n_bytes],
            names=["doc_id", "n_tokens", "n_bytes"],
        )


@query(
    "arrow_batch_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT)
             AS n_tokens,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def arrow_batch_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow surface — the fourth Python-execution tier beside
    row-Python UDF, pandas UDF, and mapInPandas: RecordBatches flow
    straight from the JVM into pyarrow compute kernels and back, no
    pandas materialization. Right when the per-batch work is itself
    vectorized columnar ops (regex counts, lengths) — measured to skip
    the Arrow→pandas→Arrow double conversion mapInPandas pays. Narrow
    stage, zero shuffle; the oracle recomputes both stats in SQL."""
    from go_map_reduce_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        _arrow_token_stats, schema="doc_id long, n_tokens long, n_bytes long"
    )


UDTF_LEAD_K = 4


@query(
    "doc_leading_tokens_udtf",
    oracle=f"""
    SELECT doc_id,
           {", ".join(f"toks[{i + 1}] AS tok_{i + 1}" for i in range(UDTF_LEAD_K))}
    FROM (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '[^A-Za-z]+'),
                         x -> x <> '') AS toks
      FROM documents
    )
    """,
)
def doc_leading_tokens_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF: the output schema (tok_1..tok_k string)
    is derived at ANALYSIS time from the constant `k` argument via the
    static `analyze()` hook — Spark 4's dynamic-schema table-function
    surface, one step past the fixed-schema UDTF (doc_chunks_udtf).
    Out-of-range positions null-fill, matching the oracle's list
    indexing. Arrow-batched; narrow stage, no shuffle."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType

    @udtf(useArrow=True)
    class LeadingTokens:
        @staticmethod
        def analyze(doc_id, text, k):
            schema = StructType().add("doc_id", "long")
            for i in range(int(k.value)):
                schema = schema.add(f"tok_{i + 1}", StringType())
            from pyspark.sql.udtf import AnalyzeResult

            return AnalyzeResult(schema=schema)

        def eval(self, doc_id, text, k):  # noqa: ANN001 — UDTF signature
            import re

            toks = [t for t in re.split("[^A-Za-z]+", text or "") if t]
            yield (
                doc_id,
                *(toks[i] if i < len(toks) else None for i in range(k)),
            )

    spark.udtf.register("leading_tokens", LeadingTokens)
    load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).createOrReplaceTempView("_docs_for_lead_udtf")
    return spark.sql(
        f"""
        SELECT t.*
        FROM _docs_for_lead_udtf d,
             LATERAL leading_tokens(d.doc_id, d.text, {UDTF_LEAD_K}) t
        """
    )
