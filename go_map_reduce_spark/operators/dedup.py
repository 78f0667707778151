"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup — the dedup stack of a training-data pipeline.

Pipeline shape (the scale rationale):

1. cheap per-doc signatures computed in one scan (no shuffle):
   content hash / minhash sketch / simhash bits / LSH bucket;
2. candidate generation by *equality* on signature pieces (band keys,
   simhash buckets, sign buckets) — a hash-shuffle join whose cost is
   the number of colliding docs, not O(n²) over the corpus;
3. exact verification (shingle Jaccard, embedding cosine) only on the
   candidate pairs.

At 100 TB the only all-data operations are scans and hash shuffles on
signature keys; pairwise work is confined to candidate buckets. Skewed
buckets (a boilerplate shingle shared by millions of docs) are the known
failure mode — AQE skew-join splitting plus a bucket-size cap (documented
on minhash_near_dup_pairs) handle it.

The MinHash construction (hash each shingle with H seeded functions,
keep per-seed minima, band into B groups of R rows) follows the standard
public LSH literature; hashes are md5 so the DuckDB oracle can compute
byte-identical signatures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from go_map_reduce_spark.catalog import ensure_min_parallelism, load_table
from go_map_reduce_spark.functions.vector import cosine, norm_sq, sql_cosine, sql_dot
from go_map_reduce_spark.registry import query, track_cache

# MinHash/LSH configuration: H = B × R signatures; bands of R rows catch
# pairs with Jaccard ≳ (1/B)^(1/R) ≈ 0.63 with high probability.
N_HASHES = 12
BANDS = 4
R = 3
SHINGLE_K = 3
JACCARD_THRESHOLD = 0.5
# Degenerate-bucket guard: LSH buckets with more members than this are
# routed out of the pairwise verify join (quadratic in bucket size) and
# surfaced as template clusters instead. 64 members ≈ 2k pairs/bucket —
# cheap; a boilerplate bucket of 10⁶ docs would otherwise be 5·10¹¹ pairs.
LSH_BUCKET_CAP = 64

# Seeded hash family: ONE md5 per shingle parsed to a 28-bit int, then H
# affine permutations h_j = (a_j·h + b_j) mod P — 11 fewer digest
# computations per shingle than seeding md5 itself, pure int64 ops that
# both engines evaluate identically (no overflow: a < 2^32, h < 2^28, so
# a·h + b < 2^60 < int64 max).
MINHASH_P = 4_294_967_291  # largest prime < 2^32
MINHASH_SEEDS = [
    (2_654_435_761, 0x9E37),
    (2_246_822_519, 0x85EB),
    (3_266_489_917, 0xC2B2),
    (668_265_263, 0x27D4),
    (374_761_393, 0x1656),
    (2_654_435_789, 0x7FEB),
    (2_246_822_579, 0x9E37_1),
    (3_266_489_909, 0x85EB_1),
    (668_265_341, 0xC2B2_1),
    (374_761_471, 0x27D4_1),
    (2_654_436_023, 0x1656_1),
    (2_246_822_861, 0x7FEB_1),
]
assert len(MINHASH_SEEDS) == N_HASHES

EMB_DIMS = 64
SIGN_BUCKET_DIMS = 8
COSINE_THRESHOLD = 0.4  # synthetic embeddings are near-orthogonal (max ≈ .51)

_SQL_TOKS = "list_filter(regexp_split_to_array(text, '[^A-Za-z]+'), x -> x <> '')"

# Distinct (doc_id, shingle) pairs — shingle = K consecutive tokens.
# Dedup happens INSIDE the row (list_distinct / array_distinct) before
# unnesting: per-row work, no distinct shuffle over the exploded set.
_SQL_SHINGLES = f"""
  SELECT doc_id,
         unnest(list_distinct(
           CASE WHEN len(toks) < {SHINGLE_K}
                THEN [array_to_string(toks, ' ')]
                ELSE list_transform(range(1, len(toks) - {SHINGLE_K - 2}),
                                    i -> array_to_string(toks[i:i+{SHINGLE_K - 1}], ' '))
           END)) AS shingle
  FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
"""

# 28-bit base hash of a shingle (identical in Spark via conv(...,16,10)).
_SQL_BASE_HASH = "CAST(concat('0x', substr(md5(shingle), 1, 7)) AS BIGINT)"

_SQL_SIGS = (
    "SELECT doc_id, "
    + ", ".join(
        f"min(({a} * h + {b}) % {MINHASH_P}) AS mh{j}"
        for j, (a, b) in enumerate(MINHASH_SEEDS)
    )
    + f" FROM (SELECT doc_id, {_SQL_BASE_HASH} AS h FROM sh) GROUP BY doc_id"
)

_SQL_BANDS = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, "
    f"concat_ws(',', {', '.join(f'mh{b * R + r}' for r in range(R))}) AS bkey FROM sigs"
    for b in range(BANDS)
)


def _doc_shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shset): each doc's DISTINCT shingle set as a per-row
    array — the common currency of the dedup pipelines. Built entirely
    with narrow per-row array ops: no explode, no shuffle."""
    docs = ensure_min_parallelism(
        spark, load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return _docsets_from_docs(docs)


def _docsets_from_docs(docs: DataFrame) -> DataFrame:
    """Shingle-set pipeline over any (doc_id, text) frame (synthetic
    corpora in tests use this directly).

    The K-gram build is a zip_with fold over K shifted views of the
    token array — K slices + (K-1) element-wise concats, linear per
    row. The obvious `transform(sequence(0, n-K), i -> concat_ws(' ',
    slice(toks, i+1, K)))` is quadratic (one array copy per position,
    interpreted lambda per index) — measured 7.2 s vs 0.8 s for the
    sf0.1 corpus on one core. Tokenization is projected first so the
    regex split isn't re-evaluated per reference."""
    from go_map_reduce_spark.functions.texttok import kgrams

    toks = F.filter(F.split("text", "[^A-Za-z]+"), lambda x: x != "")
    tk = F.col("__toks")
    shingles = F.when(
        F.size(tk) < SHINGLE_K, F.array(F.concat_ws(" ", tk))
    ).otherwise(kgrams(tk, SHINGLE_K))
    return docs.select("doc_id", toks.alias("__toks")).select(
        "doc_id", F.array_distinct(shingles).alias("shset")
    )


def _spark_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, shingle), exploded — for consumers that
    genuinely need the relational form (the PPJoin prefix filter's
    global df computation); already unique per row, so no distinct
    shuffle."""
    return _doc_shingle_sets(spark, sf_dir).select(
        "doc_id", F.explode("shset").alias("shingle")
    )


def _shingles_from_docs(docs: DataFrame) -> DataFrame:
    return _docsets_from_docs(docs).select(
        "doc_id", F.explode("shset").alias("shingle")
    )


def _spark_signatures(docsets: DataFrame) -> DataFrame:
    """One md5 per shingle → H affine permutations → per-doc minima,
    computed PER ROW over the shingle-set array (array_min ∘ transform):
    a narrow stage with ZERO shuffle — the groupBy(doc_id) formulation
    would shuffle one row per (doc, shingle) just to re-group what the
    row already holds. Input: (doc_id, shset) from _doc_shingle_sets."""
    # hs materialized as its own projection so the md5 pass runs once per
    # row, not once per seed (the H affine mins then scan the small int
    # array H times — pure arithmetic).
    hashed = docsets.select(
        "doc_id",
        F.transform(
            "shset",
            lambda s: F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("long"),
        ).alias("hs"),
    )
    return hashed.select(
        "doc_id",
        *[
            F.array_min(
                F.transform("hs", lambda x: (F.lit(a) * x + F.lit(b)) % MINHASH_P)
            ).alias(f"mh{j}")
            for j, (a, b) in enumerate(MINHASH_SEEDS)
        ],
    )


def _spark_bands(sigs: DataFrame) -> DataFrame:
    # persist = materialization barrier: every band key references R mh
    # columns, and Catalyst's projection collapse would otherwise inline
    # the per-row md5/array_min pipeline into EVERY reference (B×R
    # re-evaluations per row — measured 10× slowdown). The signature
    # frame is H×8 bytes/doc, the cheapest thing in the pipeline to hold.
    sigs = sigs.persist().transform(track_cache)
    band_keys = F.array(
        *[
            F.concat_ws(",", *[F.col(f"mh{b * R + r}") for r in range(R)])
            for b in range(BANDS)
        ]
    )
    return sigs.select(
        "doc_id", F.posexplode(band_keys).alias("band", "bkey")
    )


# --------------------------------------------------------------------------
@query(
    "dedup_exact_summary",
    oracle="""
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS n_distinct,
           COUNT(*) - COUNT(DISTINCT md5(text)) AS n_duplicate_docs
    FROM documents
    """,
)
def dedup_exact_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup, corpus-level accounting: total vs distinct content
    hashes. Hash-groupBy on md5(text) — the 100 TB formulation shuffles
    16-byte digests, never document bodies."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(F.md5("text")).alias("n_distinct"),
        (F.count(F.lit(1)) - F.count_distinct(F.md5("text"))).alias(
            "n_duplicate_docs"
        ),
    )


@query(
    "dedup_exact_survivors",
    oracle="""
    SELECT md5(text) AS content_hash,
           min(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup, keep-first policy: one survivor (min doc_id) per
    content hash. The survivor set is the deduped corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@query(
    "minhash_signatures",
    oracle=f"WITH sh AS ({_SQL_SHINGLES}) {_SQL_SIGS}",
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash sketch: H seeded-md5 minima over the doc's
    3-token shingle set, computed per row (array_min over the shingle
    array) — ONE narrow scan, zero shuffles; the signature table is
    H×32 bytes/doc regardless of doc size."""
    return _spark_signatures(_doc_shingle_sets(spark, sf_dir))


@query(
    "minhash_near_dup_pairs",
    oracle=f"""
    WITH sh AS ({_SQL_SHINGLES}),
         sigs AS ({_SQL_SIGS}),
         bands AS ({_SQL_BANDS}),
         pairs AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
         ),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         inter AS (
           SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter
           FROM pairs p
           JOIN sh sa ON sa.doc_id = p.doc_a
           JOIN sh sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
           GROUP BY p.doc_a, p.doc_b
         )
    SELECT i.doc_a, i.doc_b,
           CAST(i.n_inter AS DOUBLE) / (na.n + nb.n - i.n_inter) AS jaccard
    FROM inter i
    JOIN sizes na ON na.doc_id = i.doc_a
    JOIN sizes nb ON nb.doc_id = i.doc_b
    WHERE CAST(i.n_inter AS DOUBLE) / (na.n + nb.n - i.n_inter)
          >= {JACCARD_THRESHOLD}
    """,
)
def minhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs: MinHash-LSH banding for candidates, exact shingle
    Jaccard for verification, threshold 0.5.

    Scale behavior: signatures and band keys are per-row computations —
    the ONLY shuffles in the whole pipeline are the band self-join
    (collision-bucket sized, not corpus²) and the two candidate joins of
    the verify stage (candidate-set sized). The degenerate-bucket hazard
    (a boilerplate band key shared by a huge doc cluster makes one
    bucket quadratic) is guarded by LSH_BUCKET_CAP: buckets with more
    members never enter the pairwise join and are surfaced separately as
    template clusters (``lsh_template_clusters``). At the driver SFs no
    bucket comes near the cap, so the capped result equals the uncapped
    oracle; the cap's behavior under a degenerate corpus is pinned in
    tests/test_dedup.py.
    """
    # r15: the VERIFIED pair frame is memoized via registry.shared_frame.
    # Eight registered call sites compose on it (the cluster contraction,
    # the cross-modal union graph, the leakage audit, the recall eval,
    # keep-best, DSIR, the survivors queries) and each used to re-run
    # the whole shingle→signature→band→verify pipeline — at 100 TB the
    # near-dup pair list materializes ONCE per corpus version and every
    # downstream stage reads it.  Build billed to the first consumer
    # (memo-aware bench reps); the frame is pair-list sized, far below
    # corpus size.
    from go_map_reduce_spark.registry import shared_frame

    def _build() -> DataFrame:
        # The shingle-set frame feeds three consumers inside the build
        # (band pipeline + both sides of the verify join); Spark does
        # not share common subplans across joins, so persist it once —
        # one row per doc (arrays), far smaller than the exploded
        # (doc, shingle) form.
        docsets = (
            _doc_shingle_sets(spark, sf_dir).persist().transform(track_cache)
        )
        return _near_dup_pairs_from_docsets(docsets).localCheckpoint(
            eager=True
        )

    return shared_frame(
        spark, f"minhash_pairs:{sf_dir}", _build, data_path=sf_dir
    )


def _near_dup_pairs_from_docsets(docsets: DataFrame, cap: int = None) -> DataFrame:
    """LSH candidate generation (bucket-capped) + exact-Jaccard verify
    over a (doc_id, shset) frame. ``cap`` defaults to LSH_BUCKET_CAP."""
    cap = LSH_BUCKET_CAP if cap is None else cap
    bands = _spark_bands(_spark_signatures(docsets))
    # Degenerate-bucket cap: count bucket membership with a window over
    # the same (band, bkey) partitioning the self-join shuffles on, then
    # keep only sub-cap buckets for pairwise work. (The self-join's two
    # sides are identical subplans — AQE reuses the exchange, so the
    # band pipeline executes once.)
    bsz = F.count(F.lit(1)).over(Window.partitionBy("band", "bkey"))
    small = bands.withColumn("bsz", bsz).where(F.col("bsz") <= cap).drop("bsz")
    a, b = small.alias("a"), small.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return _verify_jaccard(docsets, pairs)


def _verify_jaccard(docsets: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate pairs, computed per pair with
    array_intersect over the two docs' shingle-set arrays — no exploded
    (doc, shingle) join, no re-aggregation. The only data movement is
    joining the (tiny, broadcastable) pair list against the docset
    table twice; the intersection itself is a narrow per-row op, so the
    verify stage is O(candidate pairs × doc size), independent of
    corpus size."""
    sa = docsets.select(
        F.col("doc_id").alias("doc_a"), F.col("shset").alias("sha")
    )
    sb = docsets.select(
        F.col("doc_id").alias("doc_b"), F.col("shset").alias("shb")
    )
    joined = pairs.join(sa, "doc_a").join(sb, "doc_b")
    n_inter = F.size(F.array_intersect("sha", "shb"))
    jac = n_inter.cast("double") / (
        F.size("sha") + F.size("shb") - n_inter
    )
    return (
        joined.select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def _template_clusters_from_docsets(docsets: DataFrame, cap: int = None) -> DataFrame:
    """Over-cap LSH buckets as template clusters: every member of a
    bucket larger than the cap shares a full minhash band — at that size
    they are near-identical boilerplate (licence headers, templated
    pages), so the right dedup move is keep-one-per-bucket, not O(k²)
    pairwise verification. Emits (band, bkey, n_docs, keep_doc_id)."""
    cap = LSH_BUCKET_CAP if cap is None else cap
    bands = _spark_bands(_spark_signatures(docsets))
    return (
        bands.groupBy("band", "bkey")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .where(F.col("n_docs") > cap)
    )


@query(
    "lsh_bucket_stats",
    oracle=f"""
    WITH sh AS ({_SQL_SHINGLES}),
         sigs AS ({_SQL_SIGS}),
         bands AS ({_SQL_BANDS}),
         buckets AS (
           SELECT band, bkey, COUNT(*) AS bucket_size
           FROM bands GROUP BY band, bkey
         )
    SELECT band, bucket_size, COUNT(*) AS n_buckets,
           CAST(max(bucket_size) <= {LSH_BUCKET_CAP} AS BOOLEAN) AS under_cap
    FROM buckets GROUP BY band, bucket_size
    """,
)
def lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket-size histogram per band — the observability query for
    the degenerate-bucket cap: how collision mass is distributed, and
    whether any bucket approaches LSH_BUCKET_CAP. Two cascaded
    aggregations over the band table; output is O(distinct sizes)."""
    bands = _spark_bands(_spark_signatures(_doc_shingle_sets(spark, sf_dir)))
    buckets = bands.groupBy("band", "bkey").agg(
        F.count(F.lit(1)).alias("bucket_size")
    )
    return buckets.groupBy("band", "bucket_size").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        (F.max("bucket_size") <= LSH_BUCKET_CAP).alias("under_cap"),
    )


@query(
    "lsh_template_clusters",
    oracle=f"""
    WITH sh AS ({_SQL_SHINGLES}),
         sigs AS ({_SQL_SIGS}),
         bands AS ({_SQL_BANDS})
    SELECT band, bkey, COUNT(*) AS n_docs, min(doc_id) AS keep_doc_id
    FROM bands GROUP BY band, bkey
    HAVING COUNT(*) > {LSH_BUCKET_CAP}
    """,
)
def lsh_template_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cap's side output: buckets too large for pairwise verification
    (see _template_clusters_from_docsets). Empty on the organic test
    corpora (no boilerplate clusters at driver SFs) — the degenerate-
    corpus behavior is pinned in tests/test_dedup.py."""
    return _template_clusters_from_docsets(_doc_shingle_sets(spark, sf_dir))


@query(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH sh AS ({_SQL_SHINGLES}),
         df AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle),
         ranked AS (
           SELECT s.doc_id, s.shingle,
                  row_number() OVER (
                    PARTITION BY s.doc_id ORDER BY d.df, s.shingle) AS rnk,
                  COUNT(*) OVER (PARTITION BY s.doc_id) AS sz
           FROM sh s JOIN df d USING (shingle)
         ),
         prefix AS (
           SELECT doc_id, shingle, sz FROM ranked
           WHERE rnk <= sz - CAST(ceil({JACCARD_THRESHOLD} * sz) AS BIGINT) + 1
         ),
         pairs AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM prefix a JOIN prefix b
             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           WHERE least(a.sz, b.sz)
                 >= {JACCARD_THRESHOLD} * greatest(a.sz, b.sz)
         ),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         inter AS (
           SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter
           FROM pairs p
           JOIN sh sa ON sa.doc_id = p.doc_a
           JOIN sh sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
           GROUP BY p.doc_a, p.doc_b
         )
    SELECT i.doc_a, i.doc_b,
           CAST(i.n_inter AS DOUBLE) / (na.n + nb.n - i.n_inter) AS jaccard
    FROM inter i
    JOIN sizes na ON na.doc_id = i.doc_a
    JOIN sizes nb ON nb.doc_id = i.doc_b
    WHERE CAST(i.n_inter AS DOUBLE) / (na.n + nb.n - i.n_inter)
          >= {JACCARD_THRESHOLD}
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs via prefix filtering (the
    PPJoin family) — no MinHash approximation, yet never all-pairs.

    Each doc's shingles are ordered by a global total order (document
    frequency asc, then shingle); a pair with Jaccard >= t must share a
    shingle within the first ``|d| - ceil(t*|d|) + 1`` of each doc's
    ordering, so the candidate join runs only on those prefixes, with a
    length filter (``min_size >= t * max_size``) pruning further. Rare
    shingles lead the order, so prefix join buckets are small by
    construction — the exact-algorithm counterpart of MinHash banding
    (``minhash_near_dup_pairs``), trading a df computation + window sort
    for zero false negatives. Verification reuses the full shingle set.

    Contrast with the reference's dedup surface: map-side distinct sets
    (indexer.go:21-26) are its only dedup primitive; set-similarity
    self-join has no analog there.
    """
    from pyspark.sql import Window

    # r15: memoized like the minhash pair frame — the recall eval
    # composes this exact tier against the LSH tier, so the PPJoin
    # pipeline used to run twice per suite (and per repetition under
    # memo-aware reps).  Build billed to the first consumer.
    from go_map_reduce_spark.registry import shared_frame

    def _build() -> DataFrame:
        # One row per doc with the shingle-set array; the exploded
        # relational form (needed for the global df computation + prefix
        # ranking) is derived from it, so the tokenize/shingle work runs
        # once.
        docsets = (
            _doc_shingle_sets(spark, sf_dir).persist().transform(track_cache)
        )
        sh = docsets.select(
            "doc_id",
            F.size("shset").alias("sz"),
            F.explode("shset").alias("shingle"),
        )
        dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        w = Window.partitionBy("doc_id").orderBy("df", "shingle")
        ranked = sh.join(dfreq, "shingle").withColumn(
            "rnk", F.row_number().over(w)
        )
        # (the prefix self-join's two sides are identical subplans — AQE
        # exchange reuse executes the ranking pipeline once)
        prefix = ranked.where(
            F.col("rnk")
            <= F.col("sz") - F.ceil(F.lit(JACCARD_THRESHOLD) * F.col("sz")) + 1
        ).select("doc_id", "shingle", "sz", "rnk")
        a, b = prefix.alias("a"), prefix.alias("b")
        # PPJoin positional filter (zero false negatives, like the prefix
        # filter itself): jac >= t  ⇔  |A∩B| >= t/(1+t)·(|A|+|B|) =: α, and
        # a match at prefix positions (pa, pb) bounds the achievable overlap
        # by 1 + min(|A|-pa, |B|-pb). Pairs that cannot reach α never leave
        # the join — on low-entropy corpora (shared boilerplate vocabulary)
        # this prunes the candidate set by orders of magnitude before the
        # expensive verify stage.
        alpha = F.ceil(
            F.lit(JACCARD_THRESHOLD / (1.0 + JACCARD_THRESHOLD))
            * (F.col("a.sz") + F.col("b.sz"))
        )
        ubound = 1 + F.least(
            F.col("a.sz") - F.col("a.rnk"), F.col("b.sz") - F.col("b.rnk")
        )
        pairs = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .where(
                (
                    F.least("a.sz", "b.sz")
                    >= JACCARD_THRESHOLD * F.greatest("a.sz", "b.sz")
                )
                & (ubound >= alpha)
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        return _verify_jaccard(docsets, pairs).localCheckpoint(eager=True)

    return shared_frame(
        spark, f"ppjoin_pairs:{sf_dir}", _build, data_path=sf_dir
    )


_HEX_ODD = "('1','3','5','7','9','b','d','f')"


@query(
    "simhash_fingerprints",
    oracle=f"""
    SELECT doc_id,
           {' || '.join(f"CASE WHEN d{i} > 0 THEN '1' ELSE '0' END" for i in range(1, 17))}
             AS simhash,
           n_tokens
    FROM (
      SELECT doc_id, COUNT(*) AS n_tokens,
             {', '.join(f"SUM(CASE WHEN substr(md5(word), {i}, 1) IN {_HEX_ODD} THEN 1 ELSE -1 END) AS d{i}" for i in range(1, 17))}
      FROM (SELECT doc_id, unnest({_SQL_TOKS}) AS word FROM documents)
      GROUP BY doc_id
    )
    """,
)
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash: 16-bit fingerprint from per-token hash-bit votes
    (dimension i votes +1/-1 by the parity of hex digit i of md5(token);
    sign of the vote sum is bit i). Identical fingerprints → near-dup
    bucket. 16 portable dimensions here so the oracle matches
    bit-for-bit; scale deployments widen to 64 bits with xxhash64 and
    integer bit ops — same plan shape (explode → groupBy doc)."""
    docs = ensure_min_parallelism(
        spark, load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    toks = F.filter(F.split("text", "[^A-Za-z]+"), lambda x: x != "")
    words = docs.select("doc_id", F.explode(toks).alias("word"))
    h = F.md5("word")
    agg = words.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        *[
            F.sum(
                F.when(F.substring(h, i, 1).isin(*"13579bdf"), 1).otherwise(-1)
            ).alias(f"d{i}")
            for i in range(1, 17)
        ],
    )
    bits = F.concat(
        *[
            F.when(F.col(f"d{i}") > 0, "1").otherwise("0")
            for i in range(1, 17)
        ]
    )
    return agg.select("doc_id", bits.alias("simhash"), "n_tokens")


@query("simhash64_fingerprints")  # rows-only: DuckDB cannot compute xxhash64
def simhash64_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash — the scale variant of ``simhash_fingerprints``:
    per-token xxhash64 (native JVM codegen int hash, no md5 string
    digest) votes on 64 dimensions; the fingerprint is emitted as a
    16-hex-char string assembled from two 32-bit halves (a single
    bigint would overflow at bit 63).

    No DuckDB oracle exists for xxhash64, so the driver row is
    rows-only; bit-exactness is instead pinned engine-vs-specification
    in tests/test_dedup.py against a pure-Python XXH64 implementation
    (tests/xxh64_ref.py) — Spark's xxhash64 is the public XXH64
    algorithm with seed 42."""
    from functools import reduce
    from operator import add

    docs = ensure_min_parallelism(
        spark, load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    toks = F.filter(F.split("text", "[^A-Za-z]+"), lambda x: x != "")
    words = docs.select("doc_id", F.explode(toks).alias("word"))
    h = F.xxhash64("word")
    # vote_i = Σ±1 = 2·ones_i − n, so summing the raw bit (no CASE WHEN
    # per dimension) and comparing 2·ones_i > n is the same sign test
    # with 64 fewer conditionals in the hot aggregate.
    agg = words.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        *[
            F.sum(F.shiftright(h, i).bitwiseAND(F.lit(1))).alias(f"d{i}")
            for i in range(64)
        ],
    )
    half = lambda off: reduce(  # noqa: E731
        add,
        [
            F.when(
                F.col(f"d{off + i}") * 2 > F.col("n_tokens"), F.lit(1 << i)
            ).otherwise(F.lit(0))
            for i in range(32)
        ],
    )
    fp = F.lower(
        F.concat(
            F.lpad(F.conv(half(32).cast("string"), 10, 16), 8, "0"),
            F.lpad(F.conv(half(0).cast("string"), 10, 16), 8, "0"),
        )
    )
    return agg.select("doc_id", fp.alias("simhash64"), "n_tokens")


_SQL_SIGN_BUCKET = " || ".join(
    f"CASE WHEN embedding[{i}] > 0 THEN '1' ELSE '0' END"
    for i in range(1, SIGN_BUCKET_DIMS + 1)
)


@query(
    "embedding_near_dup_pairs",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding,
             {_SQL_SIGN_BUCKET} AS bucket,
             {sql_dot('embedding', 'embedding')} AS nsq
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {sql_cosine('a.embedding', 'b.embedding', 'a.nsq', 'b.nsq')} AS cos_sim
    FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {sql_cosine('a.embedding', 'b.embedding', 'a.nsq', 'b.nsq')}
          >= {COSINE_THRESHOLD}
    """,
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: sign-bit LSH bucketing (first 8 dims) for
    candidates, exact cosine for verification. The bucket join is an
    equality hash join on an 8-bit key — 2^8 buckets partition the
    corpus, each pairwise-verified locally. Threshold 0.4 because the
    synthetic vectors are near-orthogonal (max pairwise cosine ≈ 0.51);
    real near-dup dedup runs ≥ 0.95 with more bucket bits."""
    emb = load_table(spark, sf_dir, "embeddings")
    bucket = F.concat(
        *[
            F.when(F.element_at("embedding", i) > 0, "1").otherwise("0")
            for i in range(1, SIGN_BUCKET_DIMS + 1)
        ]
    )
    e = emb.select(
        "vec_id", "embedding", bucket.alias("bucket"), norm_sq(F.col("embedding")).alias("nsq")
    )
    a, b = e.alias("a"), e.alias("b")
    cos = cosine(
        F.col("a.embedding"), F.col("b.embedding"), F.col("a.nsq"), F.col("b.nsq")
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= COSINE_THRESHOLD)
    )


# The held-out boundary shared by BOTH eval-hygiene directions
# (contamination_check scores the held-out side, pipeline29's
# decontamination_cut scores the training side): doc_id % HELDOUT_MOD
# == 0 is held out. One constant, one join skeleton — the two
# queries must audit the SAME split or the both-directions story is
# silently false.
HELDOUT_MOD = 10


def _overlap_profile(sh: DataFrame, score_heldout: bool) -> DataFrame:
    """(doc_id, n_ngrams, n_overlap) for every doc on ONE side of the
    held-out boundary, scored against the OTHER side's distinct
    shingle vocabulary — the shared skeleton of both eval-hygiene
    directions: one equality join on the shingle key (hash shuffle
    sized by the vocabulary, never all-pairs)."""
    heldout = F.col("doc_id") % HELDOUT_MOD == 0
    vocab = (
        sh.where(heldout if not score_heldout else ~heldout)
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        sh.where(heldout if score_heldout else ~heldout)
        .join(vocab, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count("hit").alias("n_overlap"),
        )
    )


@query(
    "contamination_check",
    oracle=f"""
    WITH sh AS ({_SQL_SHINGLES}),
    test AS (SELECT doc_id, shingle FROM sh
             WHERE doc_id % {HELDOUT_MOD} = 0),
    train AS (SELECT DISTINCT shingle FROM sh
              WHERE doc_id % {HELDOUT_MOD} <> 0)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_ngrams,
           CAST(COUNT(tr.shingle) AS BIGINT) AS n_overlap,
           CAST(COUNT(tr.shingle) AS DOUBLE) / COUNT(*) AS contamination_rate
    FROM test t LEFT JOIN train tr ON t.shingle = tr.shingle
    GROUP BY t.doc_id
    """,
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set contamination detection — the eval-hygiene pass of a
    training pipeline: for each held-out document (doc_id % 10 = 0),
    the fraction of its distinct {SHINGLE_K}-gram shingles that appear
    anywhere in the training split. Same candidate-generation shape as
    the dedup stack: one equality join on the shingle key (hash
    shuffle sized by the vocabulary, never all-pairs), distinct-per-row
    shingle sets so no distinct shuffle on the test side. At 100 TB
    the join key would be xxhash64(shingle) (8 bytes instead of the
    string) and the train side a bloom-filter pre-pass; the join shape
    is unchanged. Rate = integer count ÷ integer count in double — one
    division, bit-stable across engines.

    The shingle frame feeds BOTH join sides, so it persists once as a
    materialization barrier (the multi-consumer rule from the minhash
    pipeline): without it the tokenize→slice→concat expression tree is
    inlined into the test explode AND the train distinct — measured
    16 s → ~1 s at sf0.1."""
    sh = _spark_shingles(spark, sf_dir).persist().transform(track_cache)
    return _overlap_profile(sh, score_heldout=True).select(
        "doc_id",
        "n_ngrams",
        "n_overlap",
        (F.col("n_overlap").cast("double") / F.col("n_ngrams")).alias(
            "contamination_rate"
        ),
    )
