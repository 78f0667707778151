"""Round-5 pipeline operators, second batch: k-core graph peeling,
item-item co-occurrence similarity, dictionary phrase tagging, and
last-touch attribution.

Shapes: one iterative-peeling graph loop (the degeneracy-ordering
family, alongside graph.py's PageRank/BFS and advanced.py's connected
components), one normalized co-occurrence ranking (the recommender
primitive on top of pipeline6's basket counting), one broadcast
dictionary-join text tagger (multi-pattern matching without a regex
alternation scan), and one carry-forward window attribution (the
marketing/event-sequence shape of the as-of join family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.operators.graph import (
    knn_cosupply_edges,
    sql_knn_graph_ctes,
)
from go_map_reduce_spark.registry import query, track_cache

# --------------------------------------------------------------------------
# k-core: iterative degree peeling on the k-NN co-supply graph
# --------------------------------------------------------------------------

KCORE_K = 4
KCORE_ROUNDS = 3
KCORE_KNN = 3       # same k-NN sparsification as triangle_count
KCORE_PART_MOD = 4  # same deterministic 1/4 part sample


def _sql_peel(prev: str, it: int) -> str:
    """One peeling round as CTEs: degrees within the surviving
    subgraph, then drop nodes below K."""
    return f"""
    deg{it} AS (
      SELECT e.src AS node, COUNT(*) AS deg
      FROM edges e
      JOIN {prev} a ON a.node = e.src
      JOIN {prev} b ON b.node = e.dst
      GROUP BY e.src
    ),
    k{it} AS (
      SELECT node, deg FROM deg{it} WHERE deg >= {KCORE_K}
    )"""


@query(
    "kcore_suppliers",
    oracle=f"""
    WITH {sql_knn_graph_ctes(KCORE_KNN, KCORE_PART_MOD)},
    edges AS (SELECT src, dst FROM eu UNION ALL SELECT dst, src FROM eu),
    k0 AS (SELECT src AS node FROM edges GROUP BY src),
    {','.join(_sql_peel(f'k{i}', i + 1) for i in range(KCORE_ROUNDS))}
    SELECT node, CAST(deg AS BIGINT) AS deg
    FROM k{KCORE_ROUNDS}
    """,
)
def kcore_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KCORE_ROUNDS} rounds of k-core peeling (k={KCORE_K}) on the
    k-NN-sparsified supplier co-supply graph (same construction as
    triangle_count, graph.py:309 — each supplier keeps its
    {KCORE_KNN} strongest neighbors, kept lists symmetrized):
    repeatedly delete nodes whose degree in the SURVIVING subgraph
    falls below k. The dense-subgraph extractor behind spam detection
    and community seeding. On this graph the peel genuinely cascades —
    measured survivor counts 100 → 49 → 22 → 7 at sf0.01 (1000 → 540 →
    196 → 26 at sf0.1): deleting a thin node drags its neighbors'
    degrees down, which is exactly what distinguishes k-core from a
    one-shot degree filter (a bipartite supplier↔part variant was
    tried and rejected: its two degree scales never interact, so the
    peel converges after one round). Differentially tested against the
    unrolled fixed-round SQL (same discipline as pagerank's oracle).

    Per round: restrict edges to surviving endpoints (two semi-joins
    against the ≤|nodes|-row survivor frame) and re-aggregate degrees —
    the edge table's src-hash partitioning is reused across rounds, and
    integer-only state means no float discipline is needed. Fixed-depth
    loops stay un-checkpointed (plan depth is bounded); an
    until-fixpoint peel would take the PR_CKPT_EVERY cadence
    (graph.py:133) plus a per-round survivor count as the stop test."""
    eu = knn_cosupply_edges(spark, sf_dir, KCORE_KNN, KCORE_PART_MOD)
    edges = (
        eu.union(eu.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .persist().transform(track_cache)  # re-filtered every round
    )
    alive = edges.select(F.col("src").alias("node")).distinct()
    survivors = None
    for _ in range(KCORE_ROUNDS):
        survivors = (
            edges.join(alive, edges.src == alive.node, "left_semi")
            .join(
                alive.select(F.col("node").alias("dnode")),
                F.col("dst") == F.col("dnode"),
                "left_semi",
            )
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") >= KCORE_K)
            .select(F.col("src").alias("node"), "deg")
        )
        # the survivor frame feeds BOTH semi-joins of the next round:
        # persist so each round executes once, not 2^rounds times
        alive = survivors.select("node").persist().transform(track_cache)
    return survivors.select("node", F.col("deg").cast("long").alias("deg"))


# --------------------------------------------------------------------------
# Item-item co-occurrence similarity (recommender candidate generation)
# --------------------------------------------------------------------------

COOC_MIN_SUPP = 2
COOC_TOP_K = 3


@query(
    "item_cooccurrence_similarity",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    isupp AS (SELECT p, COUNT(*) AS s FROM items GROUP BY p),
    co AS (
      SELECT a.p AS item, b.p AS other, COUNT(*) AS supp
      FROM items a JOIN items b ON a.o = b.o AND a.p <> b.p
      GROUP BY a.p, b.p
      HAVING COUNT(*) >= {COOC_MIN_SUPP}
    )
    , sim AS (
      SELECT co.item, co.other,
             round(co.supp / (sqrt(CAST(ia.s AS DOUBLE))
                              * sqrt(CAST(ib.s AS DOUBLE))), 6) AS sim
      FROM co JOIN isupp ia ON ia.p = co.item
              JOIN isupp ib ON ib.p = co.other
    )
    SELECT item, other, sim, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY item ORDER BY sim DESC, other
             ) AS rk
      FROM sim
    )
    WHERE rk <= {COOC_TOP_K}
    """,
)
def item_cooccurrence_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item cosine-over-baskets: sim(i,j) = co(i,j) / √(s_i·s_j)
    where co counts shared orders and s the items' order counts — the
    classic co-occurrence recommender (each item's top-{COOC_TOP_K}
    "bought with" neighbors). Built on the same bounded basket
    self-join as market_basket_pairs (pipeline6): fan-out is
    C(basket, 2), never catalog², and the support floor
    ({COOC_MIN_SUPP}) bounds the ranked frame. Item supports join back
    unhinted (one row per item — small at every tested SF, so
    Catalyst/AQE picks broadcast; the frame grows with catalog size,
    so a forced hint would be wrong at true 100x catalog scale). The normalization and ranking run
    on the already-reduced pair frame — at 100 TB the only heavy
    shuffles are the distinct and the pair count, both
    map-side-combinable."""
    # items feeds THREE consumers (supports, both self-join sides) and
    # is the same frame market_basket_pairs builds — r15: one
    # shared_frame build per session (pipeline6._basket_items) instead
    # of a per-query persist re-running the scan + distinct shuffle.
    from go_map_reduce_spark.operators.pipeline6 import _basket_items

    items = _basket_items(spark, sf_dir)
    isupp = items.groupBy("p").agg(F.count(F.lit(1)).alias("s"))
    a = items.select("o", F.col("p").alias("item"))
    b = items.select("o", F.col("p").alias("other"))
    co = (
        a.join(b, ["o"])
        .where(F.col("item") != F.col("other"))
        .groupBy("item", "other")
        .agg(F.count(F.lit(1)).alias("supp"))
        .where(F.col("supp") >= COOC_MIN_SUPP)
    )
    sim = (
        co.join(
            isupp.select(F.col("p").alias("item"), F.col("s").alias("sa")),
            "item",
        )
        .join(
            isupp.select(F.col("p").alias("other"), F.col("s").alias("sb")),
            "other",
        )
        .select(
            "item",
            "other",
            F.round(
                F.col("supp")
                / (
                    F.sqrt(F.col("sa").cast("double"))
                    * F.sqrt(F.col("sb").cast("double"))
                ),
                6,
            ).alias("sim"),
        )
    )
    w = W.partitionBy("item").orderBy(F.desc("sim"), F.asc("other"))
    return (
        sim.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= COOC_TOP_K)
    )


# --------------------------------------------------------------------------
# Dictionary phrase tagging (multi-pattern match via bigram join)
# --------------------------------------------------------------------------

PHRASES = [
    "fast scan",
    "hash join",
    "sort merge",
    "window agg",
    "table scan",
]

_PHRASES_SQL = ", ".join(f"('{p}')" for p in PHRASES)


@query(
    "phrase_match_dictionary",
    oracle=f"""
    WITH dict(phrase) AS (VALUES {_PHRASES_SQL}),
    toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
      FROM documents
    ),
    bigrams AS (
      SELECT doc_id, t[p] || ' ' || t[p+1] AS bigram
      FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS p FROM toks)
    )
    SELECT doc_id, phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM bigrams JOIN dict ON bigram = phrase
    GROUP BY doc_id, phrase
    """,
)
def phrase_match_dictionary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-phrase dictionary tagging: occurrences of each dictionary
    phrase per document — the blocklist/PII-dictionary/taxonomy-tagging
    primitive. Instead of scanning every document with an
    ever-growing regex alternation (per-doc cost grows with dictionary
    size), documents explode once into token bigrams and the dictionary
    joins by equality — a BROADCAST hash join keyed on the phrase
    text, so dictionary growth costs hashtable size, not scan time.
    Phrases longer than two tokens generalize by keying on a fixed
    n-gram prefix and verifying the remainder (same
    candidate-then-verify discipline as the dedup family).

    Tokenization is the whitespace convention shared with
    repeated_ngram_spans (pipeline5) on both engines."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    grams = docs.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                lambda x, y: F.concat_ws(" ", x, y),
            )
        ).alias("bigram"),
    )
    dict_df = spark.createDataFrame([(p,) for p in PHRASES], ["phrase"])
    return (
        grams.join(F.broadcast(dict_df), grams.bigram == dict_df.phrase)
        .groupBy("doc_id", "phrase")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


# --------------------------------------------------------------------------
# Last-touch attribution (carry-forward window over the event stream)
# --------------------------------------------------------------------------

ATTR_WINDOW_US = 24 * 3600 * 1_000_000  # 24 h lookback


@query(
    "purchase_click_attribution",
    oracle=f"""
    WITH ev AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events
    )
    SELECT p.event_id, p.user_id,
           (SELECT max(c.us) FROM ev c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND c.us < p.us AND c.us >= p.us - {ATTR_WINDOW_US}) AS click_us
    FROM ev p WHERE p.event_type = 'purchase'
    """,
)
def purchase_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: for every purchase, the same user's most
    recent click strictly before it (NULL if none within 24 h) — the
    marketing-attribution join, and the event-stream variant of the
    as-of family (asof_join_user_orders, advanced.py:56).

    Same union-sort shape, zero self-join: clicks and purchases ride
    ONE user-keyed sort; `last(click_us, ignoreNulls)` over rows
    unbounded-preceding carries the latest click forward to each
    purchase row; the 24 h staleness bound filters afterwards (the
    asof_join_tolerance knob). The oracle is the quadratic correlated
    subquery — the differential proof the carry-forward window computes
    it. One shuffle total (the user-keyed sort); at 100 TB this is the
    plan you want, since a purchases⋈clicks range self-join would
    re-shuffle both sides and fan out per click."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    tagged = ev.where(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "event_type",
        "us",
        F.when(F.col("event_type") == "click", F.col("us")).alias("click_t"),
    )
    # Order by (us, is_purchase): a click at exactly a purchase's
    # timestamp must NOT attribute (strictly-before semantics), so
    # purchases sort before same-instant clicks.
    is_click = (F.col("event_type") == "click").cast("int")
    w = (
        W.partitionBy("user_id")
        .orderBy("us", is_click.asc(), "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carried = tagged.withColumn(
        "last_click_us", F.last("click_t", ignorenulls=True).over(w)
    )
    return carried.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.when(
            F.col("last_click_us") >= F.col("us") - ATTR_WINDOW_US,
            F.col("last_click_us"),
        ).alias("click_us"),
    )
