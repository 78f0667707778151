"""Round-5 pipeline operators, third batch: event-sequence transition
matrix, ratio-to-report windowing, deterministic stratified sampling,
exact maximum-inner-product retrieval, label-propagation communities,
and seasonal baseline/residual decomposition.

Shapes this batch adds to the inventory: the lead()-based Markov
transition estimate (user-journey mining), the share-of-parent window
(percent-of-total reporting), per-stratum fixed-n reproducible
sampling (the eval-set carve-out), MIPS with the norm-augmentation
reduction (recommender scoring, distinct from cosine ANN), modular
community structure (vs connected components' reachability), and the
weekday-seasonality residual (anomaly baselining).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.functions.numeric import dsum, sql_dsum
from go_map_reduce_spark.functions.vector import dot_product, sql_dot
from go_map_reduce_spark.registry import query, track_cache

# --------------------------------------------------------------------------
# Event-type transition matrix (first-order Markov estimate)
# --------------------------------------------------------------------------


@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS nxt
      FROM events
    ),
    c AS (
      SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    )
    SELECT cur, nxt, n,
           round(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY cur), 6) AS p
    FROM c
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next = b | current = a), the user-journey /
    session-flow summary (and the generative model behind funnel
    expectations). `lead` over the user-keyed sort pairs each event
    with its successor; the matrix is one grouped count plus a
    share-of-row window on the |types|² cell frame.

    Scale shape: ONE user-keyed sort shuffle (same partitioning the
    sessionization family reuses), then counts are map-side-
    combinable; the probability normalization runs on the tiny cell
    frame, never on events. Ordering ties broken by event_id — a
    total order, so the successor of every event is engine-identical.
    The count is integer; the single division is one IEEE op, 6dp."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    wseq = W.partitionBy("user_id").orderBy("us", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(wseq).alias("nxt"),
    )
    c = (
        seq.where(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return c.select(
        "cur",
        "nxt",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(W.partitionBy("cur")), 6
        ).alias("p"),
    )


# --------------------------------------------------------------------------
# Ratio-to-report: nation revenue share within its region
# --------------------------------------------------------------------------

REVENUE = "l_extendedprice * (1.0 - l_discount)"


@query(
    "revenue_share_within_region",
    oracle=f"""
    WITH nat AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             {sql_dsum(REVENUE)} AS revenue
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, n.n_name
    )
    SELECT region, nation, revenue,
           round(revenue / SUM(CAST(revenue AS DECIMAL(38,6)))
                            OVER (PARTITION BY region), 6) AS share
    FROM nat
    """,
)
def revenue_share_within_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent reporting: each supplier nation's share of its
    region's revenue — the ratio_to_report window shape every BI layer
    needs. The heavy work is the q5-style star join + one grouped
    decimal sum; the share is a window SUM over the 25-row nation
    frame (cost-free at any scale — the window input is the
    already-reduced aggregate, never the fact table). The window sum
    goes through decimal too: the denominator must be
    order-independent for the 6dp share to be engine-identical."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    reg = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    natrev = (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(dsum(rev).alias("revenue"))
    )
    denom = F.sum(F.col("revenue").cast("decimal(38,6)")).over(
        W.partitionBy("region")
    )
    return natrev.select(
        "region",
        "nation",
        "revenue",
        F.round(F.col("revenue") / denom, 6).alias("share"),
    )


# --------------------------------------------------------------------------
# Deterministic per-stratum fixed-n sample
# --------------------------------------------------------------------------

STRAT_N = 5


@query(
    "stratified_fixed_n_sample",
    oracle=f"""
    SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    )
    WHERE rk <= {STRAT_N}
    """,
)
def stratified_fixed_n_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-n-per-stratum sampling: exactly {STRAT_N} documents per
    language, chosen by md5(doc_id) rank — the held-out eval-set
    carve-out. Unlike fraction-based sampling
    (stratified_sample_events, analytics.py), the per-group COUNT is
    exact; unlike `rand()`-based selection it is reproducible across
    runs, engines, retries and partitionings, because rank order is a
    pure function of row identity (the md5 convention of
    training_shard_assignment / weighted_sample_docs).

    Scale shape: one hash shuffle on the stratum key; Spark plans the
    rank≤n filter as WindowGroupLimit, so each partition keeps a
    {STRAT_N}-row heap per stratum instead of sorting whole groups."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    rk = F.row_number().over(
        W.partitionBy("lang").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
    )
    return (
        docs.withColumn("rk", rk.cast("long")).where(F.col("rk") <= STRAT_N)
    )


# --------------------------------------------------------------------------
# Exact MIPS top-k (with the norm-augmentation reduction documented)
# --------------------------------------------------------------------------

MIPS_N_QUERY = 5
MIPS_TOP_K = 6


@query(
    "mips_topk",
    oracle=f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round({sql_dot('q.embedding', 'c.embedding')}, 6) AS dot
      FROM embeddings q JOIN embeddings c
        ON q.vec_id < {MIPS_N_QUERY} AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, dot, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY query_id ORDER BY dot DESC, neighbor_id
             ) AS rk
      FROM scored
    )
    WHERE rk <= {MIPS_TOP_K}
    """,
)
def mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product top-k — the recommender scoring semantics
    (user vector · item vector), DISTINCT from cosine ANN: un-normalized,
    so large-norm items legitimately rank higher. Broadcast query side,
    sequential-fold dot products, per-query top-k window.

    The scale path for MIPS is the norm-augmentation reduction
    (appending √(M² − ‖c‖²) as an extra dimension, M = max corpus norm,
    turns inner-product order into cosine order, unlocking every cosine
    index — LSH buckets, IVF cells, PQ codes — for MIPS):
    tests/test_round5_pipeline8.py proves the augmented-cosine ranking
    reproduces this query's dot ranking exactly on this corpus. The
    registered plan keeps the direct form — at any SF its cost profile
    is identical (one codegen map pass; the augmentation adds one
    precomputed column and a broadcast 1-row max)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.where(F.col("vec_id") < MIPS_N_QUERY).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = emb.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(dot_product(F.col("q_emb"), F.col("embedding")), 6).alias("dot"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= MIPS_TOP_K)
    )


# --------------------------------------------------------------------------
# Label propagation communities (sync LPA, fixed rounds)
# --------------------------------------------------------------------------

LPA_ROUNDS = 3
LPA_KNN = 3
LPA_PART_MOD = 4

from go_map_reduce_spark.operators.graph import (  # noqa: E402
    knn_cosupply_edges,
    sql_knn_graph_ctes,
)

_SQL_LPA_GRAPH = f"""
    {sql_knn_graph_ctes(LPA_KNN, LPA_PART_MOD)},
    edges AS (SELECT src, dst FROM eu UNION ALL SELECT dst, src FROM eu),
    l0 AS (SELECT src AS node, src AS label FROM edges GROUP BY src)
"""


def _sql_lpa_round(prev: str, it: int) -> str:
    """One synchronous LPA round: each node adopts the most frequent
    label among its neighbors (tie → smallest label)."""
    return f"""
    votes{it} AS (
      SELECT e.src AS node, {prev}.label, COUNT(*) AS c
      FROM edges e JOIN {prev} ON {prev}.node = e.dst
      GROUP BY e.src, {prev}.label
    ),
    l{it} AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY c DESC, label) AS rk
        FROM votes{it}
      ) WHERE rk = 1
    )"""


@query(
    "label_propagation_communities",
    oracle=f"""
    WITH {_SQL_LPA_GRAPH},
    {','.join(_sql_lpa_round(f'l{i}', i + 1) for i in range(LPA_ROUNDS))}
    SELECT node, label AS community FROM l{LPA_ROUNDS}
    """,
)
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation ({LPA_ROUNDS} rounds) on the k-NN
    co-supply graph (construction shared with triangle_count and
    kcore_suppliers): every node adopts its neighbors' most frequent
    label, ties to the smallest — the near-linear community detector
    (Raghavan et al. 2007), which finds MODULAR structure where
    connected components (advanced.py dedup_clusters) only find
    reachability. Deterministic by construction (count-desc,
    label-asc ranking is a total order), so the unrolled fixed-round
    SQL matches exactly — async/randomized LPA variants trade that
    determinism away.

    Per round: one edge-keyed join against the |nodes|-row label
    frame, a (node, label) vote count, and a per-node argmax window —
    all partitioned by node key, layout reused across rounds. Fixed
    depth ⇒ bounded plan; an until-stable run takes the checkpoint
    cadence + vote-change count as the stop test (graph.py:133)."""
    eu = knn_cosupply_edges(spark, sf_dir, LPA_KNN, LPA_PART_MOD)
    edges = (
        eu.union(eu.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .persist().transform(track_cache)  # joined every round
    )
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    warg = W.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(LPA_ROUNDS):
        votes = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy(edges.src.alias("vnode"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
            .select(F.col("vnode").alias("node"), "label", "c")
        )
        labels = (
            votes.withColumn("rk", F.row_number().over(warg))
            .where(F.col("rk") == 1)
            .select("node", "label")
        )
    return labels.select("node", F.col("label").alias("community"))


# --------------------------------------------------------------------------
# Day-of-week seasonality baseline + residuals
# --------------------------------------------------------------------------


@query(
    "dow_seasonality_revenue",
    oracle=f"""
    WITH daily AS (
      SELECT strftime(date_trunc('day', o_orderdate), '%Y-%m-%d') AS day,
             isodow(o_orderdate) AS dow,
             {sql_dsum('o_totalprice')} AS revenue
      FROM orders GROUP BY 1, 2
    ),
    base AS (
      SELECT dow,
             round({sql_dsum('revenue')} / COUNT(*), 6) AS dow_baseline
      FROM daily GROUP BY dow
    )
    SELECT daily.day, CAST(daily.dow AS INT) AS dow, daily.revenue,
           base.dow_baseline,
           round(daily.revenue - base.dow_baseline, 6) AS residual
    FROM daily JOIN base ON daily.dow = base.dow
    """,
)
def dow_seasonality_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-seasonality decomposition of daily order revenue: the
    per-day-of-week mean is the baseline, and each day's residual is
    what an alerting rule should threshold on — revenue dropping on a
    Sunday is only anomalous relative to SUNDAYS. (The same two-pass
    baseline/residual shape as doc_length_zscores, on the time axis.)

    Two shuffles over tiny frames after the daily rollup (the only
    pass over orders, map-side-combinable); the 7-row baseline joins
    back by broadcast. Weekday convention pinned cross-engine: Spark
    `weekday()` is 0=Monday, DuckDB `isodow` is 1=Monday — the +1
    aligns them. All sums decimal; baseline mean is davg's
    sum-then-one-divide, 6dp."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        # day as a STRING: a DATE column round-trips as date on one
        # engine and midnight-timestamp on the other through pandas,
        # hash-mismatching even when values agree
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        (F.weekday("o_orderdate") + 1).alias("dow"),
    ).agg(dsum(F.col("o_totalprice")).alias("revenue"))
    base = daily.groupBy("dow").agg(
        F.round(
            F.sum(F.col("revenue").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("dow_baseline")
    )
    return (
        daily.join(F.broadcast(base), "dow")
        .select(
            "day",
            F.col("dow").cast("int").alias("dow"),
            "revenue",
            "dow_baseline",
            F.round(F.col("revenue") - F.col("dow_baseline"), 6).alias("residual"),
        )
    )
