"""Graph operators: PageRank over an edge table.

Alongside connected components (operators/advanced.py dedup_clusters),
PageRank is the second canonical iterative graph algorithm a
training-data pipeline runs (domain authority for source weighting,
link-graph quality signals). The reference has no graph surface at all
(its only iteration is the coordinator's poll loop).

Spark-first shape: one edge-keyed shuffle per iteration — ranks join
edges on src, contributions aggregate on dst. Rank sums go through the
decimal discipline (functions/numeric.py) so every iteration is
bit-reproducible at any parallelism, which is what lets a fixed-
iteration unrolled SQL oracle match exactly.

At scale: the edge table partitioning is reused across iterations
(same join key), ranks are the small side (one row per node) and are
broadcast when they fit; `localCheckpoint` every PR_CKPT_EVERY
iterations keeps lineage bounded (as in dedup_clusters, advanced.py)
without paying a plan compilation per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from go_map_reduce_spark.catalog import load_table, register_views
from go_map_reduce_spark.functions.numeric import dsum, sql_dsum
from go_map_reduce_spark.registry import query, track_cache

PR_ITERS = 3
PR_DAMPING = 0.85
PR_CKPT_EVERY = 4  # truncate lineage every N iterations (see loop comment)


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected supplier↔part graph from lineitem co-occurrence,
    encoded as two directed edges. Node ids are disjoint: suppliers
    keep their key, parts are offset by 1e6. Undirected means no
    dangling nodes — every node has out-degree ≥ 1, so no leaked
    PageRank mass to redistribute."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_suppkey").cast("long").alias("s"),
            (F.col("l_partkey").cast("long") + 1_000_000).alias("p"),
        )
        .distinct()
    )
    fwd = li.select(F.col("s").alias("src"), F.col("p").alias("dst"))
    rev = li.select(F.col("p").alias("src"), F.col("s").alias("dst"))
    return fwd.union(rev)


_SQL_EDGES = """
  SELECT s AS src, p AS dst FROM sp
  UNION ALL
  SELECT p AS src, s AS dst FROM sp
"""


def _sql_pagerank_iteration(prev: str, it: int) -> str:
    """One unrolled PageRank iteration as a CTE pair (contributions →
    new ranks). Matches the Spark loop op-for-op: double division per
    edge, decimal sum per dst, damping in double."""
    return f"""
    contrib{it} AS (
      SELECT e.dst AS node,
             {sql_dsum(f'{prev}.rank / {prev}.deg', 12)} AS s
      FROM edges e JOIN {prev} ON {prev}.node = e.src
      GROUP BY e.dst
    ),
    r{it} AS (
      SELECT d.node, d.deg,
             (1.0 - {PR_DAMPING}) / n.n + {PR_DAMPING} * contrib{it}.s AS rank
      FROM degs d JOIN contrib{it} ON contrib{it}.node = d.node
      CROSS JOIN n
    )"""


@query(
    "pagerank_supplier_part",
    oracle=f"""
    WITH sp AS (
      SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS s,
                      CAST(l_partkey AS BIGINT) + 1000000 AS p
      FROM lineitem
    ),
    edges AS ({_SQL_EDGES}),
    degs AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM degs),
    r0 AS (SELECT node, deg, 1.0 / n.n AS rank FROM degs CROSS JOIN n),
    {','.join(_sql_pagerank_iteration(f'r{i}', i + 1) for i in range(PR_ITERS))}
    SELECT node, round(rank, 12) AS rank, CAST(deg AS BIGINT) AS deg
    FROM r{PR_ITERS}
    """,
)
def pagerank_supplier_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank ({PR_ITERS} iterations, damping 0.85) over the
    supplier↔part co-occurrence graph. Differentially tested against an
    unrolled fixed-iteration SQL formulation — possible only because
    every per-iteration aggregation is order-free (decimal sums), so
    the distributed loop is bit-identical to the sequential SQL.

    Per iteration: ranks ⋈ edges on src (edge-keyed shuffle), decimal
    contribution sum on dst, damping applied per-row in double. The
    rank frame is one row per node — broadcastable when it fits; the
    edge partitioning is identical across iterations so AQE reuses the
    layout. Edges and degrees feed every iteration, so both persist
    once (multi-consumer barrier) instead of re-running the
    distinct+union scan per iteration — measured ~10 s → ~3 s at
    sf0.1."""
    edges = _edges(spark, sf_dir).persist().transform(track_cache)
    degs = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .select(F.col("src").alias("node"), "deg")
        .persist().transform(track_cache)
    )
    # Degree folded INTO the persisted edge frame: the per-iteration
    # dataflow is then edges⋈(node,rank) → one grouped sum — a single
    # broadcast join + one shuffle per iteration, instead of the
    # edges⋈ranks + degs⋈contrib double join (measured 7.6 s → 4 s at
    # sf0.1). The rank frame is one row per node; F.broadcast is the
    # right hint while ranks fit an executor (~100M nodes at 16 bytes);
    # beyond that drop the hint and AQE falls back to a shuffle join.
    edges_deg = edges.join(
        degs, edges.src == degs.node
    ).select("src", "dst", "deg").persist().transform(track_cache)
    n = degs.agg(F.count(F.lit(1)).cast("double").alias("n"))
    ranks = degs.crossJoin(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    # Lineage is truncated every PR_CKPT_EVERY iterations, not every one:
    # each localCheckpoint forces its own plan compilation (an RDD
    # conversion through whole-stage codegen), and per-iteration
    # checkpoints made compilation — not execution — the dominant cost
    # (measured 17 s → 6 s cold at sf0.1 by batching them). A handful of
    # unrolled iterations is well within Catalyst's analysis budget; the
    # checkpoint cadence only needs to keep plan depth bounded, so it
    # scales with iteration count, not with data.
    for i in range(PR_ITERS):
        contrib = (
            edges_deg.join(F.broadcast(ranks), edges_deg.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(dsum(F.col("c"), 12).alias("s"))
        )
        ranks = contrib.crossJoin(F.broadcast(n)).select(
            F.col("dst").alias("node"),
            (
                F.lit(1.0 - PR_DAMPING) / F.col("n")
                + F.lit(PR_DAMPING) * F.col("s")
            ).alias("rank"),
        )
        if (i + 1) % PR_CKPT_EVERY == 0 and (i + 1) < PR_ITERS:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.join(degs, "node").select(
        "node", F.round("rank", 12).alias("rank"), F.col("deg").cast("long").alias("deg")
    )


# BFS hop distance via WITH RECURSIVE — same SQL text on both engines.
# Node encoding matches pagerank: suppliers keep their key, parts are
# offset by 1e6 (keys start at 0, so sign-flipping would collide
# supplier 0 with part 0). The seed is supplier 1. Depth-capped at 3 with per-level
# DISTINCT: in a bipartite graph every node rediscovered at hop+2 would
# otherwise re-expand, turning the frontier into a path count. With the
# DISTINCT each level is bounded by |nodes|, so total recursive work is
# ≤ depth × |nodes| join probes — the same frontier-dedup every
# production BFS does. MIN(hop) per node collapses the odd/even
# rediscoveries to the true distance.
_BFS_SQL = """
WITH RECURSIVE reach(node, hop) AS (
    SELECT CAST(1 AS BIGINT) AS node, 0 AS hop
  UNION ALL
    SELECT DISTINCT b.dst AS node, r.hop + 1 AS hop
    FROM reach r
    JOIN (
      SELECT src, dst FROM (
        SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
                        CAST(l_partkey AS BIGINT) + 1000000 AS dst
        FROM lineitem
      ) e
      UNION ALL
      SELECT dst AS src, src AS dst FROM (
        SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
                        CAST(l_partkey AS BIGINT) + 1000000 AS dst
        FROM lineitem
      ) e2
    ) b ON b.src = r.node
    WHERE r.hop < 3
)
SELECT node, MIN(hop) AS hop FROM reach GROUP BY node
"""


@query("bfs_reachability", oracle=_BFS_SQL)
def bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE BFS: hop distance from supplier 1 (parts offset
    by 1e6) over the supplier↔part co-occurrence graph, depth-capped
    at 3.

    Covers Spark 4's WITH RECURSIVE surface (UnionLoop execution —
    each recursion step is one join against the previous frontier);
    the oracle runs the *identical* SQL text on DuckDB's recursive
    CTE. Integer-only columns, so no float discipline needed.

    At scale each step shuffles only the frontier (≤ |nodes| rows after
    the per-level DISTINCT) against the edge table; the edge subquery's
    partitioning is stable across steps. Unbounded-depth traversals
    belong in the iterative-DataFrame form (dedup_clusters,
    pagerank_supplier_part) where lineage is checkpointed; the
    recursive CTE is the right tool for bounded-depth reachability."""
    register_views(spark, sf_dir)
    # The recursive CTE's edge subquery (DISTINCT projection of
    # lineitem) is re-evaluated at every recursion level; caching a
    # DataFrame with the identical logical subplan lets the
    # CacheManager substitute the InMemoryRelation into each level's
    # join, so lineitem is scanned and deduplicated once, not
    # 2×depth times.
    spark.sql(
        """
        SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
                        CAST(l_partkey AS BIGINT) + 1000000 AS dst
        FROM lineitem
        """
    ).persist().transform(track_cache)
    return spark.sql(_BFS_SQL)


@query("bfs_frontier_iterative", oracle=_BFS_SQL)
def bfs_frontier_iterative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier BFS as an explicit DataFrame loop — the production shape
    of `bfs_reachability` (same seed, depth cap, and oracle SQL).

    Unlike the recursive CTE (whose UnionLoop pays a per-level plan
    compilation and re-expands rediscovered nodes before the final
    MIN(hop)), this variant prunes with an anti-join: each level expands
    only the NEW frontier and subtracts everything already visited, so a
    node's recorded hop is its first-discovery level — exactly the
    MIN(hop) the oracle computes, with per-level work bounded by the
    frontier size instead of the rediscovery count. This is how a
    1000-executor BFS is actually written: visited set and frontier are
    both node-keyed frames sharing the edge table's partitioning; depth
    is bounded, so no lineage checkpoint is needed (cadence rule as in
    pagerank's PR_CKPT_EVERY for deeper traversals)."""
    edges = _edges(spark, sf_dir).persist().transform(track_cache)
    seed = spark.range(1).select(
        F.lit(1).cast("long").alias("node"), F.lit(0).cast("int").alias("hop")
    )
    visited = seed
    frontier = seed.select("node")
    for hop in range(1, 4):
        expanded = (
            edges.join(frontier, edges.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        frontier = expanded.join(
            visited, "node", "left_anti"
        ).persist().transform(track_cache)  # consumed twice: union into visited + next expansion
        visited = visited.unionAll(
            frontier.select("node", F.lit(hop).cast("int").alias("hop"))
        )
    return visited


TRI_KNN = 3       # each node keeps its 3 strongest co-supply neighbors
TRI_PART_MOD = 4  # weigh co-supply on a deterministic 1/4 part sample


def knn_cosupply_edges(
    spark: SparkSession, sf_dir: str, knn: int = TRI_KNN,
    part_mod: int = TRI_PART_MOD,
) -> DataFrame:
    """Shared k-NN co-supply graph construction (used by
    triangle_count here and kcore_suppliers / label_propagation_
    communities in pipeline7/pipeline8): deterministic 1/part_mod part
    sample → distinct (s, p) → shared-part weighted self-join →
    per-src top-knn picks (shared desc, dst asc) → symmetrized,
    deduplicated undirected edge set as (src, dst) with src < dst.
    The (s, p) frame persists internally (it is self-joined); callers
    persist the returned edge frame if they consume it repeatedly."""
    sp = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_partkey") % part_mod == 0)
        .select(
            F.col("l_suppkey").cast("long").alias("s"),
            F.col("l_partkey").cast("long").alias("p"),
        )
        .distinct()
        .persist().transform(track_cache)
    )
    a, b = sp.alias("a"), sp.alias("b")
    w = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") != F.col("b.s")))
        .groupBy(F.col("a.s").alias("src"), F.col("b.s").alias("dst"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    rk = F.row_number().over(
        Window.partitionBy("src").orderBy(F.desc("shared"), F.asc("dst"))
    )
    picks = w.withColumn("rk", rk).where(F.col("rk") <= knn)
    return picks.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()


def sql_knn_graph_ctes(knn: int = TRI_KNN, part_mod: int = TRI_PART_MOD) -> str:
    """DuckDB twin of knn_cosupply_edges as CTE text: defines sp, w,
    knn, eu — append further CTEs and select from eu (src < dst)."""
    return f"""
  sp AS (
    SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS s, CAST(l_partkey AS BIGINT) AS p
    FROM lineitem WHERE l_partkey % {part_mod} = 0
  ),
  w AS (
    SELECT a.s AS src, b.s AS dst, COUNT(*) AS shared
    FROM sp a JOIN sp b ON a.p = b.p AND a.s <> b.s
    GROUP BY a.s, b.s
  ),
  knn AS (
    SELECT src, dst FROM (
      SELECT src, dst,
             row_number() OVER (PARTITION BY src
                                ORDER BY shared DESC, dst) AS rk
      FROM w
    ) WHERE rk <= {knn}
  ),
  eu AS (
    SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst FROM knn
  )"""


_TRI_SQL = f"""
WITH {sql_knn_graph_ctes(TRI_KNN, TRI_PART_MOD)},
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM eu e1
  JOIN eu e2 ON e2.src = e1.dst
  JOIN eu e3 ON e3.src = e1.src AND e3.dst = e2.dst
)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
GROUP BY node
"""


@query("triangle_count", oracle=_TRI_SQL)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation on the k-NN-sparsified supplier
    co-supply graph: each supplier keeps its {TRI_KNN} strongest
    neighbors by shared-part count (ties broken by id), kept lists are
    symmetrized — the bipartite supplier↔part graph itself is
    triangle-free, so the unipartite projection is where cluster
    structure lives.

    The k-NN step is the scale guard, not a convenience: the raw
    projection of a dense catalog is near-complete (at sf0.1 every
    supplier pair shares ≥2 parts — 500k edges, 166M triangles), so
    any absolute-threshold edge rule degenerates with density. Top-K
    per node bounds the graph at K·|nodes| directed picks at ANY
    density — the standard k-NN graph construction — and makes the
    triangle join trivially cheap. The count itself is the canonical
    ordered-edge join: with every kept edge stored src < dst, each
    triangle a<b<c is emitted exactly once by (a,b)⋈(b,c)⋈(a,c) —
    three hash joins on node keys, no neighborhood enumeration in
    driver memory. The projection self-join fans out per part's
    supplier list — hub parts are the known hazard; co-supply weight
    is therefore measured on a deterministic 1/{TRI_PART_MOD} part
    sample (feature subsampling, the standard approximate-k-NN-graph
    construction), and a per-part cap (same guard as the LSH bucket
    cap, dedup.py) bounds any residual hub at scale.
    """
    # shared construction (also kcore_suppliers, label_propagation_
    # communities); e is consumed three times by the triangle join —
    # persist it (tiny by construction: ≤ TRI_KNN·|nodes| rows) so the
    # projection + window pipeline runs once, not three times.
    e = knn_cosupply_edges(spark, sf_dir, TRI_KNN, TRI_PART_MOD).persist().transform(track_cache)
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.src") == F.col("e1.dst"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
    )
    nodes = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
