"""Round-6 pipeline operators, third batch: family completions and
pipeline-audit reports.

- Forward as-of join: each order's FIRST event at-or-after it —
  closes the as-of direction family (backward / backward+tolerance /
  nearest already registered in advanced.py / pipeline17.py). The
  direction runs order→event because this corpus's events all
  postdate its orders: the event→order direction would be vacuous
  (every match null), and a query whose matches can never fire is
  padding, not coverage.
- Packing efficiency report: tail waste and document fragmentation of
  the concat-and-chunk sequence packer — the audit that decides
  whether to switch to best-fit packing.
- Dedup cluster-size histogram: the curator's report over the
  connected-component clusters (how much does dedup actually save,
  and is the mass in pairs or in mega-clusters?).

Composition queries import tier functions directly (package
convention: never registry string keys — the staleness closure must
see the edges)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.operators.advanced import dedup_clusters_largestar
from go_map_reduce_spark.operators.textstats import (
    PACK_BUDGET,
    sequence_packing,
)
from go_map_reduce_spark.registry import ORACLES, query

# --------------------------------------------------------------------------
# Forward as-of join (first event at or after each order)
# --------------------------------------------------------------------------


@query(
    "asof_join_forward",
    oracle="""
    WITH e AS (
      SELECT * FROM (
        SELECT user_id, ts, event_id,
               row_number() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
           e.event_id AS next_event_id,
           CAST(e.ts AS TIMESTAMP) AS next_event_ts
    FROM orders o
    ASOF LEFT JOIN e ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    """,
)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each order's FIRST event at or after its
    order date — the attribution direction ("what did the customer do
    next"), completing the as-of family (backward, backward+tolerance,
    nearest). Same union-sort trick as asof_join_user_orders
    (advanced.py) mirrored in time: orders (probe) tag 0, events
    (build, deduped per (user, ts) keeping the max event_id so the
    match is unambiguous) tag 1, sort (key, time, tag), and a
    forward-looking `first(..., ignorenulls)` frame (currentRow →
    unboundedFollowing) carries the NEXT event's attributes back onto
    each order. Equal timestamps: the order's tag sorts first, so
    o_orderdate <= ts is inclusive — exactly ASOF's <=.

    Shuffle profile: ONE hash shuffle on the key + per-partition sort,
    identical to the backward variant; the oracle is DuckDB's native
    forward ASOF LEFT JOIN, an independent implementation."""
    ev = load_table(spark, sf_dir, "events")
    wdedup = W.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    e = (
        ev.withColumn("_rn", F.row_number().over(wdedup))
        .where(F.col("_rn") == 1)
        .select(
            F.col("user_id").alias("k"),
            F.col("ts").alias("t"),
            "event_id",
            F.col("ts").alias("ev_ts"),
            F.lit(1).alias("tag"),
        )
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        "o_orderkey",
        F.lit(0).alias("tag"),
    )
    u = o.unionByName(e, allowMissingColumns=True)
    w = (
        W.partitionBy("k")
        .orderBy("t", "tag")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = u.select(
        "*",
        F.first("event_id", ignorenulls=True).over(w).alias("next_event_id"),
        F.first("ev_ts", ignorenulls=True).over(w).alias("next_event_ts"),
    )
    return carried.where(F.col("tag") == 0).select(
        "o_orderkey",
        F.col("k").alias("o_custkey"),
        F.col("t").alias("o_orderdate"),
        "next_event_id",
        "next_event_ts",
    )


# --------------------------------------------------------------------------
# Packing efficiency report
# --------------------------------------------------------------------------


@query(
    "packing_efficiency_report",
    oracle=f"""
    WITH packed AS ({ORACLES["sequence_packing"]})
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST((SUM(n_tokens) + {PACK_BUDGET - 1}) // {PACK_BUDGET}
                AS BIGINT) AS n_seqs,
           CAST((SUM(n_tokens) + {PACK_BUDGET - 1}) // {PACK_BUDGET}
                * {PACK_BUDGET} - SUM(n_tokens) AS BIGINT) AS tail_waste,
           CAST(COUNT(*) FILTER (n_tokens > 0
                AND off_in_seq + n_tokens > {PACK_BUDGET}) AS BIGINT)
             AS n_split_docs,
           round(CAST(COUNT(*) FILTER (n_tokens > 0
                AND off_in_seq + n_tokens > {PACK_BUDGET}) AS DOUBLE)
                / COUNT(*), 6) AS split_frac
    FROM packed
    GROUP BY shard
    """,
)
def packing_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit of the concat-and-chunk packer (sequence_packing): per
    shard, sequence count, tail waste (concat-and-chunk only wastes
    tokens in the final partial sequence), and — the number that
    matters for training quality — how many documents STRADDLE a
    sequence boundary (a doc whose in-sequence offset plus length
    exceeds {PACK_BUDGET} gets split across training sequences,
    fragmenting attention). High split_frac is the signal to move to
    best-fit-decreasing packing; this report is how you decide.

    100 TB shape: composes the registered packer (one shard-local
    window) and adds one shard-keyed aggregate — no new data-sized
    shuffle beyond the packer's own. All-integer arithmetic plus one
    final division."""
    packed = sequence_packing(spark, sf_dir)
    split = (
        (F.col("n_tokens") > 0)
        & (F.col("off_in_seq") + F.col("n_tokens") > PACK_BUDGET)
    ).cast("long")
    n_seqs = F.floor(
        (F.sum("n_tokens") + (PACK_BUDGET - 1)) / PACK_BUDGET
    ).cast("long")
    return packed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        n_seqs.alias("n_seqs"),
        (n_seqs * PACK_BUDGET - F.sum("n_tokens")).alias("tail_waste"),
        F.sum(split).alias("n_split_docs"),
        F.round(F.sum(split).cast("double") / F.count(F.lit(1)), 6).alias(
            "split_frac"
        ),
    )


# --------------------------------------------------------------------------
# Dedup cluster-size histogram
# --------------------------------------------------------------------------


@query(
    "dedup_cluster_size_histogram",
    oracle=f"""
    WITH clusters AS ({ORACLES["dedup_clusters_largestar"]}),
    sized AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS size
      FROM clusters GROUP BY cluster_id
    )
    SELECT size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(COUNT(*) * (size - 1) AS BIGINT) AS docs_removable
    FROM sized
    GROUP BY size
    """,
)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup curator's report: cluster-size distribution of the
    connected-component near-dup clusters, with how many documents
    each size class would remove under keep-one-per-cluster. Answers
    the two questions a 100 TB dedup owner asks before committing a
    cut: how much does dedup save (Σ docs_removable), and is the mass
    in pairs (benign near-dups) or in mega-clusters (template/
    boilerplate — route those to lsh_template_clusters handling
    instead of pairwise verification)?

    100 TB shape: composes the registered LARGESTAR cluster operator
    (Kiveris et al. large-star/small-star, O(log n) rounds — the
    scale path; the O(diameter) min-label variant produces identical
    assignments), then two tiny keyed aggregates over the cluster
    assignment — the histogram is bounded by the number of distinct
    cluster sizes, not the corpus."""
    clusters = dedup_clusters_largestar(spark, sf_dir)
    sized = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("size")
    )
    return sized.groupBy("size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.count(F.lit(1)) * (F.col("size") - 1)).alias("docs_removable"),
    )
