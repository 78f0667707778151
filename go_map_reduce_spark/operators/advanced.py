"""Advanced operators: as-of join, range join, iterative graph dedup
clusters, and a grouped-map (applyInPandas) statistical operator.

These cover the "operators Spark lacks natively" tier of the blueprint:
each is a *composition* of DataFrame primitives chosen for its shuffle
profile at 100 TB, with the DuckDB oracle using that engine's native
formulation (ASOF JOIN, recursive CTE) — so the compositions are
differentially tested against independent first-class implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.functions.numeric import dsum, sql_dsum
from go_map_reduce_spark.operators import dedup as _dedup  # noqa: F401  (oracle reuse)
from go_map_reduce_spark.registry import query, shared_frame


def _dedup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One order per (custkey, orderdate): the as-of build side must be
    unique on (key, time) or 'the latest order at time t' is ambiguous
    (both engines would then pick arbitrary rows). Keep the max
    orderkey's row — deterministic in both formulations."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey", "o_orderdate").orderBy(F.desc("o_orderkey"))
    return (
        orders.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


_SQL_DEDUP_ORDERS = """
  SELECT * FROM (
    SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey, o_orderdate
                              ORDER BY o_orderkey DESC) AS rn
    FROM orders
  ) WHERE rn = 1
"""


@query(
    "asof_join_user_orders",
    oracle=f"""
    WITH o AS ({_SQL_DEDUP_ORDERS})
    SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
           o.o_orderkey AS last_orderkey,
           o.o_totalprice AS last_totalprice
    FROM events e
    ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def asof_join_user_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (most recent order at or before each event), an
    operator Spark lacks natively, composed as the union-sort trick:

    union orders (tagged 0) and events (tagged 1) on (key, time), then a
    running `last(..., ignorenulls)` window ordered by (time, tag)
    carries the latest order's attributes forward onto each event row.

    Shuffle profile: ONE hash shuffle on the key + per-partition sort —
    identical to a sort-merge join, with no range-explosion. The
    equal-timestamp case is well-defined: tag 0 sorts before tag 1, so
    t >= o_orderdate is inclusive, matching ASOF's >= exactly. The
    oracle is DuckDB's native ASOF LEFT JOIN — an independent
    implementation of the same semantics.
    """
    o = _dedup_orders(spark, sf_dir).select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        "o_orderkey",
        "o_totalprice",
        F.lit(0).alias("tag"),
    )
    e = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        "event_id",
        F.lit(1).alias("tag"),
    )
    u = o.unionByName(e, allowMissingColumns=True)
    w = (
        W.partitionBy("k")
        .orderBy("t", "tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = u.select(
        "*",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("last_orderkey"),
        F.last("o_totalprice", ignorenulls=True).over(w).alias("last_totalprice"),
    )
    return carried.where(F.col("tag") == 1).select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("t").alias("ts"),
        "last_orderkey",
        "last_totalprice",
    )


ASOF_TOLERANCE_DAYS = 30


@query(
    "asof_join_tolerance",
    oracle=f"""
    WITH o AS ({_SQL_DEDUP_ORDERS})
    SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
           CASE WHEN e.ts <= o.o_orderdate + INTERVAL {ASOF_TOLERANCE_DAYS} DAY
                THEN o.o_orderkey END AS last_orderkey,
           CASE WHEN e.ts <= o.o_orderdate + INTERVAL {ASOF_TOLERANCE_DAYS} DAY
                THEN o.o_totalprice END AS last_totalprice
    FROM events e
    ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness TOLERANCE — the feature-store knob:
    an event only inherits its user's most recent order if that order is
    at most {ASOF_TOLERANCE_DAYS} days old; staler matches null out
    (pandas.merge_asof's `tolerance`, absent from both Spark and plain
    ASOF SQL).

    Same union-sort single-shuffle shape as asof_join_user_orders, with
    the matched order's TIMESTAMP carried alongside its attributes so
    the staleness test is one row-local comparison after the window —
    the tolerance adds zero extra shuffles. (A forward as-of — first
    order AT/after the event — is the same construction with the window
    ordered descending.) The oracle applies the identical staleness CASE
    on top of DuckDB's native ASOF join."""
    o = _dedup_orders(spark, sf_dir).select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        "o_orderkey",
        "o_totalprice",
        F.lit(0).alias("tag"),
    )
    e = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        "event_id",
        F.lit(1).alias("tag"),
    )
    u = o.unionByName(e, allowMissingColumns=True).withColumn(
        "order_t", F.when(F.col("tag") == 0, F.col("t"))
    )
    w = (
        W.partitionBy("k")
        .orderBy("t", "tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = u.select(
        "*",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("last_orderkey"),
        F.last("o_totalprice", ignorenulls=True).over(w).alias("last_totalprice"),
        F.last("order_t", ignorenulls=True).over(w).alias("last_order_t"),
    )
    fresh = F.col("t") <= F.col("last_order_t") + F.expr(
        f"INTERVAL {ASOF_TOLERANCE_DAYS} DAYS"
    )
    return carried.where(F.col("tag") == 1).select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("t").alias("ts"),
        F.when(fresh, F.col("last_orderkey")).alias("last_orderkey"),
        F.when(fresh, F.col("last_totalprice")).alias("last_totalprice"),
    )


PRICE_BANDS = [
    ("band_0_100k", 0.0, 100_000.0),
    ("band_100k_200k", 100_000.0, 200_000.0),
    ("band_200k_300k", 200_000.0, 300_000.0),
    ("band_300k_400k", 300_000.0, 400_000.0),
    ("band_400k_up", 400_000.0, 1e18),
]

_SQL_BANDS_VALUES = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in PRICE_BANDS)


@query(
    "range_join_price_bands",
    oracle=f"""
    WITH bands(band, lo, hi) AS (VALUES {_SQL_BANDS_VALUES})
    SELECT band, COUNT(*) AS n_orders, {sql_dsum('o_totalprice')} AS total
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: orders matched to price bands by a
    non-equi condition. The band side is broadcast, so the plan is a
    BroadcastNestedLoopJoin over 5 rows — the right strategy whenever
    the interval dimension is small. (When BOTH sides are large, the
    scale pattern is bucketize-the-range-key → equi-join on bucket →
    residual filter; not needed for a 5-row dimension.)"""
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(PRICE_BANDS, "band string, lo double, hi double")
    return (
        orders.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo"))
            & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total"),
        )
    )


def _pairs_oracle_sql() -> str:
    """The already-registered (and independently oracle-checked) minhash
    near-dup SQL, inlined as a derived table so this oracle is fully
    self-contained over the driver's base views."""
    from go_map_reduce_spark.registry import ORACLES

    return ORACLES["minhash_near_dup_pairs"]


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE
    pairs AS (SELECT doc_a, doc_b FROM ({_pairs_oracle_sql()})),
    sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs),
    reach(a, b) AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    )
    SELECT a AS doc_id, least(a, min(b)) AS cluster_id
    FROM reach GROUP BY a
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the verified
    minhash pair graph via iterative min-label propagation — the
    iterative-algorithm tier (each round: join labels to edges, take the
    min neighbor label, until fixpoint). Converges in O(component
    diameter) rounds; near-dup components are shallow (template
    clusters), so rounds stay single-digit even at corpus scale. The
    industrial-scale variant swaps the propagation step for
    Hash-to-Min's doubling (public literature) — same per-round plan.

    Oracle: transitive closure by recursive CTE over the same pair set
    (whose SQL is inlined from the independently-checked
    minhash_near_dup_pairs oracle, so this oracle is self-contained
    over the driver's base views).
    """
    from go_map_reduce_spark.operators.dedup import minhash_near_dup_pairs

    # r15: the label frame is memoized via registry.shared_frame (the
    # largestar tier's convention applied to the propagation tier):
    # near_dup_survivors and semantic_dedup_survivors compose on these
    # labels and each used to re-run the whole propagation loop.  The
    # build is billed to the first consumer (memo-aware bench reps).
    def _build() -> DataFrame:
        # localCheckpoint (not just persist): each round's plan would
        # otherwise embed every previous round, so planning cost grows
        # per iteration; checkpointing truncates the lineage and keeps
        # per-round cost constant. (On a cluster with HDFS, `checkpoint()`
        # — reliable storage — replaces localCheckpoint.)
        pairs = (
            minhash_near_dup_pairs(spark, sf_dir)
            .select("doc_a", "doc_b")
            .localCheckpoint(eager=True)
        )
        sym = pairs.union(
            pairs.select(
                F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
            )
        ).localCheckpoint(eager=True)
        labels = (
            sym.select(F.col("doc_a").alias("doc_id"))
            .distinct()
            .select("doc_id", F.col("doc_id").alias("cluster_id"))
            .localCheckpoint(eager=True)
        )
        edges = sym.select(
            F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("nbr")
        )
        while True:
            nbr_min = (
                edges.join(labels, edges.nbr == labels.doc_id)
                .groupBy(edges.doc_id.alias("doc_id"))
                .agg(F.min("cluster_id").alias("nbr_label"))
            )
            new_labels = (
                labels.join(nbr_min, "doc_id", "left")
                .select(
                    "doc_id",
                    F.least(
                        "cluster_id", F.coalesce("nbr_label", "cluster_id")
                    ).alias("cluster_id"),
                )
                .localCheckpoint(eager=True)
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "doc_id")
                .where(F.col("n.cluster_id") != F.col("o.cluster_id"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        return labels

    return shared_frame(
        spark, f"clusters_prop:{sf_dir}", _build, data_path=sf_dir
    )


@query(
    "dedup_clusters_largestar",
    oracle=f"""
    WITH RECURSIVE
    pairs AS (SELECT doc_a, doc_b FROM ({_pairs_oracle_sql()})),
    sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs),
    reach(a, b) AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    )
    SELECT a AS doc_id, least(a, min(b)) AS cluster_id
    FROM reach GROUP BY a
    """,
)
def dedup_clusters_largestar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components via alternating large-star / small-star —
    the O(log n)-round algorithm (Kiveris et al. 2014, "Connected
    Components in MapReduce and Beyond"; public literature) that
    replaces dedup_clusters' O(diameter) min-label propagation at
    scale.

    Each half-round is ONE shuffle: group the symmetrized edge list by
    node, take m = min(neighborhood ∪ self), and EMIT the re-pointed
    edges — the emissions REPLACE the edge set (true contraction: the
    frame shrinks toward one parent pointer per node, never
    accumulates), with small-star also emitting each node's own
    (u, m) pointer so non-roots stay attached as their original edges
    drop. Alternating the two contracts every component to a star
    rooted at its minimum in logarithmically many rounds regardless of
    diameter — the property propagation lacks on chain-shaped
    components; convergence is checked by edge-set equality and a
    non-convergent run raises rather than emitting wrong labels.
    Same verified-pair input, same output contract, same
    recursive-CTE oracle as dedup_clusters; registered separately so
    both round-complexity tiers stay independently gated. Validated
    four ways: DuckDB transitive-closure oracle, label agreement with
    the propagation tier, a diameter-63 chain, and random graphs vs a
    sequential union-find.

    The cluster assignment is the frame a whole curation pipeline
    composes on (size histogram, keep-best selection, leakage-safe
    split, the e2e capstone), so it is built ONCE per SparkContext via
    registry.shared_frame: at 100 TB cluster assignments materialize
    once and every downstream stage reads them; re-deriving the
    LSH->verify->large-star pipeline per consumer would multiply its
    cost by the consumer count. The memoized lineage ends in the eager
    localCheckpoint blocks _cc_largestar already writes, so reuse is a
    block read; standalone runs build on first call, and semantics are
    unchanged (the builder is deterministic)."""
    from go_map_reduce_spark.operators.dedup import minhash_near_dup_pairs

    def _build() -> DataFrame:
        pairs = (
            minhash_near_dup_pairs(spark, sf_dir)
            .select("doc_a", "doc_b")
            .localCheckpoint(eager=True)
        )
        # final label extraction re-runs per reuse, but over checkpointed
        # nodes/edges blocks — cheap; checkpoint once more so even that
        # join is paid a single time per context.
        return _cc_largestar(pairs).localCheckpoint(eager=True)

    return shared_frame(
        spark, f"clusters_largestar:{sf_dir}", _build, data_path=sf_dir
    )


def _cc_largestar(pairs: DataFrame) -> DataFrame:
    """Large-star/small-star core over any (doc_a, doc_b) pair frame
    (synthetic deep-chain graphs in tests drive this directly)."""
    nodes = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select("doc_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Symmetric, self-loop-free, distinct edge list (u, v).
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .union(pairs.select(F.col("doc_b"), F.col("doc_a")))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def star(e: DataFrame, large: bool) -> DataFrame:
        """One star half-round, emission-only (the paper's contraction:
        the OUTPUT REPLACES the edge set, it does not accumulate).
        Neighborhoods are computed over the symmetrized list; large-star
        re-points only larger neighbors at m = min(N(u) ∪ {u}),
        small-star re-points the rest AND u itself (the self-pointer
        emission is what keeps every non-root attached while original
        edges are dropped). Self-loops are filtered — roots are covered
        by the separate `nodes` frame at label extraction."""
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.min("u")).alias("m")  # min(N(u) ∪ {u})
        )
        cond = F.col("v") > F.col("u") if large else F.col("v") <= F.col("u")
        repointed = (
            sym.join(m, "u")
            .where(cond)
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        out = repointed if large else repointed.union(m.select("u", "m"))
        return (
            out.where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )

    converged = False
    for _ in range(20):  # ≥ log₂(max id) with slack; components shallow
        nxt = star(star(edges, large=True), large=False)
        if (
            nxt.exceptAll(edges).limit(1).count() == 0
            and edges.exceptAll(nxt).limit(1).count() == 0
        ):
            converged = True
            break
        edges = nxt
    if not converged:  # fail loudly rather than emit wrong labels
        raise RuntimeError("large-star/small-star did not converge")
    labels = (
        edges.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select(
            F.col("u").alias("doc_id"),
            F.least("u", "mn").alias("cluster_id"),
        )
    )
    # Star roots label themselves; nodes isolated by contraction too.
    return (
        nodes.join(labels, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
        )
    )


def _zscore_group(pdf):
    """Per-language z-scores of document length. Determinism: mean and
    variance come from EXACT integer sums (n_chars is int64), so the
    only float ops are the final divisions/sqrt — one fixed sequence per
    group, bit-identical to the oracle's formulation of the same
    expressions."""
    import math

    import pandas as pd

    s = int(pdf["n_chars"].sum())
    ss = int((pdf["n_chars"].astype(object) ** 2).sum())
    n = len(pdf)
    mean = s / n
    var = (ss - (s * s) / n) / n
    sd = math.sqrt(var)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "lang": pdf["lang"],
            "n_chars": pdf["n_chars"],
            "z": [(float(x) - mean) / sd for x in pdf["n_chars"]],
        }
    )


@query(
    "doc_length_zscores",
    oracle="""
    WITH stats AS (
      SELECT lang,
             SUM(n_chars) AS s,
             SUM(n_chars * n_chars) AS ss,
             COUNT(*) AS n
      FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang, d.n_chars,
           (CAST(d.n_chars AS DOUBLE) - CAST(s AS DOUBLE) / n)
             / sqrt((CAST(ss AS DOUBLE) - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / n) / n)
             AS z
    FROM documents d JOIN stats USING (lang)
    """,
)
def doc_length_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map operator (applyInPandas): per-language z-scores of
    document length — the per-group pandas escape hatch for logic that
    doesn't decompose into SQL aggregates (here it does, which is
    exactly what makes it oracle-checkable; real uses are model scoring
    or library calls per group). Arrow-batched; one shuffle on the group
    key; groups must fit an executor's memory — the documented
    constraint of the grouped-map path."""
    from go_map_reduce_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return docs.groupBy("lang").applyInPandas(
        _zscore_group, schema="doc_id long, lang string, n_chars long, z double"
    )


@query(
    "merge_upsert_balances",
    oracle="""
    WITH current AS (
      SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
      WHERE c_custkey % 2 = 0
    ),
    updates AS (
      SELECT o_custkey AS c_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / 1000
               AS delta
      FROM orders GROUP BY o_custkey
    )
    SELECT c.c_custkey, c.c_acctbal + u.delta AS c_acctbal,
           c.c_mktsegment, 'update' AS op
    FROM current c JOIN updates u ON c.c_custkey = u.c_custkey
    UNION ALL
    SELECT u.c_custkey, u.delta, 'UNKNOWN', 'insert'
    FROM updates u WHERE NOT EXISTS
      (SELECT 1 FROM current c WHERE c.c_custkey = u.c_custkey)
    UNION ALL
    SELECT c.c_custkey, c.c_acctbal, c.c_mktsegment, 'carry'
    FROM current c WHERE NOT EXISTS
      (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
    """,
)
def merge_upsert_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation (CDC upsert without a lakehouse format):
    matched rows updated, unmatched update rows inserted, untouched
    target rows carried — expressed as inner join + anti-join + anti-join
    + union, the plan MERGE compiles to anyway. Target = even-custkey
    customers, updates = per-customer order deltas, so all three MERGE
    branches are non-empty. On Delta/Iceberg the same logic is one
    MERGE statement; the emulation is the jar-free equivalent (noted in
    the pyspark guide's CDC row)."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") % 2 == 0
    ).select("c_custkey", "c_acctbal", "c_mktsegment")
    updates = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            (
                F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double")
                / 1000
            ).alias("delta")
        )
    )
    updated = (
        cust.join(updates, "c_custkey")
        .select(
            "c_custkey",
            (F.col("c_acctbal") + F.col("delta")).alias("c_acctbal"),
            "c_mktsegment",
            F.lit("update").alias("op"),
        )
    )
    inserted = (
        updates.join(cust, "c_custkey", "left_anti")
        .select(
            "c_custkey",
            F.col("delta").alias("c_acctbal"),
            F.lit("UNKNOWN").alias("c_mktsegment"),
            F.lit("insert").alias("op"),
        )
    )
    carried = (
        cust.join(updates, "c_custkey", "left_anti")
        .select("c_custkey", "c_acctbal", "c_mktsegment", F.lit("carry").alias("op"))
    )
    return updated.unionByName(inserted).unionByName(carried)
