"""Round-5 pipeline operators, first batch: entity-resolution fuzzy
matching, market-basket co-occurrence mining, temporal co-presence
pairing, and snapshot diffing (CDC).

All four follow the engine's candidate-generation discipline (the same
shape as dedup.py's LSH and similarity.py's bucketed ANN): never
materialize the all-pairs space — generate candidates through a
bounded-fan-out equality join, then verify exactly on the candidate
set. The DuckDB oracles are deliberately the naive quadratic
formulations, so every query is differential proof that the pruned
plan computes the textbook semantics.

The reference has no string/temporal/diff surface (its closest analog
is the wordcount/indexer pair, mrapps/wc.go:21-44); these operators
are part of the training-data-pipeline extension tier alongside
dedup.py and textstats.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.functions.numeric import dsum, sql_dsum
from go_map_reduce_spark.registry import query, track_cache

# --------------------------------------------------------------------------
# Fuzzy name matching via deletion neighborhoods (SymSpell blocking)
# --------------------------------------------------------------------------

FUZZY_MAX_DIST = 1


@query(
    "fuzzy_match_names",
    oracle=f"""
    SELECT a.c_name AS name_a, b.c_name AS name_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM customer a JOIN customer b ON a.c_name < b.c_name
    WHERE levenshtein(a.c_name, b.c_name) <= {FUZZY_MAX_DIST}
    """,
)
def fuzzy_match_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 name pairs via deletion-neighborhood blocking
    (the SymSpell/FastSS technique): each name emits itself plus its
    |name| single-character-deletion variants as join keys. Two strings
    within Levenshtein distance 1 ALWAYS share a key (substitution →
    both delete the differing position; indel → the shorter string IS a
    deletion variant of the longer), so the equality join on variant
    keys is a zero-false-negative candidate generator, and the exact
    `levenshtein` verify runs only on candidates.

    The oracle is the quadratic all-pairs join — the differential
    proof that blocking loses nothing.

    Scale shape: fan-out is |name|+1 keys per row (bounded, ~19 here) vs
    O(n²) pairs; each variant bucket is bounded by alphabet size at the
    deleted position, so bucket joins never degenerate the way a
    shared-prefix block would (every name here shares 'Customer#' — a
    prefix block would be one giant quadratic bucket). The verify step
    (`F.levenshtein`, codegen'd) touches only candidate pairs."""
    names = load_table(spark, sf_dir, "customer").select("c_name")
    # identity key + one key per deleted position: substr(1..i-1)+substr(i+1..)
    dels = F.transform(
        F.sequence(F.lit(1), F.length("c_name")),
        lambda i: F.concat(
            F.substr(F.col("c_name"), F.lit(1), i - F.lit(1)),
            F.substr(F.col("c_name"), i + F.lit(1), F.length("c_name")),
        ),
    )
    keyed = names.select(
        "c_name",
        F.explode(
            F.array_union(dels, F.array(F.col("c_name")))
        ).alias("k"),
    )
    # r15 (guide §2.4): the former a⋈b self-join shuffled the exploded
    # key frame TWICE (both join sides re-ran scan+explode — Spark
    # shares no subplans across join inputs) and ran distinct over the
    # full unverified candidate set.  One groupBy-collect shuffle on
    # the variant key replaces the join: pairs are generated INSIDE
    # each (alphabet-bounded) bucket array, with the ordering AND the
    # exact levenshtein verify applied before the explode, so the
    # distinct dedups only verified matches.  2 shuffles → 1 on the
    # corpus-sized frame (the remaining distinct runs on result-sized
    # data); same zero-false-negative candidate generation, same rows.
    buckets = keyed.groupBy("k").agg(F.collect_list("c_name").alias("ns"))
    pairs = buckets.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        "ns",
                        lambda a: F.transform(
                            "ns",
                            lambda b: F.struct(a.alias("a"), b.alias("b")),
                        ),
                    )
                ),
                lambda s: (s["a"] < s["b"])
                & (F.levenshtein(s["a"], s["b"]) <= FUZZY_MAX_DIST),
            )
        ).alias("p")
    ).select(
        F.col("p.a").alias("name_a"), F.col("p.b").alias("name_b")
    ).distinct()
    return pairs.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
    )


# --------------------------------------------------------------------------
# Market-basket pair mining (a-priori pruned co-occurrence)
# --------------------------------------------------------------------------

BASKET_MIN_SUPP = 3


def _basket_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (order, part) item frame — the input of BOTH basket
    co-occurrence queries, built once per session via
    registry.shared_frame (r15): the distinct shuffle over lineitem is
    the frame's whole cost and was paid per consumer before."""
    from go_map_reduce_spark.registry import shared_frame

    def _build() -> DataFrame:
        return (
            load_table(spark, sf_dir, "lineitem")
            .select(
                F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )

    return shared_frame(
        spark, f"basket_items:{sf_dir}", _build, data_path=sf_dir
    )


@query(
    "market_basket_pairs",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    )
    SELECT a.p AS part_a, b.p AS part_b, CAST(COUNT(*) AS BIGINT) AS support
    FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
    GROUP BY a.p, b.p
    HAVING COUNT(*) >= {BASKET_MIN_SUPP}
    """,
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent co-purchased part pairs (support ≥ {BASKET_MIN_SUPP}
    orders) — the candidate-generation step of association-rule mining.

    A-priori pruning before the pairwise step: a pair can only reach
    support s if BOTH items do, so items below the threshold are
    dropped by a broadcast semi-join BEFORE the self-join fans out.
    On a skewed real catalog this is the difference between joining
    the long tail (most items, little co-occurrence) and not.

    Scale shape: the self-join key is the order id, so fan-out per
    order is C(lines, 2) — bounded by basket size (~7 for this
    schema), never by catalog size; pair support counting is one
    map-side-combinable shuffle on the pair key. The oracle is the
    unpruned quadratic formulation — differential proof the broadcast
    prune drops nothing above threshold."""
    # items feeds the frequency prune AND (through pruned) both
    # self-join sides — and the co-occurrence query builds the very
    # same frame.  r15: one shared_frame build per session (was: one
    # persist per query, re-running the scan + distinct shuffle for
    # each of the two basket queries and, under memo-aware reps, per
    # repetition).
    items = _basket_items(spark, sf_dir)
    freq = (
        items.groupBy("p")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= BASKET_MIN_SUPP)
        .select("p")
    )
    pruned = items.join(F.broadcast(freq), "p", "left_semi")
    a = pruned.select("o", F.col("p").alias("part_a"))
    b = pruned.select("o", F.col("p").alias("part_b"))
    return (
        a.join(b, ["o"])
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= BASKET_MIN_SUPP)
    )


# --------------------------------------------------------------------------
# Temporal co-presence pairs (bucketed interval self-join)
# --------------------------------------------------------------------------

COPRESENCE_WINDOW_US = 300_000_000  # 5 minutes, in microseconds


@query(
    "events_copresence_pairs",
    oracle=f"""
    WITH pur AS (
      SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT DISTINCT least(a.user_id, b.user_id) AS u1,
                    greatest(a.user_id, b.user_id) AS u2
    FROM pur a JOIN pur b
      ON a.user_id <> b.user_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {COPRESENCE_WINDOW_US}
    """,
)
def events_copresence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct user pairs who purchased within 5 minutes of each other
    — the co-occurrence/collusion-detection shape (shared-session
    inference, fraud rings, bot clusters).

    The oracle is the naive interval self-join (a full quadratic time
    predicate); the Spark plan buckets time into window-width cells and
    equi-joins on the cell id: one side keeps its cell, the other emits
    (cell, cell+1), so every pair within the window lands in exactly
    one-or-two equality matches and the time predicate only verifies
    candidates. This converts an unbounded theta-join (a
    BroadcastNestedLoopJoin at best) into a hash join whose per-bucket
    cost is the local event density — the standard scalable interval
    join, same pattern as range_join_price_bands (advanced.py) but on
    the time axis. Microsecond integer arithmetic end-to-end: no float
    comparisons, both engines agree exactly."""
    pur = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            # ts is TIMESTAMP_NTZ; the session TZ is pinned to UTC
            # (session.py), so the cast is the identity embedding and
            # unix_micros matches DuckDB's epoch_us on the naive value.
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        )
    )
    bucketed = pur.withColumn(
        "cell", F.floor(F.col("us") / COPRESENCE_WINDOW_US)
    )
    a = bucketed.select(
        F.col("user_id").alias("ua"), F.col("us").alias("ta"), "cell"
    )
    b = bucketed.select(
        F.col("user_id").alias("ub"),
        F.col("us").alias("tb"),
        F.explode(F.array(F.col("cell"), F.col("cell") + 1)).alias("cell"),
    )
    return (
        a.join(b, ["cell"])
        .where(
            (F.col("ua") != F.col("ub"))
            & (F.abs(F.col("ta") - F.col("tb")) <= COPRESENCE_WINDOW_US)
        )
        .select(
            F.least("ua", "ub").alias("u1"),
            F.greatest("ua", "ub").alias("u2"),
        )
        .distinct()
    )


# --------------------------------------------------------------------------
# Snapshot diff (CDC): classify added / removed / changed rows
# --------------------------------------------------------------------------


def _snapshot_v2(cust: DataFrame) -> DataFrame:
    """Deterministic second snapshot: rows with custkey%13==0 deleted,
    acctbal bumped +100 where custkey%7==0, and a cloned insert (key
    offset by 1e12, balance reset) for custkey%17==0."""
    survivors = cust.where(F.col("c_custkey") % 13 != 0).withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 100.0
        ).otherwise(F.col("c_acctbal")),
    )
    # insert-clone keys offset by 1e12: beyond any customer key at any
    # realistic SF (150k×SF), so simulated inserts can never collide
    # with a real primary key and corrupt the classification
    inserts = cust.where(F.col("c_custkey") % 17 == 0).select(
        (F.col("c_custkey") + 1_000_000_000_000).alias("c_custkey"),
        "c_name",
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        "c_mktsegment",
    )
    return survivors.unionByName(inserts)


_SQL_V2 = """
  SELECT c_custkey, c_name, c_nationkey,
         CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
              ELSE c_acctbal END AS c_acctbal,
         c_mktsegment
  FROM customer WHERE c_custkey % 13 <> 0
  UNION ALL
  SELECT c_custkey + 1000000000000, c_name, c_nationkey, 0.0, c_mktsegment
  FROM customer WHERE c_custkey % 17 = 0
"""


@query(
    "snapshot_diff_customers",
    oracle=f"""
    WITH v2 AS ({_SQL_V2})
    SELECT COALESCE(v1.c_custkey, v2.c_custkey) AS c_custkey,
           CASE WHEN v1.c_custkey IS NULL THEN 'added'
                WHEN v2.c_custkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type
    FROM customer v1 FULL OUTER JOIN v2 ON v1.c_custkey = v2.c_custkey
    WHERE v1.c_custkey IS NULL OR v2.c_custkey IS NULL
       OR v1.c_name IS DISTINCT FROM v2.c_name
       OR v1.c_nationkey IS DISTINCT FROM v2.c_nationkey
       OR v1.c_acctbal IS DISTINCT FROM v2.c_acctbal
       OR v1.c_mktsegment IS DISTINCT FROM v2.c_mktsegment
    """,
)
def snapshot_diff_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the change-data-capture primitive behind audit
    trails and incremental downstream refresh: classify every key as
    added / removed / changed between two table versions (v2 simulated
    deterministically from v1; in production both sides are reads of
    two snapshot paths — same plan).

    Scale shape: one full outer join keyed on the primary key — at
    100 TB both snapshots would be written bucketed by key
    (sources/bucketed.py) making this a zero-shuffle sort-merge join.
    Unchanged rows (the overwhelming majority of any real diff) are
    dropped by the null-safe column comparison before anything else
    consumes the frame. IS DISTINCT FROM (`<=>` negation) handles
    NULLs exactly as the oracle does; the double comparison is exact
    (+100.0 perturbs well above ulp)."""
    cust = load_table(spark, sf_dir, "customer")
    v2 = _snapshot_v2(cust)
    v1a = cust.alias("v1")
    v2a = v2.alias("v2")
    joined = v1a.join(
        v2a, F.col("v1.c_custkey") == F.col("v2.c_custkey"), "full_outer"
    )
    same = (
        F.col("v1.c_name").eqNullSafe(F.col("v2.c_name"))
        & F.col("v1.c_nationkey").eqNullSafe(F.col("v2.c_nationkey"))
        & F.col("v1.c_acctbal").eqNullSafe(F.col("v2.c_acctbal"))
        & F.col("v1.c_mktsegment").eqNullSafe(F.col("v2.c_mktsegment"))
    )
    return (
        joined.where(
            F.col("v1.c_custkey").isNull()
            | F.col("v2.c_custkey").isNull()
            | ~same
        )
        .select(
            F.coalesce(F.col("v1.c_custkey"), F.col("v2.c_custkey")).alias(
                "c_custkey"
            ),
            F.when(F.col("v1.c_custkey").isNull(), "added")
            .when(F.col("v2.c_custkey").isNull(), "removed")
            .otherwise("changed")
            .alias("change_type"),
        )
    )


# --------------------------------------------------------------------------
# Decile segmentation (ntile) over customer lifetime spend
# --------------------------------------------------------------------------

N_DECILES = 10


@query(
    "customer_spend_deciles",
    oracle=f"""
    WITH spend AS (
      SELECT o_custkey, {sql_dsum('o_totalprice')} AS spend
      FROM orders GROUP BY o_custkey
    ),
    tiled AS (
      SELECT o_custkey, spend,
             ntile({N_DECILES}) OVER (ORDER BY spend DESC, o_custkey) AS decile
      FROM spend
    )
    SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
           min(spend) AS min_spend, max(spend) AS max_spend,
           {sql_dsum('spend')} AS total_spend
    FROM tiled GROUP BY decile
    """,
)
def customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer decile segmentation: ntile({N_DECILES}) over lifetime
    spend (desc, custkey tiebreak — a total order, so tile boundaries
    are deterministic), then per-decile size and spend range — the
    marketing/LTV cut, and the ntile row of the window-function
    surface (rank/dense_rank/lag/frames live in functions_depth.py).

    Scale shape: per-customer spend is one map-side-combinable shuffle;
    the global ntile is a single-partition window over the CUSTOMER
    frame (one row per customer — the already-reduced side), not over
    orders. For a customer dimension too large for one partition, the
    same cut comes from a 2-pass percentile bracket (quantile summary →
    broadcast bin edges), the approx_quantiles_sketch machinery; the
    exact single-window form is right while the reduced frame fits a
    partition. Spend sums are exact decimal (dsum) — bit-stable decile
    boundaries across engines."""
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(dsum(F.col("o_totalprice")).alias("spend"))
    )
    tiled = spend.withColumn(
        "decile",
        F.ntile(N_DECILES).over(W.orderBy(F.desc("spend"), F.asc("o_custkey"))),
    )
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("spend").alias("min_spend"),
        F.max("spend").alias("max_spend"),
        dsum(F.col("spend")).alias("total_spend"),
    )
