"""Round-5 pipeline operators, eleventh batch: latest-state
compaction, RFM segmentation, and k-NN label purity (embedding
quality evaluation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.functions.vector import cosine, norm_sq, sql_cosine, sql_dot
from go_map_reduce_spark.registry import query

# --------------------------------------------------------------------------
# Latest-state compaction (keep-newest per key)
# --------------------------------------------------------------------------


@query(
    "events_latest_per_user_type",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM (
      SELECT event_id, user_id, event_type, value,
             row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY epoch_us(ts) DESC, event_id DESC
             ) AS rk
      FROM events
    ) WHERE rk = 1
    """,
)
def events_latest_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-state compaction: each (user, event_type)'s NEWEST event
    — the keep-newest materialization every CDC/log table needs before
    serving point lookups (the batch twin of a streaming upsert sink's
    compaction; merge_upsert_balances applies deltas, this collapses a
    log). row_number over (ts desc, event_id desc) — the id tiebreak
    makes 'latest' total even under same-microsecond writes, which is
    exactly the determinism a re-run compaction job must have.
    One hash shuffle on the compaction key; WindowGroupLimit keeps
    per-partition state at one row per key before the exchange."""
    ev = load_table(spark, sf_dir, "events")
    rk = F.row_number().over(
        W.partitionBy("user_id", "event_type").orderBy(
            F.desc(F.unix_micros(F.col("ts").cast("timestamp"))),
            F.desc("event_id"),
        )
    )
    return (
        ev.withColumn("rk", rk)
        .where(F.col("rk") == 1)
        .select("event_id", "user_id", "event_type", "value")
    )


# --------------------------------------------------------------------------
# RFM segmentation (recency / frequency / monetary quintiles)
# --------------------------------------------------------------------------

RFM_REF_DAY = "1999-01-01"


@query(
    "rfm_customer_segments",
    oracle=f"""
    WITH rfm AS (
      SELECT o_custkey,
             date_diff('day', CAST(max(o_orderdate) AS DATE),
                       DATE '{RFM_REF_DAY}') AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
               AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey, recency_days, frequency, monetary,
             ntile(5) OVER (ORDER BY recency_days, o_custkey) AS r,
             ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f,
             ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS m
      FROM rfm
    )
    SELECT r || '-' || f || '-' || m AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(monetary AS DECIMAL(38,6))) AS DOUBLE)
             AS segment_revenue
    FROM scored GROUP BY 1
    """,
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic marketing cut: every customer scores
    1-5 on Recency (days since last order, fresher = better),
    Frequency and Monetary (quintiles, higher = better), customers
    grouped into 'r-f-m' cells with size and revenue. Three ntiles
    over the REDUCED per-customer frame (one row per customer — the
    customer_spend_deciles caveat applies: at dimension scale the
    equi-depth broadcast-edges form replaces the ranked windows,
    spend_equidepth_histogram). All tie-breaks pinned by custkey so
    cell assignment is a pure function of the data; monetary sums
    decimal; recency is whole days against a fixed reference."""
    orders = load_table(spark, sf_dir, "orders")
    rfm = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(RFM_REF_DAY).cast("date"),
            F.max(F.col("o_orderdate").cast("date")),
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .cast("double")
        .alias("monetary"),
    )
    scored = (
        rfm.withColumn(
            "r", F.ntile(5).over(W.orderBy("recency_days", "o_custkey"))
        )
        .withColumn(
            "f", F.ntile(5).over(W.orderBy(F.desc("frequency"), F.asc("o_custkey")))
        )
        .withColumn(
            "m", F.ntile(5).over(W.orderBy(F.desc("monetary"), F.asc("o_custkey")))
        )
    )
    return scored.groupBy(
        F.concat_ws("-", "r", "f", "m").alias("segment")
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("monetary").cast("decimal(38,6)"))
        .cast("double")
        .alias("segment_revenue"),
    )


# --------------------------------------------------------------------------
# k-NN label purity (embedding-quality evaluation)
# --------------------------------------------------------------------------

PURITY_K = 5
PURITY_SAMPLE_MOD = 10  # evaluate on a deterministic 1/10 query sample


# Brute-force purity is EVAL-ONLY (not registered): the all-pairs
# scoring is O(n²/sample) compute and does not survive a 100× scale-up.
# The registered tier is knn_label_purity_ann below (LSH-candidate-fed,
# bucket-bounded); this oracle string stays as the pytest cross-check's
# differential twin (tests/test_round5_pipeline18.py).
KNN_PURITY_BRUTE_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, embedding, label, {sql_dot('embedding', 'embedding')} AS nsq
      FROM embeddings
    ),
    scored AS (
      SELECT a.vec_id, a.label AS own_label, b.label AS nb_label,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY {sql_cosine('a.embedding', 'b.embedding',
                                    'a.nsq', 'b.nsq')} DESC, b.vec_id
             ) AS rk
      FROM e a JOIN e b ON a.vec_id % {PURITY_SAMPLE_MOD} = 0
                       AND b.vec_id <> a.vec_id
    )
    SELECT own_label AS label,
           CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN nb_label = own_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_same_label,
           round(SUM(CASE WHEN nb_label = own_label THEN 1.0 ELSE 0.0 END)
                 / COUNT(*), 6) AS purity
    FROM scored WHERE rk <= {PURITY_K}
    GROUP BY own_label
    """


def knn_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label purity: for every vector, how many of its
    {PURITY_K} nearest neighbors (cosine) share its label — averaged
    per label class, evaluated on a deterministic 1/{PURITY_SAMPLE_MOD}
    query sample (the standard estimator for an intrinsic metric — the
    full sweep is the identical plan at {PURITY_SAMPLE_MOD}× the cost,
    and the neighbor side always scans the FULL corpus). THE standard intrinsic embedding-quality metric
    (a good representation clusters same-class points); run per
    training snapshot it detects representation drift before any
    downstream model does. On this corpus the labels are nearly
    noise (distance concentration, see similarity2.py), so purity ≈
    1/|classes| — the metric MEASURES that honestly.

    Shape: the all-pairs scoring here is the brute-force tier (the
    corpus is the query set); at scale the same purity computes over
    ann_lsh_topk / pq_ann_topk candidates instead — the metric is
    agnostic to which neighbor generator feeds it. Per-query top-k is
    the usual window; the purity aggregate runs on k·n rows.

    EVAL-ONLY: deliberately NOT registered as a driver query — the
    registered, scale-honest tier is knn_label_purity_ann (LSH-bucket
    candidates, join work bounded by bucket size). This function stays
    as the pytest differential twin (KNN_PURITY_BRUTE_ORACLE) and the
    small-SF calibration of how much bucketing shifts the metric."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", "embedding", "label", norm_sq(F.col("embedding")).alias("nsq")
    )
    q = e.where(F.col("vec_id") % PURITY_SAMPLE_MOD == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("own_label"),
        F.col("nsq").alias("q_nsq"),
    )
    scored = e.join(F.broadcast(q), F.col("vec_id") != F.col("qid")).select(
        "qid",
        "own_label",
        F.col("label").alias("nb_label"),
        cosine(
            F.col("q_emb"), F.col("embedding"), F.col("q_nsq"), F.col("nsq")
        ).alias("cos_sim"),
        "vec_id",
    )
    rk = F.row_number().over(
        W.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    )
    top = scored.withColumn("rk", rk).where(F.col("rk") <= PURITY_K)
    same = F.when(F.col("nb_label") == F.col("own_label"), 1).otherwise(0)
    return top.groupBy(F.col("own_label").alias("label")).agg(
        F.count_distinct("qid").alias("n_vectors"),
        F.sum(same).cast("long").alias("n_same_label"),
        F.round(
            F.sum(same.cast("double")) / F.count(F.lit(1)), 6
        ).alias("purity"),
    )


# --------------------------------------------------------------------------
# ANN-fed k-NN label purity — the registered, scale-honest tier
# --------------------------------------------------------------------------

from go_map_reduce_spark.operators.dedup import (  # noqa: E402
    _SQL_SIGN_BUCKET,
    SIGN_BUCKET_DIMS,
)

# Degenerate-bucket guard for the ANN purity sweep (the analog of
# dedup.LSH_BUCKET_CAP): at most this many CANDIDATES per bucket enter
# the pair join (deterministic vec_id order — mirrored in the oracle),
# so total pair work is Σ bucket·min(bucket, cap) — linear in corpus
# size even when the {SIGN_BUCKET_DIMS}-bit bucketing degenerates.
# Queries are never dropped: a query in an over-cap bucket ranks
# against the bucket's capped candidate set.
PURITY_BUCKET_CAP = 128


@query(
    "knn_label_purity_ann",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding, label,
             {_SQL_SIGN_BUCKET} AS bucket,
             {sql_dot('embedding', 'embedding')} AS nsq
      FROM embeddings
    ),
    cand AS (
      SELECT * FROM (
        SELECT e.*, row_number() OVER (
          PARTITION BY bucket ORDER BY vec_id
        ) AS crk FROM e
      ) WHERE crk <= {PURITY_BUCKET_CAP}
    ),
    scored AS (
      SELECT q.vec_id, q.label AS own_label, c.label AS nb_label,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {sql_cosine('q.embedding', 'c.embedding',
                                    'q.nsq', 'c.nsq')} DESC, c.vec_id
             ) AS rk
      FROM e q JOIN cand c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
    )
    SELECT own_label AS label,
           CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN nb_label = own_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_same_label,
           round(SUM(CASE WHEN nb_label = own_label THEN 1.0 ELSE 0.0 END)
                 / COUNT(*), 6) AS purity
    FROM scored WHERE rk <= {PURITY_K}
    GROUP BY own_label
    """,
)
def knn_label_purity_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label purity over ANN candidates — the production tier of
    the embedding-quality metric: neighbors come from the sign-bit LSH
    bucketing (the same candidate generator as similarity.ann_lsh_topk),
    so the per-query candidate set is one bucket and the join is an
    equality hash join on the bucket key. Because the bucketing is a
    fixed {SIGN_BUCKET_DIMS}-bit code (2^{SIGN_BUCKET_DIMS} buckets), a
    degenerate corpus could still make one bucket O(corpus); the
    {PURITY_BUCKET_CAP}-candidate-per-bucket cap (deterministic vec_id
    order, mirrored in the oracle — the analog of dedup's
    LSH_BUCKET_CAP) bounds total pair work at Σ bucket·min(bucket, cap),
    linear in corpus size. EVERY vector is a query (no sampling needed:
    the bounded join makes the full sweep affordable — exactly why the
    brute-force tier above was demoted to eval-only).

    Purity semantics are identical to the brute tier: each query's
    top-{PURITY_K} bucket-mates by cosine (vec_id tiebreak), fraction
    sharing the query's label, aggregated per label class. Queries
    whose bucket holds fewer than {PURITY_K} mates contribute the
    neighbors they have (count(*) denominator) — at 100 TB that is the
    honest behavior, not an error: an empty bucket IS the index's
    answer. The pytest cross-check runs the eval-only brute tier beside
    this and pins that both report near-chance purity on this
    noise-dominated corpus (the metric measures, it does not flatter).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    bucket = F.concat(
        *[
            F.when(F.element_at("embedding", i) > 0, "1").otherwise("0")
            for i in range(1, SIGN_BUCKET_DIMS + 1)
        ]
    )
    e = emb.select(
        "vec_id",
        "embedding",
        "label",
        bucket.alias("bucket"),
        norm_sq(F.col("embedding")).alias("nsq"),
    )
    return _ann_purity(e, PURITY_BUCKET_CAP)


def _ann_purity(e: DataFrame, cap: int) -> DataFrame:
    """The capped bucket-join purity pipeline over a prepared
    (vec_id, embedding, label, bucket, nsq) frame — factored out so the
    degenerate-bucket cap path is directly testable on an adversarial
    frame (tests/test_round5_pipeline18.py)."""
    q = e.select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("own_label"),
        F.col("bucket").alias("q_bucket"),
        F.col("nsq").alias("q_nsq"),
    )
    # candidate-side bucket cap: the window partitions on the same key
    # the join shuffles on, so AQE reuses the exchange
    crk = F.row_number().over(W.partitionBy("bucket").orderBy("vec_id"))
    cand = e.withColumn("crk", crk).where(F.col("crk") <= cap).drop("crk")
    scored = cand.join(
        q,
        (F.col("bucket") == F.col("q_bucket"))
        & (F.col("vec_id") != F.col("qid")),
    ).select(
        "qid",
        "own_label",
        F.col("label").alias("nb_label"),
        cosine(
            F.col("q_emb"), F.col("embedding"), F.col("q_nsq"), F.col("nsq")
        ).alias("cos_sim"),
        "vec_id",
    )
    rk = F.row_number().over(
        W.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    )
    top = scored.withColumn("rk", rk).where(F.col("rk") <= PURITY_K)
    same = F.when(F.col("nb_label") == F.col("own_label"), 1).otherwise(0)
    return top.groupBy(F.col("own_label").alias("label")).agg(
        F.count_distinct("qid").alias("n_vectors"),
        F.sum(same).cast("long").alias("n_same_label"),
        F.round(
            F.sum(same.cast("double")) / F.count(F.lit(1)), 6
        ).alias("purity"),
    )
