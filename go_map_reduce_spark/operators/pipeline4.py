"""Round-4 pipeline operators: deterministic weighted sampling and a
scale-safe 2-D skyline (Pareto front).

Both extend the engine's reproducible-selection discipline
(deterministic_sample_orders, training_shard_assignment): every
pseudorandom choice is a pure function of row identity (md5), so
results are identical across runs, retries, partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.registry import query

WS_SAMPLE_K = 100
_MD5_SPAN = 16**7  # 7 hex chars → [0, 16^7)


@query(
    "weighted_sample_docs",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))
                   AS BIGINT) + 1.0) / {_MD5_SPAN + 1} AS u
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
           round(ln(u), 6) / n_chars AS es_key
    FROM keyed
    ORDER BY es_key DESC, doc_id
    LIMIT {WS_SAMPLE_K}
    """,
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis 2006):
    each row draws u ∈ (0,1] and ranks by u^(1/w) — equivalently
    ln(u)/w — so inclusion probability is proportional to weight
    (here n_chars: longer documents sampled more). The classic use:
    length-proportional subcorpus selection for training mixes.

    Deterministic: u derives from md5(doc_id) (same 7-hex-digit prefix
    convention as training_shard_assignment), ln is 6dp-rounded, the
    divide is one IEEE op — both engines produce bit-identical keys.

    Scale: key computation is map-side; the top-K is
    TakeOrderedAndProject (per-partition heaps + driver merge of K
    rows), the same no-global-sort shape as every top-k here. One pass,
    zero shuffles."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 7), 16, 10)
        .cast("double")
        + 1.0
    ) / (_MD5_SPAN + 1)
    es_key = F.round(F.log(u), 6) / F.col("n_chars")
    return (
        docs.where(F.col("n_chars") > 0)
        .select(
            "doc_id",
            F.col("n_chars").cast("long").alias("weight"),
            es_key.alias("es_key"),
        )
        .orderBy(F.desc("es_key"), "doc_id")
        .limit(WS_SAMPLE_K)
    )


@query(
    "skyline_parts",
    oracle="""
    SELECT p_partkey, CAST(p_size AS INT) AS p_size, p_retailprice
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
)
def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto front): parts where no other part is at once
    cheaper-or-equal AND larger-or-equal (strict somewhere) — the
    multi-objective shortlist operator (price↓, size↑).

    The oracle is the textbook quadratic NOT-EXISTS; the Spark plan is
    the O(n + |sizes|²) aggregated algorithm: (1) per size, the min
    price (a tiny frame — size is bounded-cardinality); (2) a size is
    Pareto-viable iff its min price is STRICTLY below every min price
    at any strictly larger size (computed on the |sizes|-row frame —
    the broadcast-joined running-min trick without any global window
    over the data); (3) join back to fetch the parts matching a viable
    (size, min_price) cell. The corpus is scanned twice, shuffled once
    (the per-size agg); no row-vs-row comparison ever touches the full
    table — the quadratic work collapses onto the 50-row size frame."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_size").cast("int").alias("p_size"), "p_retailprice"
    )
    per_size = part.groupBy("p_size").agg(
        F.min("p_retailprice").alias("min_price")
    )
    # strictly-larger sizes' best price, on the tiny per-size frame
    a, b = per_size.alias("a"), per_size.alias("b")
    better_above = (
        a.join(b, F.col("b.p_size") > F.col("a.p_size"), "left")
        .groupBy(F.col("a.p_size").alias("p_size"))
        .agg(
            F.min("a.min_price").alias("min_price"),
            F.min("b.min_price").alias("best_above"),
        )
    )
    viable = better_above.where(
        F.col("best_above").isNull()
        | (F.col("min_price") < F.col("best_above"))
    ).select("p_size", F.col("min_price").alias("p_retailprice"))
    return part.join(F.broadcast(viable), ["p_size", "p_retailprice"]).select(
        "p_partkey", "p_size", "p_retailprice"
    )
