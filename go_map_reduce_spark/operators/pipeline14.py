"""Round-5 pipeline operators, ninth batch: distributed global ranking
without a single-partition window, and hashing-trick feature vectors.

`global_price_rank_twophase` makes the engine's recurring advice
("a global window is a single-task serialization — don't") executable:
it computes an EXACT global rank with no unpartitioned window, using
the two-phase bin-offset pattern, and its oracle is the naive global
row_number the pattern replaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from go_map_reduce_spark.catalog import load_table
from go_map_reduce_spark.registry import query, track_cache

# --------------------------------------------------------------------------
# Exact global rank via bin edges + per-bin offsets (two-phase ranking)
# --------------------------------------------------------------------------

RANK_BINS = 16
_BIN_QS = [i / RANK_BINS for i in range(1, RANK_BINS)]


@query(
    "global_price_rank_twophase",
    oracle="""
    SELECT l_orderkey, CAST(l_linenumber AS INT) AS l_linenumber,
           l_extendedprice,
           CAST(row_number() OVER (
             ORDER BY l_extendedprice, l_orderkey, l_linenumber
           ) AS BIGINT) AS global_rank
    FROM lineitem
    """,
)
def global_price_rank_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global rank of every lineitem by price (total order:
    price, orderkey, linenumber) computed WITHOUT a global window —
    the two-phase ranking pattern: (1) percentile BIN EDGES from one
    holistic aggregate split the key space into {RANK_BINS} ranges;
    (2) per-bin row counts (a {RANK_BINS}-row frame) turn into
    cumulative OFFSETS with a window over that tiny frame; (3) each
    row's rank = its bin's offset + its intra-bin row_number, where
    the intra-bin window partitions BY BIN — parallel across bins,
    never one task. The oracle is the naive global row_number this
    plan replaces (correct, but a single-partition sort at scale —
    Spark even warns 'No Partition Defined for Window operation').

    Bin-boundary ties are safe: rows equal to an edge all land in the
    same bin (strictly-less count, the spend_equidepth_histogram
    convention), and the intra-bin order completes the total order.
    This is how distributed engines implement ranking over
    range-partitioned sorts; with AQE the per-bin partitions coalesce
    or split on skew."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_linenumber").cast("int").alias("l_linenumber"),
        "l_extendedprice",
    )
    edges = li.agg(F.percentile("l_extendedprice", F.lit(_BIN_QS)).alias("e"))
    # consumed twice (per-bin counts + the ranked output): persist so
    # the scan + bin assignment runs once, and both consumers see the
    # identical binning
    binned = li.crossJoin(F.broadcast(edges)).select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        (
            1 + F.size(F.filter("e", lambda x: x < F.col("l_extendedprice")))
        ).alias("bin"),
    ).persist().transform(track_cache)
    counts = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("c"))
    offsets = counts.select(
        "bin",
        (
            F.sum("c").over(W.orderBy("bin").rowsBetween(W.unboundedPreceding, -1))
        ).alias("offset"),
    ).fillna({"offset": 0})
    intra = F.row_number().over(
        W.partitionBy("bin").orderBy(
            "l_extendedprice", "l_orderkey", "l_linenumber"
        )
    )
    return (
        binned.withColumn("intra", intra)
        .join(F.broadcast(offsets), "bin")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            (F.col("offset") + F.col("intra")).cast("long").alias("global_rank"),
        )
    )


# --------------------------------------------------------------------------
# Hashing-trick feature vectors (sparse bag-of-words at fixed width)
# --------------------------------------------------------------------------

FH_DIM = 1024


@query(
    "feature_hashing_vectors",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(
               regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS word
      FROM documents
    ),
    hashed AS (
      SELECT doc_id,
             CAST(CAST(concat('0x', substr(md5(word), 1, 7)) AS BIGINT)
                  % {FH_DIM} AS INT) AS idx
      FROM tok
    ),
    cells AS (
      SELECT doc_id, idx, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM hashed GROUP BY doc_id, idx
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS nnz,
           string_agg(idx || ':' || cnt, ' ' ORDER BY idx) AS vec
    FROM cells GROUP BY doc_id
    """,
)
def feature_hashing_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick vectorizer (Weinberger et al. 2009): each token
    maps to md5(word) mod {FH_DIM}, giving every document a
    fixed-width sparse count vector with NO vocabulary pass, no
    vocabulary broadcast, and no train/serve vocabulary drift — the
    stateless featurizer behind linear classifiers and quality
    filters at corpus scale. Output is the sparse form (sorted index
    array + aligned counts), the layout a downstream trainer consumes.

    One explode + one (doc, idx) count (map-side combinable) + one
    per-doc re-assembly; the md5-prefix hash is the engine's
    established cross-engine convention (training_shard_assignment),
    so both engines bucket identically — a production run swaps in
    xxhash64 (simhash64 discipline) for speed at identical plan
    shape. Collisions are the accepted trade of the technique (two
    words may share a cell; dimension {FH_DIM} bounds the rate). The
    sparse vector serializes as 'idx:cnt ...' text ordered by index —
    array-valued result columns round-trip asymmetrically through the
    two engines' pandas bridges (numpy array vs list), so the gate
    payload stays scalar; the pytest re-parses it."""
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    tok = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(toks).alias("word")
    )
    idx = (
        F.conv(F.substring(F.md5("word"), 1, 7), 16, 10).cast("long") % FH_DIM
    ).cast("int")
    cells = (
        tok.select("doc_id", idx.alias("idx"))
        .groupBy("doc_id", "idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pairs = F.array_sort(F.collect_list(F.struct("idx", "cnt")))
    return cells.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("nnz"),
        F.array_join(
            F.transform(
                pairs, lambda s: F.concat_ws(":", s["idx"], s["cnt"])
            ),
            " ",
        ).alias("vec"),
    )
