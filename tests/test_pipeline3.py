"""Differential + property tests for pipeline batch 3 (heavy hitters,
survivor selection, boilerplate shingles, semantic dedup)."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = [
    "heavy_hitters_exact",
    "near_dup_survivors",
    "boilerplate_shingles",
    "semantic_dedup_survivors",
    "training_shard_assignment",
]


def test_shard_assignment_is_permutation(spark, sf_dir):
    """Shard/pos form a permutation: every doc appears once, positions
    within a shard are 1..n contiguous, and shard sizes are balanced
    (max/min within 3x at 500+ docs)."""
    df = QUERIES["training_shard_assignment"](spark, sf_dir).toPandas()
    assert df.doc_id.is_unique
    sizes = df.groupby("shard")["pos"].agg(["max", "size"])
    assert (sizes["max"] == sizes["size"]).all()
    assert sizes["size"].max() <= 3 * max(sizes["size"].min(), 1)


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_misra_gries_superset_guarantee(spark, sf_dir):
    """The phase-1 candidate set must contain EVERY true heavy hitter —
    the exactness of phase 2 rests on this superset property, so pin it
    directly rather than trusting the end-to-end match."""
    from pyspark.sql import functions as F

    from go_map_reduce_spark.catalog import ensure_min_parallelism, load_table
    from go_map_reduce_spark.operators.pipeline3 import (
        HH_K,
        _misra_gries_partition,
    )

    docs = ensure_min_parallelism(
        spark, load_table(spark, sf_dir, "documents").select("text")
    )
    candidates = {
        r["token"]
        for r in docs.mapInPandas(_misra_gries_partition, "token string")
        .distinct()
        .collect()
    }
    toks = docs.select(
        F.explode(
            F.filter(F.split("text", "[^A-Za-z]+"), lambda x: x != "")
        ).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    n = toks.count()
    true_heavy = {
        r["token"]
        for r in counts.where(F.col("cnt") * HH_K >= F.lit(n)).collect()
    }
    assert true_heavy <= candidates


def test_survivors_partition_corpus(spark, sf_dir):
    """Survivor selection is a partition of the corpus: every doc maps
    to exactly one cluster, every cluster keeps exactly one survivor,
    and the survivor has the max n_chars in its cluster."""
    from pyspark.sql import functions as F

    from go_map_reduce_spark.catalog import load_table
    from go_map_reduce_spark.operators.advanced import dedup_clusters

    surv = QUERIES["near_dup_survivors"](spark, sf_dir).toPandas()
    assert surv.cluster_id.is_unique  # exactly one survivor per cluster
    labels = dedup_clusters(spark, sf_dir).toPandas()
    docs = load_table(spark, sf_dir, "documents").select("doc_id").toPandas()
    merged = docs.merge(labels, on="doc_id", how="left")
    merged["cluster_id"] = merged.cluster_id.fillna(merged.doc_id)
    # one survivor per cluster over the whole corpus, no cluster missed
    assert set(surv.cluster_id) == set(merged.cluster_id)
    # the survivor is the longest member of its cluster
    full = merged.merge(
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .toPandas(),
        on="doc_id",
    )
    max_len = full.groupby("cluster_id")["n_chars"].max()
    for _, row in surv.iterrows():
        assert row.n_chars == max_len[row.cluster_id]


def test_semantic_dedup_drops_only_paired(spark, sf_dir):
    """Dropped vec_ids are exactly the distinct higher ids of the
    verified near-dup pairs."""
    from go_map_reduce_spark.catalog import load_table
    from go_map_reduce_spark.operators.dedup import embedding_near_dup_pairs

    kept = {
        r["vec_id"]
        for r in QUERIES["semantic_dedup_survivors"](spark, sf_dir).collect()
    }
    all_ids = {
        r["vec_id"]
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id")
        .collect()
    }
    dropped_expected = {
        r["vec_b"] for r in embedding_near_dup_pairs(spark, sf_dir).collect()
    }
    assert all_ids - kept == dropped_expected
