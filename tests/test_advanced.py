"""Differential tests for advanced operators (as-of join, range join,
iterative clusters, grouped-map)."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = [
    "asof_join_user_orders",
    "range_join_price_bands",
    "dedup_clusters",
    "doc_length_zscores",
]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_clusters_are_consistent_with_pairs(spark, sf_dir):
    """Every near-dup pair must land in the same cluster; cluster ids
    are the component-min doc id."""
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in QUERIES["dedup_clusters"](spark, sf_dir).collect()
    }
    pairs = QUERIES["minhash_near_dup_pairs"](spark, sf_dir).collect()
    for p in pairs:
        assert labels[p["doc_a"]] == labels[p["doc_b"]]
    for doc, cl in labels.items():
        assert cl <= doc


def test_merge_upsert_oracle(spark, sf_dir):
    compare(
        QUERIES["merge_upsert_balances"](spark, sf_dir),
        ORACLES["merge_upsert_balances"],
        sf_dir,
    )
