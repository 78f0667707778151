"""Differential tests for the dedup operator suite."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

DEDUP = [
    "dedup_exact_summary",
    "dedup_exact_survivors",
    "minhash_signatures",
    "minhash_near_dup_pairs",
    "simhash_fingerprints",
    "embedding_near_dup_pairs",
    "ngram_jaccard_pairs",
]


@pytest.mark.parametrize("name", DEDUP)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_exact_jaccard_supersets_minhash(spark):
    """Prefix-filtered exact Jaccard has zero false negatives, so every
    pair MinHash banding surfaces (a probabilistic subset) must also be
    found by the exact join, with the identical verified score."""
    sf = "/root/testdata/sf0.01"
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in QUERIES["ngram_jaccard_pairs"](spark, sf).collect()
    }
    approx = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in QUERIES["minhash_near_dup_pairs"](spark, sf).collect()
    }
    assert set(approx) <= set(exact)
    assert all(exact[p] == approx[p] for p in approx)


def test_minhash_finds_near_dups_at_sf001(spark):
    """The sf0.01 corpus contains prefix-sharing near-duplicates; the
    minhash pipeline must surface at least one verified pair there."""
    df = QUERIES["minhash_near_dup_pairs"](spark, "/root/testdata/sf0.01")
    rows = df.collect()
    assert all(0.5 <= r["jaccard"] <= 1.0 for r in rows)
    assert len(rows) > 0
