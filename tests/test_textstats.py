"""Differential tests for the text-analysis operators."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

TEXTSTATS = [
    "pii_redaction",
    "training_corpus_selection",
    "token_array_functions",
    "text_quality_scores",
    "language_id",
    "token_counts_bpe",
    "doc_fingerprints",
    "sequence_packing",
]


def test_sequence_packing_invariants(spark, sf_dir):
    """Every doc's offset is inside the budget; within a shard, offsets
    reconstruct the running concatenation exactly (next start = prev
    start + prev tokens)."""
    from go_map_reduce_spark.operators.textstats import PACK_BUDGET
    from go_map_reduce_spark.registry import QUERIES

    rows = QUERIES["sequence_packing"](spark, sf_dir).collect()
    assert rows
    by_shard = {}
    for r in rows:
        assert 0 <= r["off_in_seq"] < PACK_BUDGET
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in rs:
            assert r["seq_id"] == shard * 1_000_000 + off // PACK_BUDGET
            assert r["off_in_seq"] == off % PACK_BUDGET
            off += r["n_tokens"]


@pytest.mark.parametrize("name", TEXTSTATS)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_bigram_stats_oracle(spark, sf_dir):
    compare(QUERIES["bigram_stats"](spark, sf_dir), ORACLES["bigram_stats"], sf_dir)
