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
]


@pytest.mark.parametrize("name", TEXTSTATS)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_bigram_stats_oracle(spark, sf_dir):
    compare(QUERIES["bigram_stats"](spark, sf_dir), ORACLES["bigram_stats"], sf_dir)
