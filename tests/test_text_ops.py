"""Differential tests for SURVEY.md §2b text operators (A1-A6)."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

TEXT_QUERIES = ["wordcount", "inverted_index", "inverted_index_topdocs", "doc_token_counts", "sorted_string_agg", "doc_chunks_udtf"]


@pytest.mark.parametrize("name", TEXT_QUERIES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_wordcount_sanity(spark, sf_dir):
    df = QUERIES["wordcount"](spark, sf_dir)
    rows = {r["word"]: r["cnt"] for r in df.collect()}
    assert len(rows) > 0
    assert all(cnt > 0 for cnt in rows.values())
    assert "" not in rows


def test_arrow_batch_token_stats_oracle(spark, sf_dir):
    from go_map_reduce_spark.registry import ORACLES, QUERIES

    from tests.oracle_util import compare

    compare(
        QUERIES["arrow_batch_token_stats"](spark, sf_dir),
        ORACLES["arrow_batch_token_stats"],
        sf_dir,
    )
