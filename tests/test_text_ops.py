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


def test_doc_leading_tokens_udtf_oracle(spark, sf_dir):
    from go_map_reduce_spark.registry import ORACLES, QUERIES

    from tests.oracle_util import compare

    compare(
        QUERIES["doc_leading_tokens_udtf"](spark, sf_dir),
        ORACLES["doc_leading_tokens_udtf"],
        sf_dir,
    )


def test_polymorphic_udtf_schema_follows_arg(spark, sf_dir):
    """The analyze() hook must derive the column count from the constant
    argument — probe with a different k than the registered query uses."""
    from go_map_reduce_spark.registry import QUERIES

    # running the query registers the UDTF in this session
    QUERIES["doc_leading_tokens_udtf"](spark, sf_dir)
    spark.sql("SELECT 7 AS doc_id, 'alpha beta gamma' AS text").createOrReplaceTempView(
        "_poly_probe"
    )
    out = spark.sql(
        "SELECT t.* FROM _poly_probe d, LATERAL leading_tokens(d.doc_id, d.text, 2) t"
    )
    assert out.columns == ["doc_id", "tok_1", "tok_2"]
    assert out.collect()[0][1:] == ("alpha", "beta")
