"""Differential tests for subquery shapes + TF-IDF."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = [
    "order_count_distribution",
    "large_quantity_orders",
    "idle_rich_customers",
    "cheapest_supplier_per_part",
    "tfidf_top_terms",
    "lateral_top_orders_per_segment",
]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)
