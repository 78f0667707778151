"""Differential tests for relational part 2 + sliding windows."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = [
    "customer_order_profile_outer",
    "supplier_part_full_outer",
    "order_date_arithmetic",
    "sql_interface_revenue",
    "wordcount_salted",
    "salted_join_segment_value",
    "events_sliding_windows",
]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_salted_equals_plain_wordcount(spark, sf_dir):
    plain = {tuple(r) for r in QUERIES["wordcount"](spark, sf_dir).collect()}
    salted = {tuple(r) for r in QUERIES["wordcount_salted"](spark, sf_dir).collect()}
    assert plain == salted
