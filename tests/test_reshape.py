"""Differential tests for reshape/null-semantics operators."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = [
    "region_nation_matrix",
    "unpivot_lineitem_measures",
    "intersect_all_priorities",
    "null_handling_profile",
]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)
