"""Differential tests for window-frame / string / aggregate depth."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = [
    "window_frame_functions",
    "string_functions_extended",
    "aggregate_function_depth",
]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)
