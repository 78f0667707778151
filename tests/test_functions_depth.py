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


def test_higher_order_array_ops_oracle(spark, sf_dir):
    compare(
        QUERIES["higher_order_array_ops"](spark, sf_dir),
        ORACLES["higher_order_array_ops"],
        sf_dir,
    )


def test_outer_join_emits_null_rows(spark, sf_dir):
    """The left-outer stream-stream join must emit unmatched purchases
    (NULL click columns) — the semantics the watermark exists for."""
    df = QUERIES["events_purchase_click_outer_join"](spark, sf_dir).toPandas()
    assert df.click_id.isna().any()
    assert df.click_id.notna().any()
