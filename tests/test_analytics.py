"""Tests for pivot/cube/quantile/sketch operators."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

ORACLED = ["pivot_segment_status", "cube_year_status", "quantity_quantiles"]


@pytest.mark.parametrize("name", ORACLED)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_sketches_have_no_oracle():
    assert "approx_distinct_sketch" not in ORACLES
    assert "approx_quantiles_sketch" not in ORACLES


def test_approx_distinct_within_2pct(spark, sf_dir):
    for r in QUERIES["approx_distinct_sketch"](spark, sf_dir).collect():
        assert abs(r["approx_orders"] - r["exact_orders"]) <= 0.02 * r["exact_orders"]
        assert abs(r["approx_parts"] - r["exact_parts"]) <= 0.02 * max(r["exact_parts"], 1)


def test_approx_quantiles_within_2pct(spark, sf_dir):
    for r in QUERIES["approx_quantiles_sketch"](spark, sf_dir).collect():
        assert (
            abs(r["approx_median_price"] - r["exact_median_price"])
            <= 0.02 * r["exact_median_price"]
        )


@pytest.mark.parametrize("name", ["daily_orders_gapfilled", "rolling_7day_revenue"])
def test_timeseries_ops_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)
