"""Tests for pivot/cube/quantile/sketch operators."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

ORACLED = [
    "deterministic_sample_orders",
    "pivot_segment_status",
    "cube_year_status",
    "grouping_sets_order_stats",
    "quantity_quantiles",
]


@pytest.mark.parametrize("name", ORACLED)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_sketch_rows_are_bounded_oracled():
    # r13 (verdict task 7): both sketch rows upgraded to BOUNDED
    # oracles — the exact side + within-bound booleans are hash-gated.
    assert "approx_distinct_sketch" in ORACLES
    assert "approx_quantiles_sketch" in ORACLES


def test_approx_distinct_sketch_against_bounded_oracle(spark, sf_dir):
    compare(
        QUERIES["approx_distinct_sketch"](spark, sf_dir),
        ORACLES["approx_distinct_sketch"],
        sf_dir,
    )


def test_approx_distinct_within_2pct(spark, sf_dir):
    """Raw-estimate accuracy, read from the full frame the registered
    bounded query composes."""
    from go_map_reduce_spark.operators.analytics import _approx_distinct_full

    for r in _approx_distinct_full(spark, sf_dir).collect():
        assert abs(r["approx_orders"] - r["exact_orders"]) <= 0.02 * r["exact_orders"]
        assert abs(r["approx_parts"] - r["exact_parts"]) <= 0.02 * max(r["exact_parts"], 1)
    # and the registered projection agrees with itself: every bound
    # boolean is true (the oracle asserts the same — this catches a
    # drifted bound formula before the gate does)
    out = QUERIES["approx_distinct_sketch"](spark, sf_dir).collect()
    assert all(r["orders_within_2pct"] and r["parts_within_2pct"] for r in out)


def test_approx_quantiles_within_2pct(spark, sf_dir):
    from go_map_reduce_spark.operators.analytics import _approx_quantiles_full

    for r in _approx_quantiles_full(spark, sf_dir).collect():
        assert (
            abs(r["approx_median_price"] - r["exact_median_price"])
            <= 0.02 * r["exact_median_price"]
        )
    out = QUERIES["approx_quantiles_sketch"](spark, sf_dir).collect()
    assert all(r["median_within_2pct"] for r in out)


def test_approx_quantiles_against_bounded_oracle(spark, sf_dir):
    compare(
        QUERIES["approx_quantiles_sketch"](spark, sf_dir),
        ORACLES["approx_quantiles_sketch"],
        sf_dir,
    )


@pytest.mark.parametrize("name", ["daily_orders_gapfilled", "rolling_7day_revenue"])
def test_timeseries_ops_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", ["price_histogram", "price_quantity_correlation"])
def test_distribution_ops_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_stratified_sample(spark, sf_dir):
    from go_map_reduce_spark.operators.analytics import SAMPLE_FRACTIONS

    a = QUERIES["stratified_sample_events"](spark, sf_dir)
    b = QUERIES["stratified_sample_events"](spark, sf_dir)
    ra = sorted(r["event_id"] for r in a.collect())
    rb = sorted(r["event_id"] for r in b.collect())
    assert ra == rb, "same seed must give the same sample"
    from pyspark.sql import functions as F

    from go_map_reduce_spark.catalog import load_table

    totals = {
        r["event_type"]: r["count"]
        for r in load_table(spark, sf_dir, "events").groupBy("event_type").count().collect()
    }
    got = {r["event_type"]: r["count"] for r in a.groupBy("event_type").count().collect()}
    for t, frac in SAMPLE_FRACTIONS.items():
        expected = totals[t] * frac
        if frac == 1.0:
            assert got.get(t, 0) == totals[t]
        else:
            assert abs(got.get(t, 0) - expected) <= max(10, 0.35 * expected)
