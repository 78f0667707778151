"""Differential tests for the relational + event operators (SURVEY.md §2c)."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

RELATIONAL = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "q7_nation_volume",
    "top_orders_per_customer",
    "running_customer_spend",
    "customers_without_orders",
    "big_spender_customers",
    "set_ops_customer_status",
    "rollup_lineitem_status",
    "order_scalar_functions",
    "global_top_orders",
    "events_json_stats",
    "funnel_click_view_purchase",
    "events_hourly_windows",
    "user_sessions",
]


@pytest.mark.parametrize("name", RELATIONAL)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_events_json_typed_oracle(spark, sf_dir):
    compare(QUERIES["events_json_typed"](spark, sf_dir), ORACLES["events_json_typed"], sf_dir)


def test_events_variant_extract_oracle(spark, sf_dir):
    compare(
        QUERIES["events_variant_extract"](spark, sf_dir),
        ORACLES["events_variant_extract"],
        sf_dir,
    )
