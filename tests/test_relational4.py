"""Differential tests for the TPC-H shape batch 2 (Q4/Q6/Q10/Q12/Q14/Q16/Q19/Q21)."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = [
    "q4_priority_late_orders",
    "q6_forecast_revenue",
    "q10_returned_revenue",
    "q12_priority_linestatus",
    "q14_promo_share",
    "q16_supplier_part_variety",
    "q19_disjunctive_revenue",
    "q21_sole_late_suppliers",
]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_q6_all_filters_pushed(spark, sf_dir):
    """Q6 is the pushdown probe: the shipdate/discount/quantity
    predicates must reach the parquet scan and the read schema must be
    pruned to the 4 referenced columns."""
    plan = QUERIES["q6_forecast_revenue"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"IsNotNull({col})" in plan or col in plan.split("PushedFilters")[1][:400]


def test_q21_nonempty(spark, sf_dir):
    assert QUERIES["q21_sole_late_suppliers"](spark, sf_dir).count() > 0
