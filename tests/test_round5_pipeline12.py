"""Round-5 batch 7: reconciliation, rolling WAU, funnel latency, HLL
mergeability, minhash recall evaluation."""

import duckdb
import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = [
    "order_lineitem_reconciliation",
    "rolling_weekly_active_users",
    "funnel_time_to_convert",
    "minhash_recall_eval",
]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_reconciliation_counts_are_consistent(spark, sf_dir):
    row = QUERIES["order_lineitem_reconciliation"](spark, sf_dir).collect()[0]
    assert row["n_orders"] > 0
    assert 0 <= row["n_without_lines"] < row["n_orders"]
    assert row["n_mismatched"] <= row["n_orders"] - row["n_without_lines"]
    assert row["max_abs_diff"] is None or row["max_abs_diff"] >= 0


def test_wau_dominates_dau_and_is_monotone_in_window(spark, sf_dir):
    """Each day's WAU ≥ that day's DAU (the trailing window only adds
    users), with equality only possible on the first observed day."""
    from pyspark.sql import functions as F

    from go_map_reduce_spark.catalog import load_table

    wau = {
        r["day"]: r["wau"]
        for r in QUERIES["rolling_weekly_active_users"](spark, sf_dir).collect()
    }
    dau_rows = (
        load_table(spark, sf_dir, "events")
        .select(
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
            "user_id",
        )
        .distinct()
        .groupBy("day")
        .count()
        .collect()
    )
    dau = {r["day"]: r["count"] for r in dau_rows}
    assert set(dau) == set(wau)
    assert all(wau[d] >= dau[d] for d in dau)
    assert any(wau[d] > dau[d] for d in sorted(dau)[1:])


def test_funnel_latency_orders(spark, sf_dir):
    row = QUERIES["funnel_time_to_convert"](spark, sf_dir).collect()[0]
    assert row["n_converted"] > 0
    assert 0 < row["min_secs"] <= row["p50_secs"] <= row["p90_secs"]


def test_hll_merge_equals_direct_and_near_exact(spark, sf_dir):
    """Mergeability: unioning daily sketches gives the SAME estimate as
    one direct sketch over the month; both within 2% of exact.  Raw
    estimates come from the full frame; the registered bounded query
    (r13, oracle-gated) must report the same contracts as booleans."""
    from go_map_reduce_spark.operators.pipeline12 import _hll_rollup_full

    rows = _hll_rollup_full(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["merged_estimate"] == r["direct_estimate"], r
        assert abs(r["merged_estimate"] - r["exact_distinct"]) <= max(
            2, 0.02 * r["exact_distinct"]
        ), r
    out = QUERIES["hll_daily_rollup"](spark, sf_dir).collect()
    assert all(r["merged_eq_direct"] and r["within_2pct"] for r in out)


def test_minhash_recall_is_high_and_counts_reconcile(spark, sf_dir):
    """n_hit ≤ min(n_exact, n_minhash); recall on this corpus should be
    high (banding is tuned for it) — require ≥ 0.8."""
    row = QUERIES["minhash_recall_eval"](spark, sf_dir).collect()[0]
    assert row["n_hit"] <= min(row["n_exact"], row["n_minhash"])
    assert row["n_exact"] > 0
    assert row["n_hit"] / row["n_exact"] >= 0.8
