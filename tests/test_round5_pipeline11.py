"""Round-5 batch 6: point-in-time SCD2 join, recency-weighted
activity, group-mean imputation."""

import duckdb
import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = [
    "point_in_time_orders",
    "recency_weighted_activity",
    "null_imputation_group_mean",
]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_point_in_time_splits_changed_customers(spark, sf_dir):
    """Changed customers (key %7==0) appear in BOTH their old segment
    (version 1, pre-cut orders) and MOBILE (version 2, post-cut), and
    total order count reconciles with the orders table."""
    rows = QUERIES["point_in_time_orders"](spark, sf_dir).collect()
    assert rows
    v2 = [r for r in rows if r["version"] == 2]
    assert v2 and all(r["segment"] == "MOBILE" for r in v2)
    assert sum(r["n_orders"] for r in v2) > 0
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    con.sql(f"CREATE VIEW customer AS SELECT * FROM '{sf_dir}/customer.parquet'")
    (n_orders,) = con.sql(
        """SELECT COUNT(*) FROM orders o
           JOIN customer c ON o.o_custkey = c.c_custkey"""
    ).fetchone()
    # every order matched by exactly one validity interval
    assert sum(r["n_orders"] for r in rows) == n_orders


def test_recency_scores_decay(spark, sf_dir):
    """Score is bounded by event count (weights ≤ 1), positive, and a
    user's score is below n_events unless all events are on the ref
    day."""
    rows = QUERIES["recency_weighted_activity"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["activity_score"] <= r["n_events"]
    assert any(r["activity_score"] < r["n_events"] for r in rows)


def test_imputation_counts_and_sum(spark, sf_dir):
    """Exactly the %5==0 rows count as imputed, and the imputed sum
    equals observed sum + n_imputed × segment mean (recomputed
    independently)."""
    rows = QUERIES["null_imputation_group_mean"](spark, sf_dir).collect()
    assert rows
    con = duckdb.connect()
    con.sql(f"CREATE VIEW customer AS SELECT * FROM '{sf_dir}/customer.parquet'")
    for r in rows:
        seg = r["c_mktsegment"]
        (n_total, n_masked, obs_sum, obs_mean) = con.sql(
            f"""
            SELECT COUNT(*),
                   SUM(CASE WHEN c_custkey % 5 = 0 THEN 1 ELSE 0 END),
                   SUM(CASE WHEN c_custkey % 5 <> 0 THEN c_acctbal END),
                   AVG(CASE WHEN c_custkey % 5 <> 0 THEN c_acctbal END)
            FROM customer WHERE c_mktsegment = '{seg}'
            """
        ).fetchone()
        assert r["n_rows"] == n_total
        assert r["n_imputed"] == n_masked
        expect = obs_sum + n_masked * round(obs_mean, 6)
        assert abs(r["imputed_sum"] - expect) < 1e-4
