"""Cross-table data-quality audit: differential + semantic pins."""

import duckdb
import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = ["dq_cross_table_audit", "dq_reconciliation_drilldown"]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_audit_discriminates_on_this_corpus(spark, sf_dir):
    """All three cross-table rules must FIRE here (the corpus was
    probed before the rules were declared) — an audit that only ever
    reports green is indistinguishable from one that checks nothing."""
    rows = {r["constraint"]: r for r in QUERIES["dq_cross_table_audit"](spark, sf_dir).collect()}
    assert set(rows) == {
        "orders_natural_key_cust_date_unique",
        "lineitem_ship_not_before_order",
        "orders_totalprice_reconciles",
    }
    for r in rows.values():
        assert r["n_violations"] > 0 and r["pass"] is False
        assert 0 < r["n_violations"] <= r["n_checked"]


def test_drilldown_rows_belong_to_the_red_rule(spark, sf_dir):
    """Every drill-down row must actually violate the reconciliation
    rule, gaps sorted descending, and the count bounded by top-N —
    cross-checked against an independent DuckDB recount."""
    from go_map_reduce_spark.operators.pipeline21 import DQ_DRILL_TOP_N

    rows = QUERIES["dq_reconciliation_drilldown"](spark, sf_dir).collect()
    assert 0 < len(rows) <= DQ_DRILL_TOP_N
    gaps = [r["gap"] for r in rows]
    assert gaps == sorted(gaps, reverse=True)
    for r in rows:
        assert r["gap"] > 0.01
        assert abs(abs(r["header_total"] - r["line_total"]) - r["gap"]) < 1e-9
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    (worst_key, worst_gap) = con.sql(
        """SELECT o_orderkey,
                  CAST(abs(CAST(o_totalprice AS DECIMAL(38,6)) - s) AS DOUBLE)
           FROM orders o JOIN (
             SELECT l_orderkey,
                    SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS s
             FROM lineitem GROUP BY l_orderkey
           ) x ON x.l_orderkey = o.o_orderkey
           ORDER BY 2 DESC, 1 LIMIT 1"""
    ).fetchone()
    assert rows[0]["o_orderkey"] == worst_key
    assert abs(rows[0]["gap"] - worst_gap) < 1e-9
