"""Round-5 addendum: single-pass column profiler."""

import duckdb

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare


def test_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["orders_column_profile"](spark, sf_dir),
        ORACLES["orders_column_profile"],
        sf_dir,
    )


def test_profile_stats_match_direct_queries(spark, sf_dir):
    """Each column's profiled ndv / nulls / extrema reconcile with a
    direct per-column DuckDB query (the N-scan formulation the
    single-pass plan replaces)."""
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    rows = {
        r["column_name"]: r
        for r in QUERIES["orders_column_profile"](spark, sf_dir).collect()
    }
    assert len(rows) == 5
    for col, r in rows.items():
        n, nn, nd, mn, mx = con.sql(
            f"""SELECT COUNT(*), COUNT(*) - COUNT({col}),
                       COUNT(DISTINCT CAST({col} AS VARCHAR)),
                       min(CAST({col} AS VARCHAR)), max(CAST({col} AS VARCHAR))
                FROM orders"""
        ).fetchone()
        assert (r["n_rows"], r["n_nulls"], r["n_distinct"]) == (n, nn, nd)
        assert (r["min_value"], r["max_value"]) == (mn, mx)
