"""Differential + semantic tests for exact statistics (stats.py)."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = ["regression_price_on_quantity", "quantity_median_mode"]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_regression_matches_numpy(spark, sf_dir):
    """The sufficient-statistics OLS must agree with numpy's lstsq to
    float tolerance (the exact-integer path changes op order, not the
    estimator)."""
    import numpy as np
    import duckdb

    got = {
        r["l_returnflag"]: r
        for r in QUERIES["regression_price_on_quantity"](
            spark, sf_dir
        ).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    rows = con.sql(
        "SELECT l_returnflag, l_quantity, l_extendedprice FROM lineitem"
    ).fetchall()
    by_flag = {}
    for f, q, p in rows:
        by_flag.setdefault(f, []).append((q, p))
    for f, data in by_flag.items():
        x = np.array([d[0] for d in data])
        y = np.array([d[1] for d in data])
        slope, intercept = np.polyfit(x, y, 1)
        r = np.corrcoef(x, y)[0, 1]
        assert got[f]["slope"] == pytest.approx(slope, rel=1e-9)
        assert got[f]["intercept"] == pytest.approx(intercept, rel=1e-9)
        assert got[f]["r2"] == pytest.approx(r * r, rel=1e-9)
        assert 0.0 <= got[f]["r2"] <= 1.0


def test_median_mode_semantics(spark, sf_dir):
    """Median/mode agree with a plain-Python computation per group."""
    import statistics

    import duckdb

    got = {
        r["l_returnflag"]: r
        for r in QUERIES["quantity_median_mode"](spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    rows = con.sql("SELECT l_returnflag, l_quantity FROM lineitem").fetchall()
    by_flag = {}
    for f, q in rows:
        by_flag.setdefault(f, []).append(round(q * 100))
    for f, cents in by_flag.items():
        assert got[f]["n"] == len(cents)
        assert got[f]["median_qty"] == pytest.approx(
            statistics.median(cents) / 100.0
        )
        counts = {}
        for v in cents:
            counts[v] = counts.get(v, 0) + 1
        best = min(
            counts, key=lambda v: (-counts[v], v)
        )  # max count, min value
        assert got[f]["mode_qty"] == best / 100.0
        assert got[f]["mode_count"] == counts[best]


@pytest.mark.parametrize(
    "name",
    ["group_by_all_revenue", "union_by_name_mix", "sql_hint_broadcast"],
)
def test_sqlsurface_against_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)
