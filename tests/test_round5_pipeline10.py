"""Round-5 batch 5: equi-depth histogram, WoW growth, embedding dim
stats, multi-touch attribution."""

import duckdb
import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = [
    "spend_equidepth_histogram",
    "weekly_revenue_growth",
    "embedding_dim_stats",
    "multi_touch_attribution",
]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_equidepth_buckets_partition_and_balance(spark, sf_dir):
    """Buckets are 1..10, ranges ordered and non-overlapping, total
    count equals the customer-with-orders count, and populations are
    near-balanced (interpolated edges can shift a row or two)."""
    rows = sorted(
        QUERIES["spend_equidepth_histogram"](spark, sf_dir).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"] for r in rows] == list(range(1, 11))
    for lo, hi in zip(rows, rows[1:]):
        assert lo["max_spend"] <= hi["min_spend"]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    (n,) = con.sql("SELECT COUNT(DISTINCT o_custkey) FROM orders").fetchone()
    sizes = [r["n_customers"] for r in rows]
    assert sum(sizes) == n
    assert max(sizes) - min(sizes) <= max(3, n // 50)


def test_wow_growth_values(spark, sf_dir):
    """First week has NULL growth; each growth recomputes from the
    adjacent revenues."""
    rows = sorted(
        QUERIES["weekly_revenue_growth"](spark, sf_dir).collect(),
        key=lambda r: r["week"],
    )
    assert len(rows) > 2
    assert rows[0]["wow_growth"] is None
    for prev, cur in zip(rows, rows[1:]):
        expect = round((cur["revenue"] - prev["revenue"]) / prev["revenue"], 6)
        assert abs(cur["wow_growth"] - expect) < 1e-9


def test_dim_stats_match_numpy(spark, sf_dir):
    import numpy as np

    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'")
    mat = np.array(
        [e for (e,) in con.sql("SELECT embedding FROM embeddings").fetchall()],
        dtype=np.float64,
    )
    rows = sorted(
        QUERIES["embedding_dim_stats"](spark, sf_dir).collect(),
        key=lambda r: r["dim"],
    )
    assert len(rows) == 64
    mean = mat.mean(axis=0)
    std = mat.std(axis=0, ddof=1)
    for r in rows:
        assert abs(r["mean"] - mean[r["dim"] - 1]) < 1e-6
        assert abs(r["std"] - std[r["dim"] - 1]) < 1e-6


def test_multi_touch_consistent_with_last_touch(spark, sf_dir):
    """n_touches > 0 exactly when last-touch attributed a click, and
    credit is 1/n (NULL for zero-touch purchases)."""
    mt = {
        r["event_id"]: r
        for r in QUERIES["multi_touch_attribution"](spark, sf_dir).collect()
    }
    lt = {
        r["event_id"]: r["click_us"]
        for r in QUERIES["purchase_click_attribution"](spark, sf_dir).collect()
    }
    assert set(mt) == set(lt)
    n_zero = n_pos = 0
    for eid, r in mt.items():
        if r["n_touches"] == 0:
            n_zero += 1
            assert r["credit_per_touch"] is None
            assert lt[eid] is None
        else:
            n_pos += 1
            assert lt[eid] is not None
            assert abs(r["credit_per_touch"] - round(1.0 / r["n_touches"], 6)) < 1e-12
    assert n_pos > 0
