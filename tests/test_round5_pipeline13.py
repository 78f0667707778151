"""Round-5 batch 8: activity streaks, grouped price trends, KWIC."""

import duckdb
import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = ["activity_streaks", "price_trend_by_brand", "keyword_in_context"]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_streaks_against_python_reference(spark, sf_dir):
    """Longest streak recomputed sequentially per user from raw dates."""
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    by_user = {}
    for uid, d in con.sql(
        "SELECT DISTINCT user_id, CAST(ts AS DATE) FROM events"
    ).fetchall():
        by_user.setdefault(uid, []).append(d)
    expect = {}
    for uid, days in by_user.items():
        days.sort()
        longest = cur = 1
        for a, b in zip(days, days[1:]):
            cur = cur + 1 if (b - a).days == 1 else 1
            longest = max(longest, cur)
        expect[uid] = (longest, len(days))
    rows = QUERIES["activity_streaks"](spark, sf_dir).collect()
    got = {r["user_id"]: (r["longest_streak"], r["n_active_days"]) for r in rows}
    assert got == expect


def test_price_trend_matches_numpy_per_brand(spark, sf_dir):
    import numpy as np

    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'")
    con.sql(f"CREATE VIEW part AS SELECT * FROM '{sf_dir}/part.parquet'")
    rows = QUERIES["price_trend_by_brand"](spark, sf_dir).collect()
    assert rows
    for r in rows[:5]:
        pts = con.sql(
            f"""
            SELECT date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)),
                   l_extendedprice
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = '{r["p_brand"]}'
            """
        ).fetchall()
        x = np.array([p[0] for p in pts], dtype=np.float64)
        y = np.array([p[1] for p in pts], dtype=np.float64)
        slope = np.polyfit(x, y, 1)[0]
        assert abs(r["slope_dollars_per_day"] - slope) < 1e-6
        assert r["n"] == len(pts)


def test_kwic_windows_contain_term_and_clamp(spark, sf_dir):
    from go_map_reduce_spark.operators.pipeline13 import KWIC_RADIUS, KWIC_TERM

    rows = QUERIES["keyword_in_context"](spark, sf_dir).collect()
    assert rows
    for r in rows[:20]:
        ctx = r["context"].split(" ")
        assert KWIC_TERM in ctx
        assert len(ctx) <= 2 * KWIC_RADIUS + 1
    # at least one interior hit has the full window
    assert any(
        len(r["context"].split(" ")) == 2 * KWIC_RADIUS + 1 for r in rows
    )
