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


@pytest.mark.parametrize("name", ["events_anomaly_mad", "customer_pareto_share"])
def test_round3b_against_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_pareto_is_minimal_prefix(spark, sf_dir):
    """The returned set is exactly the minimal rank-prefix reaching 50%:
    contiguous ranks from 1, the last member crosses half, the set
    without it does not."""
    rows = sorted(
        QUERIES["customer_pareto_share"](spark, sf_dir).collect(),
        key=lambda r: r["rk"],
    )
    assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
    assert rows[-1]["cum_share"] >= 0.5
    if len(rows) > 1:
        assert rows[-2]["cum_share"] < 0.5


def test_mad_flags_are_extreme(spark, sf_dir):
    """Every flagged event is strictly further from its type's median
    than 3x the type's MAD, recomputed in plain Python."""
    import statistics

    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    by_type = {}
    for t, v in con.sql("SELECT event_type, value FROM events").fetchall():
        by_type.setdefault(t, []).append(round(v * 100))
    flagged = QUERIES["events_anomaly_mad"](spark, sf_dir).collect()
    stats_by_type = {}
    for t, vals in by_type.items():
        m = statistics.median(vals)
        mad = statistics.median([abs(v - m) for v in vals])
        stats_by_type[t] = (m, mad)
    n_expected = 0
    for t, vals in by_type.items():
        m, mad = stats_by_type[t]
        if mad > 0:
            n_expected += sum(1 for v in vals if abs(v - m) > 3 * mad)
    assert len(flagged) == n_expected
    for r in flagged:
        m, mad = stats_by_type[r["event_type"]]
        assert mad > 0 and r["deviation"] * 100 > 3 * mad


def test_pareto_has_no_unpartitioned_data_window(spark, sf_dir):
    """r10 verdict task 4: customer_pareto_share was the engine's last
    single-partition window over an unbounded per-entity frame.  The
    two-phase plan's data-sized windows (the ones ordering the
    (cents, o_custkey) total-order key) must all carry the bin
    partition key; only the tiny per-bin offsets windows (ordering by
    bin alone, over an aggregate of <= PARETO_BINS+1 rows) may be
    unpartitioned."""
    import re

    df = QUERIES["customer_pareto_share"](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    wins = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert wins
    data_wins = [w for w in wins if "cents" in w and "custkey" in w]
    assert data_wins and all("bin" in w for w in data_wins), wins


def test_pareto_two_phase_matches_naive_window(spark, sf_dir):
    """Bit-for-bit equivalence with the naive global-window form the
    oracle runs (belt to the oracle gate's braces): same members, same
    ranks, same exact cumulative shares."""
    from go_map_reduce_spark.catalog import load_table
    from pyspark.sql import Window
    import pyspark.sql.functions as F

    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    w = Window.orderBy(F.desc("cents"), F.asc("o_custkey"))
    naive = (
        rev.select(
            "o_custkey",
            "cents",
            F.row_number().over(w).alias("rk"),
            F.sum("cents")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("cum"),
            F.sum("cents").over(Window.partitionBy()).alias("total"),
        )
        .where((F.col("cum") - F.col("cents")) * 2 < F.col("total"))
        .select(
            "o_custkey",
            (F.col("cents").cast("double") / 100.0).alias("revenue"),
            F.col("rk").cast("long").alias("rk"),
            (F.col("cum").cast("double") / F.col("total")).alias("cum_share"),
        )
    )
    got = sorted(
        QUERIES["customer_pareto_share"](spark, sf_dir).collect(),
        key=lambda r: r["rk"],
    )
    want = sorted(naive.collect(), key=lambda r: r["rk"])
    assert [r.asDict() for r in got] == [r.asDict() for r in want]
    assert len(got) > 0
