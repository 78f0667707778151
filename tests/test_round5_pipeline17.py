"""Round-5 batch 10: trending ranks, nearest as-of, AQE skew probe."""

import duckdb
import pytest

from pyspark.sql import functions as F

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = ["trending_parts_weekly", "asof_join_nearest"]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_trending_ranks_and_movement(spark, sf_dir):
    """Each week has exactly top-k rows ranked 1..k; a part's prev_rk,
    when present, matches its rank in the prior week's full ranking."""
    from go_map_reduce_spark.operators.pipeline17 import TREND_TOP_K

    rows = QUERIES["trending_parts_weekly"](spark, sf_dir).collect()
    assert rows
    by_week = {}
    for r in rows:
        by_week.setdefault(r["week"], []).append(r)
    for week, rs in by_week.items():
        assert sorted(x["rk"] for x in rs) == list(
            range(1, min(TREND_TOP_K, len(rs)) + 1)
        )
    assert any(r["prev_rk"] is None for r in rows)  # entries exist
    assert any(r["prev_rk"] is not None for r in rows)  # movement exists


def test_nearest_asof_against_bruteforce(spark, sf_dir):
    """Gap recomputed quadratically per purchase in DuckDB."""
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    truth = dict(
        con.sql(
            """
            SELECT p.event_id,
                   (SELECT min(abs(epoch_us(c.ts) - epoch_us(p.ts)))
                    FROM events c WHERE c.event_type = 'click'
                      AND c.user_id = p.user_id) AS g
            FROM events p WHERE p.event_type = 'purchase'
            """
        ).fetchall()
    )
    got = {
        r["event_id"]: r["nearest_gap_us"]
        for r in QUERIES["asof_join_nearest"](spark, sf_dir).collect()
    }
    assert got == truth


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join mitigation fires on a synthetic hot key: with
    broadcast off and thresholds lowered, the final adaptive plan
    marks the sort-merge join skew=true (hot partitions split into
    parallel subtasks) and the result stays correct."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(300_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        # aggregate to keep collect() tiny, but execute THIS DataFrame:
        # count() would plan a separate query execution and the original
        # frame's adaptive plan would never finalize (isFinalPlan=false)
        joined = left.join(right, "k").groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
        )
        row = joined.collect()[0]
        # 90% of left rows hit k=0; every left row matches exactly once
        assert row["n"] == 300_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:1500]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
