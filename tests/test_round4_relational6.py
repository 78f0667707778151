"""Round-4 relational depth: null-safe join, map functions, try_*."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = [
    "null_safe_join_segments",
    "map_functions_surface",
    "try_arithmetic_ratios",
]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_null_safe_join_keeps_null_keys(spark, sf_dir):
    """Every customer appears exactly once — the NULL-keyed (BUILDING)
    rows matched the NULL dim member instead of dropping."""
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW customer AS SELECT * FROM '{sf_dir}/customer.parquet'"
    )
    total, building = con.sql(
        "SELECT COUNT(*), "
        "SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) "
        "FROM customer"
    ).fetchone()
    rows = {
        r["seg_label"]: r["n_customers"]
        for r in QUERIES["null_safe_join_segments"](spark, sf_dir).collect()
    }
    assert sum(rows.values()) == total
    assert rows.get("UNSEGMENTED", 0) == building


def test_null_safe_join_is_hash_join(spark, sf_dir):
    """`<=>` must plan as a broadcast HASH join (equality predicate),
    not BroadcastNestedLoopJoin."""
    plan = (
        QUERIES["null_safe_join_segments"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan


def test_map_surface_filters_and_scales(spark, sf_dir):
    from go_map_reduce_spark.operators.relational6 import MIN_DOCS_PER_LANG

    for r in QUERIES["map_functions_surface"](spark, sf_dir).collect():
        assert r["n_langs"] >= 1
        if r["kept_entries"]:
            for entry in r["kept_entries"].split(","):
                lang, val = entry.split("=")
                assert int(val) % 2 == 0
                assert int(val) // 2 >= MIN_DOCS_PER_LANG
            langs = [e.split("=")[0] for e in r["kept_entries"].split(",")]
            assert langs == sorted(langs)


def test_try_divide_null_on_zero(spark, sf_dir):
    rows = QUERIES["try_arithmetic_ratios"](spark, sf_dir).collect()
    for r in rows:
        if r["n_clicks"] == 0:
            assert r["purchase_per_click"] is None
        else:
            assert r["purchase_per_click"] == pytest.approx(
                r["n_purchases"] / r["n_clicks"]
            )


def test_stream_source_against_oracle(spark, sf_dir):
    compare(
        QUERIES["stream_source_groups"](spark, sf_dir),
        ORACLES["stream_source_groups"],
        sf_dir,
    )


def test_stream_source_runs_multiple_microbatches(spark, tmp_path):
    """The source must be consumed incrementally (offset pacing), not
    as one giant batch: STREAM_N rows at STREAM_CHUNK/batch →
    ≥ STREAM_N // STREAM_CHUNK microbatches (r15 raised the chunk to
    600 per guide §4 — the multi-batch offset protocol stays
    demonstrated at half the lifecycle cost)."""
    from pyspark.sql import functions as F

    from go_map_reduce_spark.shipping import ensure_package_shipped
    from go_map_reduce_spark.sources.pydatasource import (
        STREAM_CHUNK,
        STREAM_N,
        register_replay_stream_source,
    )

    ensure_package_shipped(spark)
    register_replay_stream_source(spark)
    stream = spark.readStream.format("replay_stream").load()
    agg = stream.agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("streamsrc_batches")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = q.lastProgress["batchId"] + 1
    finally:
        q.stop()
    row = spark.table("streamsrc_batches").collect()[0]
    assert row["n"] == STREAM_N
    assert row["s"] == STREAM_N * (STREAM_N - 1) // 2
    expected = -(-STREAM_N // STREAM_CHUNK)
    assert expected >= 2, "chunk too large: offset pacing no longer multi-batch"
    assert n_batches >= expected
