"""Round-5 final batch: GDPR erasure cascade + runtime bloom-filter
join optimization probe."""

import duckdb
import pytest

from pyspark.sql import functions as F

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare


def test_erasure_against_duckdb_oracle(spark, sf_dir):
    compare(
        QUERIES["gdpr_erasure_cascade"](spark, sf_dir),
        ORACLES["gdpr_erasure_cascade"],
        sf_dir,
    )


def test_erasure_counts_cascade_consistently(spark, sf_dir):
    """Dependent counts reconcile with independent DuckDB recomputation
    and respect the FK direction (no orphan under-count)."""
    from go_map_reduce_spark.operators.pipeline15 import ERASE_MOD

    rows = {
        r["table_name"]: r["n_rows_to_delete"]
        for r in QUERIES["gdpr_erasure_cascade"](spark, sf_dir).collect()
    }
    assert set(rows) == {"customer", "orders", "lineitem"}
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    (nc,) = con.sql(
        f"SELECT COUNT(*) FROM customer WHERE c_custkey % {ERASE_MOD} = 0"
    ).fetchone()
    (no,) = con.sql(
        f"""SELECT COUNT(*) FROM orders WHERE o_custkey IN
            (SELECT c_custkey FROM customer WHERE c_custkey % {ERASE_MOD} = 0)"""
    ).fetchone()
    assert rows["customer"] == nc
    assert rows["orders"] == no
    assert rows["lineitem"] >= rows["orders"]  # ≥1 line per order in TPC-H


def test_runtime_bloom_filter_join_prunes_big_side(spark, sf_dir):
    """Spark's runtime row-level bloom filter: with broadcast disabled,
    a selective dimension side injects a bloom filter into the fact
    scan side of the shuffle join (BloomFilterMightContain /
    bloom_filter_agg in the plan) — the row-prefilter that cuts
    shuffle volume when broadcast isn't possible. Thresholds are
    lowered to fire at test scale; the optimization is config-gated,
    so this pins that the engine's session can invoke it."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter" in plan or "BloomFilter" in plan, plan[:2000]
        # and the filtered result is still correct
        n = joined.count()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'")
        con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
        (expect,) = con.sql(
            """SELECT COUNT(*) FROM lineitem JOIN orders
               ON l_orderkey = o_orderkey
               WHERE o_orderpriority = '1-URGENT'"""
        ).fetchone()
        assert n == expect
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
