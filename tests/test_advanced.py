"""Differential tests for advanced operators (as-of join, range join,
iterative clusters, grouped-map)."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = [
    "asof_join_user_orders",
    "range_join_price_bands",
    "dedup_clusters",
    "dedup_clusters_largestar",
    "doc_length_zscores",
]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_clusters_are_consistent_with_pairs(spark, sf_dir):
    """Every near-dup pair must land in the same cluster; cluster ids
    are the component-min doc id."""
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in QUERIES["dedup_clusters"](spark, sf_dir).collect()
    }
    pairs = QUERIES["minhash_near_dup_pairs"](spark, sf_dir).collect()
    for p in pairs:
        assert labels[p["doc_a"]] == labels[p["doc_b"]]
    for doc, cl in labels.items():
        assert cl <= doc


def test_largestar_agrees_with_propagation(spark, sf_dir):
    """Both connected-components tiers produce identical labelings."""
    a = sorted(
        map(tuple, QUERIES["dedup_clusters"](spark, sf_dir).collect())
    )
    b = sorted(
        map(
            tuple,
            QUERIES["dedup_clusters_largestar"](spark, sf_dir).collect(),
        )
    )
    assert a == b


def test_largestar_deep_chain(spark):
    """A 64-node chain (diameter 63) — the shape where min-label
    propagation needs O(diameter) rounds — must still collapse to one
    component rooted at 0 within large-star's logarithmic budget.
    Plus a disjoint triangle and an isolated pair as control."""
    from go_map_reduce_spark.operators.advanced import _cc_largestar

    chain = [(i, i + 1) for i in range(63)]
    extra = [(100, 101), (101, 102), (100, 102), (200, 201)]
    pairs = spark.createDataFrame(
        chain + extra, "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"] for r in _cc_largestar(pairs).collect()
    }
    assert all(got[i] == 0 for i in range(64))
    assert got[100] == got[101] == got[102] == 100
    assert got[200] == got[201] == 200


def test_merge_upsert_oracle(spark, sf_dir):
    compare(
        QUERIES["merge_upsert_balances"](spark, sf_dir),
        ORACLES["merge_upsert_balances"],
        sf_dir,
    )


def test_reliable_checkpoint_truncates_lineage(spark, tmp_path):
    """checkpoint() to a reliable dir (the cluster-mode replacement for
    localCheckpoint named in dedup_clusters' docstring): data survives,
    the checkpointed plan no longer embeds the original lineage, and the
    checkpoint files exist on disk."""
    import os

    from pyspark.sql import functions as F

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    df = (
        spark.range(1000)
        .select(F.col("id"), (F.col("id") % 7).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cp = df.checkpoint(eager=True)
    assert sorted(map(tuple, cp.collect())) == sorted(
        map(tuple, df.collect())
    )
    plan = cp._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan and "Aggregate" not in plan
    ckpt_root = str(tmp_path / "ckpt")
    found = any(files for _, _, files in os.walk(ckpt_root))
    assert found, "no checkpoint files written"


def test_asof_tolerance_oracle(spark, sf_dir):
    compare(
        QUERIES["asof_join_tolerance"](spark, sf_dir),
        ORACLES["asof_join_tolerance"],
        sf_dir,
    )


def test_asof_tolerance_nulls_only_stale(spark, sf_dir):
    """Tolerance only NULLs matches, never changes them: rows agree with
    the tolerance-free as-of wherever the tolerance version is
    non-null, and every nulled row was stale (>30 days) in the free
    version."""
    import datetime

    free = {
        r["event_id"]: r
        for r in QUERIES["asof_join_user_orders"](spark, sf_dir).collect()
    }
    tol = QUERIES["asof_join_tolerance"](spark, sf_dir).collect()
    lim = datetime.timedelta(days=30)
    n_nulled = 0
    for r in tol:
        f = free[r["event_id"]]
        if r["last_orderkey"] is not None:
            assert r["last_orderkey"] == f["last_orderkey"]
            assert r["last_totalprice"] == f["last_totalprice"]
        elif f["last_orderkey"] is not None:
            n_nulled += 1
    assert n_nulled > 0  # the tolerance actually bites on this data


def test_largestar_random_graphs_vs_union_find(spark):
    """Property check on random graphs: the distributed contraction's
    labels equal a sequential union-find's component minima."""
    import random

    rng = random.Random(42)
    from go_map_reduce_spark.operators.advanced import _cc_largestar

    for trial in range(3):
        n = 60
        pairs = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(20, 80))
            }
        )
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {
            x: find(x)
            for x in {v for p in pairs for v in p}
        }
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in _cc_largestar(
                spark.createDataFrame(pairs, "doc_a long, doc_b long")
            ).collect()
        }
        assert got == want, f"trial {trial} mismatch"
