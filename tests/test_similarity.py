"""Differential tests for similarity-search operators."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

SIM = ["ann_bruteforce_topk", "ann_lsh_topk", "embedding_quantization", "pagerank_supplier_part"]


@pytest.mark.parametrize("name", SIM)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_bruteforce_topk_shape(spark, sf_dir):
    rows = QUERIES["ann_bruteforce_topk"](spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(8))
    for q, rs in by_q.items():
        assert len(rs) == 5
        sims = [r["cos_sim"] for r in sorted(rs, key=lambda r: r["rk"])]
        assert sims == sorted(sims, reverse=True)
        assert all(r["neighbor_id"] != q for r in rs)


def test_pagerank_properties(spark, sf_dir):
    """PageRank sanity beyond the oracle: ranks sum to ~1 (no leaked
    mass — the undirected graph has no dangling nodes) and every rank
    is positive."""
    rows = QUERIES["pagerank_supplier_part"](spark, sf_dir).collect()
    total = sum(r["rank"] for r in rows)
    assert abs(total - 1.0) < 1e-6
    assert all(r["rank"] > 0 for r in rows)


def test_quantization_reconstruction_bound(spark, sf_dir):
    """Scalar quantization error bound: with bin-center reconstruction,
    per-dim error <= width/2, so MSE <= (width/2)^2."""
    from go_map_reduce_spark.operators.similarity import SQ_LEVELS

    import duckdb

    lo, hi = duckdb.sql(
        f"""SELECT min(list_reduce(embedding, (x,y) -> least(x,y))),
                   max(list_reduce(embedding, (x,y) -> greatest(x,y)))
            FROM '{'{}'.format('/root/testdata/sf0.01')}/embeddings.parquet'"""
    ).fetchone()
    width = (float(hi) - float(lo)) / SQ_LEVELS
    rows = QUERIES["embedding_quantization"](spark, "/root/testdata/sf0.01").collect()
    bound = (width / 2) ** 2 + 1e-12
    assert all(0 <= r["mse"] <= bound for r in rows)
