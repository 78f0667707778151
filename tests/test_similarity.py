"""Differential tests for similarity-search operators."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

SIM = ["ann_bruteforce_topk", "ann_lsh_topk"]


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
