"""Differential + property tests for graph operators (graph.py)."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

GRAPH = ["bfs_reachability"]


@pytest.mark.parametrize("name", GRAPH)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_bfs_structure(spark, sf_dir):
    """Bipartite invariants: the seed (supplier 1) is the only hop-0
    node; parts (ids >= 1e6) sit at odd hops, suppliers at even hops;
    hops never exceed the depth cap."""
    rows = QUERIES["bfs_reachability"](spark, sf_dir).collect()
    by_node = {r["node"]: r["hop"] for r in rows}
    assert by_node[1] == 0
    assert [n for n, h in by_node.items() if h == 0] == [1]
    for node, hop in by_node.items():
        assert 0 <= hop <= 3
        if node >= 1_000_000:
            assert hop % 2 == 1
        else:
            assert hop % 2 == 0
