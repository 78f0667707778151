"""Differential + property tests for graph operators (graph.py)."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

GRAPH = ["bfs_reachability", "bfs_frontier_iterative", "triangle_count"]


@pytest.mark.parametrize("name", GRAPH)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_triangle_count_brute_force(spark):
    """Ordered-edge-join count equals brute-force triangle enumeration
    over the same k-NN-sparsified co-supply graph, rebuilt in plain
    Python from the raw lineitem pairs."""
    from itertools import combinations

    from go_map_reduce_spark.operators.graph import TRI_KNN, TRI_PART_MOD
    from go_map_reduce_spark.registry import ORACLES

    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    got = {
        r[0]: r[1] for r in con.sql(ORACLES["triangle_count"]).fetchall()
    }
    sp = con.sql(
        "SELECT DISTINCT l_suppkey, l_partkey FROM lineitem "
        f"WHERE l_partkey % {TRI_PART_MOD} = 0"
    ).fetchall()
    parts_by_s = {}
    for s, p in sp:
        parts_by_s.setdefault(s, set()).add(p)
    edges = set()
    for src in parts_by_s:
        nbrs = sorted(
            ((len(parts_by_s[src] & parts_by_s[d]), d) for d in parts_by_s
             if d != src and parts_by_s[src] & parts_by_s[d]),
            key=lambda t: (-t[0], t[1]),
        )[:TRI_KNN]
        for _, d in nbrs:
            edges.add((min(src, d), max(src, d)))
    want = {}
    for a, b, c in combinations(sorted(parts_by_s), 3):
        if {(a, b), (b, c), (a, c)} <= edges:
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1
    assert got == want


def test_bfs_variants_agree(spark, sf_dir):
    """The recursive-CTE and anti-join-frontier BFS are row-identical:
    first-discovery level (pruned loop) equals MIN(hop) over all
    rediscoveries (CTE)."""
    cte = {
        (r["node"], r["hop"])
        for r in QUERIES["bfs_reachability"](spark, sf_dir).collect()
    }
    loop = {
        (r["node"], r["hop"])
        for r in QUERIES["bfs_frontier_iterative"](spark, sf_dir).collect()
    }
    assert cte == loop


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
