"""Round-6 batch 3 (pipeline24): forward as-of join, packing
efficiency report, dedup cluster-size histogram."""

import duckdb
import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = [
    "asof_join_forward",
    "packing_efficiency_report",
    "dedup_cluster_size_histogram",
]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_forward_asof_is_really_forward(spark, sf_dir):
    """Semantics, not just oracle agreement (both sides could
    conceivably implement 'backward' symmetrically): for a sample of
    MATCHED orders, the matched event time must be >= the order date
    AND be the user's earliest such event — cross-checked against a
    direct DuckDB min-scan. The match set must be non-empty AND
    non-total (the null/match mix is what makes the left join
    discriminating)."""
    rows = QUERIES["asof_join_forward"](spark, sf_dir).collect()
    matched = [r for r in rows if r["next_event_id"] is not None]
    assert matched and len(matched) < len(rows)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    for r in matched[:50]:
        (earliest,) = con.sql(
            f"""SELECT min(ts) FROM events
                WHERE user_id = {r['o_custkey']}
                  AND ts >= TIMESTAMP '{r['o_orderdate']}'"""
        ).fetchone()
        assert r["next_event_ts"] == earliest, r


def test_packing_report_internal_consistency(spark, sf_dir):
    """tail_waste < PACK_BUDGET (concat-and-chunk only wastes inside
    the final sequence); n_seqs covers total_tokens; split counts are
    bounded by doc counts."""
    from go_map_reduce_spark.operators.textstats import PACK_BUDGET

    rows = QUERIES["packing_efficiency_report"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["tail_waste"] < PACK_BUDGET
        assert r["n_seqs"] * PACK_BUDGET >= r["total_tokens"]
        assert 0 <= r["n_split_docs"] <= r["n_docs"]
        assert r["split_frac"] == round(r["n_split_docs"] / r["n_docs"], 6)


def test_cluster_histogram_accounts_for_every_clustered_doc(spark):
    """Σ size·n_clusters == |cluster assignment| and every size >= 2
    (a connected component of the pair graph has at least two docs)."""
    sf01 = "/root/testdata/sf0.01"
    hist = QUERIES["dedup_cluster_size_histogram"](spark, sf01).collect()
    assert hist
    n_docs = QUERIES["dedup_clusters"](spark, sf01).count()
    assert sum(h["size"] * h["n_clusters"] for h in hist) == n_docs
    for h in hist:
        assert h["size"] >= 2
        assert h["docs_removable"] == (h["size"] - 1) * h["n_clusters"]
