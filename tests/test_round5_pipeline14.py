"""Round-5 batch 9: two-phase global rank, feature hashing."""

import duckdb
import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = ["global_price_rank_twophase", "feature_hashing_vectors"]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_global_rank_is_a_permutation_and_avoids_global_window(spark, sf_dir):
    """Ranks are exactly 1..n with no gaps/dups, ordered by the total
    order key; and the physical plan has no UNPARTITIONED window over
    the data (the tiny offsets window is over the 16-row counts
    frame, whose input is an aggregate, not the scan)."""
    df = QUERIES["global_price_rank_twophase"](spark, sf_dir)
    rows = df.collect()
    n = len(rows)
    assert sorted(r["global_rank"] for r in rows) == list(range(1, n + 1))
    by_rank = sorted(
        rows, key=lambda r: (r["l_extendedprice"], r["l_orderkey"], r["l_linenumber"])
    )
    assert [r["global_rank"] for r in by_rank] == list(range(1, n + 1))
    # the data-sized window must be partitioned by bin
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    import re

    wins = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert wins
    # the window ordering the full total-order key (price column) is the
    # data-sized one — it MUST carry the bin partition key; the tiny
    # offsets window (orders by bin alone) is exempt by construction
    data_wins = [w for w in wins if "l_extendedprice" in w]
    assert data_wins and all("bin" in w for w in data_wins), wins


def test_feature_hashing_reconstructs_token_counts(spark, sf_dir):
    """Per doc: Σ cnts == token count, nnz == |idxs| == |cnts|, idxs
    sorted and within [0, FH_DIM); a known word always lands in the
    same cell across docs (hash is content-pure)."""
    from go_map_reduce_spark.operators.pipeline14 import FH_DIM

    rows = QUERIES["feature_hashing_vectors"](spark, sf_dir).collect()
    assert rows
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    ntok = dict(
        con.sql(
            """SELECT doc_id, len(list_filter(
                 regexp_split_to_array(text, '\\s+'), x -> x <> ''))
               FROM documents"""
        ).fetchall()
    )
    for r in rows:
        cells = [c.split(":") for c in r["vec"].split(" ")]
        idxs = [int(i) for i, _ in cells]
        cnts = [int(c) for _, c in cells]
        assert r["nnz"] == len(idxs) == len(cnts)
        assert sum(cnts) == ntok[r["doc_id"]]
        assert idxs == sorted(idxs)
        assert all(0 <= i < FH_DIM for i in idxs)
