"""Round-4 pipeline ops: weighted sampling and skyline."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = ["weighted_sample_docs", "skyline_parts"]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_weighted_sampling_favors_heavy_docs(spark, sf_dir):
    """Inclusion must skew toward high weights: the sampled docs' mean
    n_chars exceeds the corpus mean (E–S property, deterministic
    here)."""
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    corpus_mean, n_docs = con.sql(
        "SELECT avg(n_chars), count(*) FROM documents WHERE n_chars > 0"
    ).fetchone()
    rows = QUERIES["weighted_sample_docs"](spark, sf_dir).collect()
    assert len(rows) == min(100, n_docs)
    sample_mean = sum(r["weight"] for r in rows) / len(rows)
    assert sample_mean > corpus_mean


def test_weighted_sampling_is_stable(spark, sf_dir):
    """Same inputs → same sample, independent of partitioning."""
    a = [r["doc_id"] for r in QUERIES["weighted_sample_docs"](spark, sf_dir).collect()]
    b = [r["doc_id"] for r in QUERIES["weighted_sample_docs"](spark, sf_dir).collect()]
    assert a == b


def test_skyline_is_pareto_front(spark, sf_dir):
    """No returned part is dominated; every non-returned part is
    dominated by some part (brute-force check)."""
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM '{sf_dir}/part.parquet'")
    parts = con.sql(
        "SELECT p_partkey, p_size, p_retailprice FROM part"
    ).fetchall()

    def dominated(p, q):
        return (
            q[2] <= p[2]
            and q[1] >= p[1]
            and (q[2] < p[2] or q[1] > p[1])
        )

    got = {
        r["p_partkey"] for r in QUERIES["skyline_parts"](spark, sf_dir).collect()
    }
    by_key = {p[0]: p for p in parts}
    for k in got:
        assert not any(dominated(by_key[k], q) for q in parts if q[0] != k)
    for p in parts:
        if p[0] not in got:
            assert any(dominated(p, q) for q in parts)
