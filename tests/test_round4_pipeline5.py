"""Round-4 pipeline batch 2: repeated spans and the DQ audit."""

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = ["repeated_ngram_spans", "dq_constraint_audit"]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_spans_match_python_brute_force(spark, sf_dir):
    """Replay the span detection in plain Python: same k-gram
    fingerprint universe, same maximal-run merge."""
    import duckdb

    from go_map_reduce_spark.operators.pipeline5 import SPAN_K

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    docs = dict(con.sql("SELECT doc_id, text FROM documents").fetchall())
    grams = {}
    for d, text in docs.items():
        t = text.split()
        for p in range(len(t) - SPAN_K + 1):
            fp = "\x1f".join(t[p : p + SPAN_K])
            grams.setdefault(fp, []).append((d, p))
    expected = set()
    dup_by_doc = {}
    for fp, occ in grams.items():
        if len(occ) > 1:
            for d, p in occ:
                dup_by_doc.setdefault(d, set()).add(p)
    for d, ps in dup_by_doc.items():
        ps = sorted(ps)
        start = prev = ps[0]
        n = 1
        for p in ps[1:]:
            if p == prev + 1:
                prev = p
                n += 1
            else:
                expected.add((d, start, prev - start + SPAN_K, n))
                start = prev = p
                n = 1
        expected.add((d, start, prev - start + SPAN_K, n))
    got = {
        (r["doc_id"], r["span_start"], r["span_tokens"], r["n_windows"])
        for r in QUERIES["repeated_ngram_spans"](spark, sf_dir).collect()
    }
    assert got == expected
    assert got, "corpus contains near-duplicates; spans must exist"


def test_dq_audit_shape_and_firing(spark, sf_dir):
    rows = {
        r["constraint_name"]: r
        for r in QUERIES["dq_constraint_audit"](spark, sf_dir).collect()
    }
    assert len(rows) == 6
    # the synthetic star schema is referentially intact...
    assert rows["lineitem_orderkey_ri"]["n_violations"] == 0
    assert rows["orders_custkey_ri"]["n_violations"] == 0
    assert rows["orders_orderkey_unique"]["n_violations"] == 0
    # ...but negative balances exist — at least one constraint FIRES
    assert rows["customer_acctbal_nonneg"]["n_violations"] > 0
    for r in rows.values():
        assert 0 <= r["n_violations"] <= r["n_checked"]
