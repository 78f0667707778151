"""Round-5 batch 4: BPE merge training, NOT IN null semantics,
schema-evolution reads."""

import duckdb
import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = ["bpe_merge_training", "not_in_null_semantics", "schema_evolution_read"]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def _python_bpe(docs, rounds):
    """Independent sequential reference (the mrsequential role): greedy
    left-to-right merge application, (count desc, pair asc) winner."""
    seqs = [t for t in (d.split() for d in docs) if t]
    merges = []
    for _ in range(rounds):
        counts = {}
        for t in seqs:
            for a, b in zip(t, t[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((f"{a} {b}", n))
        new_seqs = []
        for t in seqs:
            out = []
            i = 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == a and t[i + 1] == b:
                    out.append(t[i] + "\x1f" + t[i + 1])
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            new_seqs.append(out)
        seqs = new_seqs
    return merges, seqs


def test_bpe_matches_sequential_reference(spark, sf_dir):
    """The distributed trainer reproduces a pure-Python sequential BPE
    byte-for-byte (merge rules AND counts) — including greedy
    non-overlapping application inside runs."""
    from go_map_reduce_spark.operators.pipeline9 import BPE_ROUNDS

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    docs = [t for (t,) in con.sql("SELECT text FROM documents").fetchall()]
    want, _ = _python_bpe(docs, BPE_ROUNDS)
    got = sorted(
        QUERIES["bpe_merge_training"](spark, sf_dir).collect(),
        key=lambda r: r["round"],
    )
    assert [(r["pair"], r["n"]) for r in got] == want
    # merged-pair frequency can never exceed an earlier round's winner
    ns = [r["n"] for r in got]
    assert ns == sorted(ns, reverse=True)


def test_greedy_merge_handles_runs():
    """Counting sees all THREE overlapping (a,a) pairs in 'a a a a',
    but greedy application merges exactly TWO (positions 1-2 and 3-4)
    — the behavior plain string replace gets wrong."""
    merges, seqs = _python_bpe(["a a a a"], 1)
    assert merges[0] == ("a a", 3)
    assert seqs == [["a\x1fa", "a\x1fa"]]


def test_not_in_three_valued_logic(spark, sf_dir):
    row = QUERIES["not_in_null_semantics"](spark, sf_dir).collect()[0]
    assert row["n_not_in"] == 0  # NULL in the list poisons NOT IN
    assert row["n_not_exists"] == row["n_not_in_nullfree"]
    assert row["n_not_exists"] > 0


def test_schema_evolution_nulls_only_in_old_generation(spark, sf_dir):
    rows = QUERIES["schema_evolution_read"](spark, sf_dir).collect()
    assert rows
    con = duckdb.connect()
    con.sql(f"CREATE VIEW customer AS SELECT * FROM '{sf_dir}/customer.parquet'")
    odd = dict(
        con.sql(
            "SELECT c_mktsegment, COUNT(*) FROM customer WHERE c_custkey % 2 = 1 GROUP BY 1"
        ).fetchall()
    )
    total = dict(
        con.sql("SELECT c_mktsegment, COUNT(*) FROM customer GROUP BY 1").fetchall()
    )
    for r in rows:
        assert r["n_rows"] == total[r["c_mktsegment"]]
        assert r["n_with_tier"] == odd.get(r["c_mktsegment"], 0)
    # idempotent: the overwrite-mode rewrite yields the same answer
    again = QUERIES["schema_evolution_read"](spark, sf_dir).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))
