"""Round-6 batch 2 (pipeline23): MinHash estimator calibration,
cross-source duplication matrix, quality rule gate, contrastive
negative sampling, conditional entropy — differential tests plus
properties the differential alone can't discriminate."""

import duckdb
import math

import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = [
    "minhash_jaccard_estimate_error",
    "cross_source_dup_matrix",
    "doc_quality_composite_gate",
    "contrastive_negative_sampling",
    "conditional_entropy_lang_by_source",
]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_estimate_error_bounds_and_estimator_granularity(spark):
    """est is a multiple of 1/N_HASHES in [0,1]; abs_err recomputes
    from (est, jaccard); and on verified pairs (jaccard >= 0.5) the
    estimator must be informative: mean est over pairs > 0.25 (an
    uncorrelated estimator would hover near the random-collision
    rate, which is ~0 for 28-bit hashes)."""
    from go_map_reduce_spark.operators.dedup import N_HASHES

    sf01 = "/root/testdata/sf0.01"
    rows = QUERIES["minhash_jaccard_estimate_error"](spark, sf01).collect()
    assert rows
    for r in rows:
        scaled = r["est"] * N_HASHES
        # est carries 6-dp rounding, so k/12 scales back to within
        # N_HASHES * 5e-7 of an integer
        assert abs(scaled - round(scaled)) < 1e-4
        assert 0.0 <= r["est"] <= 1.0
        assert r["abs_err"] == round(abs(r["est"] - r["jaccard"]), 6)
    assert sum(r["est"] for r in rows) / len(rows) > 0.25


def test_dup_matrix_totals_match_pair_count(spark):
    """Σ n_pairs over the matrix == |near-dup pair set| (every pair
    lands in exactly one unordered source cell), and source_a <=
    source_b everywhere (canonical orientation)."""
    sf01 = "/root/testdata/sf0.01"
    cells = QUERIES["cross_source_dup_matrix"](spark, sf01).collect()
    n_pairs = QUERIES["minhash_near_dup_pairs"](spark, sf01).count()
    assert sum(c["n_pairs"] for c in cells) == n_pairs
    assert all(c["source_a"] <= c["source_b"] for c in cells)
    assert all(0.0 < c["avg_jaccard"] <= 1.0 for c in cells)


def test_quality_gate_first_failing_rule_order(spark, sf_dir):
    """The verdict must be the FIRST failing rule in the documented
    order: a doc that is both too_short and low_stopword reports
    too_short. Recompute the rule cascade from the emitted signals."""
    from go_map_reduce_spark.operators import pipeline23 as p23

    rows = QUERIES["doc_quality_composite_gate"](spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        if r["n_tokens"] < p23.GATE_MIN_TOKENS:
            expect = "too_short"
        elif r["n_tokens"] > p23.GATE_MAX_TOKENS:
            expect = "too_long"
        elif r["stopword_ratio"] < p23.GATE_MIN_STOPWORD:
            expect = "low_stopword"
        elif r["dup_token_frac"] > p23.GATE_MAX_DUPTOK:
            expect = "repetitive"
        else:
            expect = "keep"
        assert r["verdict"] == expect, r
        seen.add(r["verdict"])
    assert "keep" in seen  # the gate keeps something at every SF


def test_negative_sampling_is_label_disjoint_and_deterministic(spark, sf_dir):
    """No negative shares the query's label; exactly NEG_K per query;
    and a second run returns the identical sample (the resumable-epoch
    property the operator exists for)."""
    from go_map_reduce_spark.operators import pipeline23 as p23

    labels = dict(
        duckdb.sql(
            f"SELECT vec_id, label FROM '{sf_dir}/embeddings.parquet'"
        ).fetchall()
    )
    first = sorted(
        map(tuple, QUERIES["contrastive_negative_sampling"](spark, sf_dir).collect())
    )
    again = sorted(
        map(tuple, QUERIES["contrastive_negative_sampling"](spark, sf_dir).collect())
    )
    assert first == again
    per_q = {}
    for qid, neg, _rk in first:
        assert labels[neg] != labels[qid]
        per_q[qid] = per_q.get(qid, 0) + 1
    assert set(per_q.values()) == {p23.NEG_K}


def test_conditional_entropy_bounds(spark, sf_dir):
    """0 <= H(lang|source=s) <= ln(n_langs); a single-language source
    would score exactly 0 (none exists in this corpus, so assert the
    upper bound and positivity of the corpus-level mix instead)."""
    n_langs = duckdb.sql(
        f"SELECT count(DISTINCT lang) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    rows = QUERIES["conditional_entropy_lang_by_source"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r["lang_entropy"] <= math.log(n_langs) + 1e-6
